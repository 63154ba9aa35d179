-- quality-gated + near-dup-free + PII-scrubbed corpus; dedup and the
-- chained email/phone/ipv4 redaction both run INSIDE the
-- materialization via engine model configs
{{ config(dedup_fingerprint='text', dedup_id='doc_id', dedup_k=8,
          pii_redact=['text']) }}
select doc_id, lang, source, text, n_tokens
from {{ ref('stg_doc_quality') }}
where keep_flag = 1
