-- quality-gated + near-dup-free corpus; dedup runs INSIDE the
-- materialization via the engine's dedup_fingerprint model config
{{ config(dedup_fingerprint='text', dedup_id='doc_id', dedup_k=8) }}
select doc_id, lang, source, text, n_tokens
from {{ ref('stg_doc_quality') }}
where keep_flag = 1
