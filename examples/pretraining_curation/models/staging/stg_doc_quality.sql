-- C4/Gopher-style composite quality gate as plain SQL over the staged stats
select
    doc_id,
    lang,
    source,
    text,
    n_tokens,
    cast(token_chars as double) / n_tokens as mean_token_len,
    stop_hits,
    cast(n_symbols as double) / n_chars as symbol_ratio,
    case when n_tokens between 20 and 100000
          and cast(token_chars as double) / n_tokens between 3.0 and 10.0
          and stop_hits >= 2
          and cast(n_symbols as double) / n_chars <= 0.1
         then 1 else 0 end as keep_flag
from {{ ref('stg_documents') }}
