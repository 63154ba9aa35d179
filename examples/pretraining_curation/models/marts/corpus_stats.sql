-- per-language report the curation run publishes
select
    lang,
    count(*) as n_docs,
    cast(sum(n_tokens) as bigint) as total_tokens,
    min(n_tokens) as min_tokens,
    max(n_tokens) as max_tokens
from {{ ref('clean_documents') }}
group by lang
order by lang
