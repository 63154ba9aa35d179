-- language-rebalanced subcorpus: cap each language at 20 docs by
-- deterministic md5 order (reproducible across reruns — no rand())
select doc_id, lang, source, n_tokens, sample_rank
from (
    select *,
           row_number() over (
               partition by lang
               order by md5(cast(doc_id as string)) asc, doc_id asc
           ) as sample_rank
    from {{ ref('clean_documents') }}
)
where sample_rank <= 20
