-- deterministic shard assignment for the training job: shard = first md5
-- hex digit (map-side hash, no global sort), position = md5 order in shard
select
    doc_id,
    lang,
    n_tokens,
    cast(instr('0123456789abcdef',
               substring(md5(cast(doc_id as string)), 1, 1)) - 1 as int) as shard,
    row_number() over (
        partition by instr('0123456789abcdef',
                           substring(md5(cast(doc_id as string)), 1, 1)) - 1
        order by md5(cast(doc_id as string)) asc, doc_id asc
    ) as shard_pos
from {{ ref('balanced_sample') }}
