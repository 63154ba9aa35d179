-- per-doc token statistics: everything downstream filters on these
select
    doc_id,
    lang,
    source,
    text,
    n_chars,
    size(split(trim(text), '\\s+')) as n_tokens,
    aggregate(split(trim(text), '\\s+'), 0L, (a, t) -> a + length(t)) as token_chars,
    size(filter(split(trim(lower(text)), '\\s+'),
                t -> array_contains(array('the','a','an','and','of','to','in','is','it','for'), t))) as stop_hits,
    length(text) - length(translate(text, '.,!?;:#{}[]|', '')) as n_symbols
from {{ source('corpus', 'documents') }}
where length(trim(text)) > 0
