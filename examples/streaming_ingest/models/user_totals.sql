-- downstream BATCH model over the streamed table: the DAG mixes streaming
-- and batch nodes freely
{{ config(materialized='table') }}
select user_id, count(*) as n_events, sum(value) as total_value
from {{ ref('events_clean') }}
group by user_id
