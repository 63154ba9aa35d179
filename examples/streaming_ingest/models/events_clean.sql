-- checkpointed streaming ingestion: each `dbt run` processes ONLY the files
-- that landed since the last run (availableNow + checkpoint offsets)
{{ config(materialized='streaming_table') }}
select event_id, user_id, ts, event_type, value
from {{ source('landing', 'events') }}
where event_type != 'error'
