-- Immutable order-event log: later runs may re-offer old orders (source
-- re-exports), but the first written row per order_id must never change —
-- exactly the custom append_new strategy's contract.
{{ config(materialized='incremental', incremental_strategy='append_new',
          unique_key='order_id') }}
select order_id, customer_id, order_date, status
from {{ ref('stg_orders') }}
