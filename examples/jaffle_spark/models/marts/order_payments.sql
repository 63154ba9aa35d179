select order_id,
  {{ dbt_utils.pivot('payment_method', ['credit_card', 'coupon', 'bank_transfer'],
                     agg='sum', then_value='amount', else_value=0) }}
from {{ ref('stg_payments') }}
group by order_id
