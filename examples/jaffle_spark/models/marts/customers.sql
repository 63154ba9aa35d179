with orders as (
    select customer_id, min(order_date) as first_order,
           max(order_date) as most_recent_order, count(*) as number_of_orders
    from {{ ref('stg_orders') }} group by customer_id
),
spend as (
    select o.customer_id, sum(p.amount) as customer_lifetime_value
    from {{ ref('stg_orders') }} o
    join {{ ref('stg_payments') }} p on o.order_id = p.order_id
    group by o.customer_id
)
select c.customer_id, c.name, o.first_order, o.most_recent_order,
       o.number_of_orders, s.customer_lifetime_value
from {{ ref('stg_customers') }} c
left join orders o on c.customer_id = o.customer_id
left join spend s on c.customer_id = s.customer_id
