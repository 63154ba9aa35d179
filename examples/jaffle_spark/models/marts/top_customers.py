def model(dbt, session):
    dbt.config(materialized="table")
    customers = dbt.ref("customers")
    return (customers
            .orderBy(customers.customer_lifetime_value.desc_nulls_last())
            .limit(2))
