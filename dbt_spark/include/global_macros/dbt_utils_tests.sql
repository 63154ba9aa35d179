{# Built-in dbt_utils-compatible GENERIC TESTS (Spark SQL dialect).

   The dbt-utils package is the reference ecosystem's most-installed hub
   package; its generic tests are the de-facto extended assertion surface
   (reference consumption: hub package dbt-labs/dbt_utils, macros/generic_tests/*).
   Each block below is a failing-rows SELECT — same contract as the four
   core built-ins (SURVEY §2D; core/dbt/task/test.py:142-197): zero rows =
   pass, fail_calc/severity knobs apply unchanged.

   Loaded for every project by project.py under the "dbt_utils" namespace,
   so YAML `data_tests: [dbt_utils.equal_rowcount: {...}]` runs unchanged.
   `model` arrives as the where-subquery wrapper "(SELECT * FROM rel)";
   ref()/source() kwargs arrive pre-resolved by operators/tests.py. #}

{% test equal_rowcount(model, compare_model, group_by_columns=[]) %}
{%- set gb = group_by_columns -%}
{%- if gb | length > 0 -%}
with a as (select {{ gb | join(', ') }}, count(*) as count_a from {{ model }} group by {{ gb | join(', ') }}),
b as (select {{ gb | join(', ') }}, count(*) as count_b from {{ compare_model }} group by {{ gb | join(', ') }})
select {{ gb | join(', ') }}, coalesce(count_a, 0) as count_a, coalesce(count_b, 0) as count_b
from a full outer join b using ({{ gb | join(', ') }})
where coalesce(count_a, 0) != coalesce(count_b, 0)
{%- else -%}
with a as (select count(*) as count_a from {{ model }}),
b as (select count(*) as count_b from {{ compare_model }})
select count_a, count_b from a cross join b where count_a != count_b
{%- endif -%}
{% endtest %}

{% test fewer_rows_than(model, compare_model, group_by_columns=[]) %}
{%- set gb = group_by_columns -%}
{%- if gb | length > 0 -%}
with a as (select {{ gb | join(', ') }}, count(*) as count_our_model from {{ model }} group by {{ gb | join(', ') }}),
b as (select {{ gb | join(', ') }}, count(*) as count_comparison_model from {{ compare_model }} group by {{ gb | join(', ') }})
select {{ gb | join(', ') }}, count_our_model, count_comparison_model
from a inner join b using ({{ gb | join(', ') }})
where count_our_model >= count_comparison_model
{%- else -%}
with a as (select count(*) as count_our_model from {{ model }}),
b as (select count(*) as count_comparison_model from {{ compare_model }})
select count_our_model, count_comparison_model from a cross join b
where count_our_model >= count_comparison_model
{%- endif -%}
{% endtest %}

{% test not_constant(model, column_name, group_by_columns=[]) %}
{%- set gb = group_by_columns -%}
select {% if gb | length > 0 %}{{ gb | join(', ') }}, {% endif %}count(distinct {{ column_name }}) as value_count
from {{ model }}
{% if gb | length > 0 %}group by {{ gb | join(', ') }}{% endif %}
having count(distinct {{ column_name }}) = 1
{% endtest %}

{% test at_least_one(model, column_name, group_by_columns=[]) %}
{%- set gb = group_by_columns -%}
select {% if gb | length > 0 %}{{ gb | join(', ') }}, {% endif %}count({{ column_name }}) as value_count
from {{ model }}
{% if gb | length > 0 %}group by {{ gb | join(', ') }}{% endif %}
having count({{ column_name }}) = 0
{% endtest %}

{% test unique_combination_of_columns(model, combination_of_columns, quote_columns=False) %}
{%- set cols = [] -%}
{%- for c in combination_of_columns -%}
{%- do cols.append('`' ~ c ~ '`' if quote_columns else c) -%}
{%- endfor -%}
select {{ cols | join(', ') }}, count(*) as n_records
from {{ model }}
group by {{ cols | join(', ') }}
having count(*) > 1
{% endtest %}

{% test accepted_range(model, column_name, min_value=None, max_value=None, inclusive=True) %}
select * from {{ model }}
where not (
  true
  {% if min_value is not none %} and {{ column_name }} {{ '>=' if inclusive else '>' }} {{ min_value }}{% endif %}
  {% if max_value is not none %} and {{ column_name }} {{ '<=' if inclusive else '<' }} {{ max_value }}{% endif %}
)
{% endtest %}

{% test not_accepted_values(model, column_name, values, quote=True) %}
{%- set lits = [] -%}
{%- for v in values -%}
{%- do lits.append("'" ~ v ~ "'" if quote else v | string) -%}
{%- endfor -%}
select {{ column_name }} as value_field, count(*) as n_records
from {{ model }}
group by {{ column_name }}
having {{ column_name }} in ({{ lits | join(', ') }})
{% endtest %}

{% test mutually_exclusive_ranges(model, lower_bound_column, upper_bound_column, partition_by=None, gaps='allowed', zero_length_range_allowed=False) %}
{#- gaps: 'allowed' (next range may start after this one ends),
   'not_allowed' (ranges must tile exactly), 'required' (strict gap).
   Window shape: one lag() over (partition, order by bounds) — a single
   shuffle on the partition key, no self-join. -#}
{%- set valid_op = '<=' if zero_length_range_allowed else '<' -%}
{%- set gap_op = {'allowed': '<=', 'not_allowed': '=', 'required': '<'}[gaps] -%}
with windowed as (
  select
    {% if partition_by %}{{ partition_by }},{% endif %}
    {{ lower_bound_column }} as lower_bound,
    {{ upper_bound_column }} as upper_bound,
    lag({{ upper_bound_column }}) over (
      {% if partition_by %}partition by {{ partition_by }}{% endif %}
      order by {{ lower_bound_column }}, {{ upper_bound_column }}
    ) as previous_upper_bound
  from {{ model }}
)
select * from windowed
where not ({{ 'lower_bound ' ~ valid_op ~ ' upper_bound' }})
   or (previous_upper_bound is not null
       and not (previous_upper_bound {{ gap_op }} lower_bound))
{% endtest %}

{% test sequential_values(model, column_name, interval=1, datepart=None, group_by_columns=[]) %}
{%- set gb = group_by_columns -%}
with windowed as (
  select
    {% if gb | length > 0 %}{{ gb | join(', ') }},{% endif %}
    {{ column_name }} as current_value,
    lag({{ column_name }}) over (
      {% if gb | length > 0 %}partition by {{ gb | join(', ') }}{% endif %}
      order by {{ column_name }}
    ) as previous_value
  from {{ model }}
)
select * from windowed
where previous_value is not null
  and current_value !=
  {%- if datepart %} previous_value + interval {{ interval }} {{ datepart }}
  {%- else %} previous_value + {{ interval }}
  {%- endif %}
{% endtest %}

{% test recency(model, field, datepart, interval, group_by_columns=[]) %}
{%- set gb = group_by_columns -%}
select {% if gb | length > 0 %}{{ gb | join(', ') }}, {% endif %}max({{ field }}) as most_recent
from {{ model }}
{% if gb | length > 0 %}group by {{ gb | join(', ') }}{% endif %}
having max(cast({{ field }} as timestamp)) < current_timestamp() - interval {{ interval }} {{ datepart }}
{% endtest %}

{% test expression_is_true(model, expression, column_name=None) %}
select * from {{ model }}
where not ({% if column_name is not none %}{{ column_name }} {% endif %}{{ expression }})
{% endtest %}

{% test not_empty_string(model, column_name, trim_whitespace=True) %}
select * from {{ model }}
where {% if trim_whitespace %}trim({{ column_name }}){% else %}{{ column_name }}{% endif %} = ''
{% endtest %}

{% test not_null_proportion(model, column_name, at_least, at_most=1.0, group_by_columns=[]) %}
{%- set gb = group_by_columns -%}
with p as (
  select
    {% if gb | length > 0 %}{{ gb | join(', ') }},{% endif %}
    sum(case when {{ column_name }} is null then 0 else 1 end) / cast(count(*) as double) as not_null_proportion
  from {{ model }}
  {% if gb | length > 0 %}group by {{ gb | join(', ') }}{% endif %}
)
select * from p
where not_null_proportion < {{ at_least }} or not_null_proportion > {{ at_most }}
{% endtest %}

{% test relationships_where(model, column_name, to, field, from_condition='1=1', to_condition='1=1') %}
select child.{{ column_name }} as from_field
from (select * from {{ model }} where {{ from_condition }}) as child
left join (select * from {{ to }} where {{ to_condition }}) as parent
  on child.{{ column_name }} = parent.{{ field }}
where child.{{ column_name }} is not null and parent.{{ field }} is null
{% endtest %}

{% test cardinality_equality(model, column_name, to, field) %}
{#- value multiset equality: EXCEPT (distinct) both directions over
   (value, count) pairs — catches both missing values and count drift -#}
with a as (select {{ column_name }} as v, count(*) as n from {{ model }} group by {{ column_name }}),
b as (select {{ field }} as v, count(*) as n from {{ to }} group by {{ field }})
(select v, n from a except select v, n from b)
union all
(select v, n from b except select v, n from a)
{% endtest %}

{% test equality(model, compare_model, compare_columns=None, exclude_columns=[]) %}
{%- if not execute -%}
select 1 as _dbt_parse_placeholder limit 0
{%- else -%}
{%- if not compare_columns -%}
  {%- set compare_columns = [] -%}
  {%- for c in adapter.get_columns_in_relation(model) -%}
    {%- if c.name not in exclude_columns -%}{%- do compare_columns.append(c.name) -%}{%- endif -%}
  {%- endfor -%}
{%- endif -%}
{%- set cols = compare_columns | join(', ') -%}
with a as (select {{ cols }} from {{ model }}),
b as (select {{ cols }} from {{ compare_model }})
(select 'in_model_not_compare' as which, * from (select * from a except select * from b))
union all
(select 'in_compare_not_model' as which, * from (select * from b except select * from a))
{%- endif -%}
{% endtest %}
