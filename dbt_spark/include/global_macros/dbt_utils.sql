{# Built-in dbt_utils-compatible macro package (Spark SQL dialect).

   The reference ecosystem leans on the dbt-utils package for these idioms;
   shipping Spark-dialect implementations as a built-in global package (the
   way dbt-adapters ships its "global project") lets existing projects run
   unchanged: {{ dbt_utils.generate_surrogate_key([...]) }} etc.

   Loaded for every project by project.py (package namespace "dbt_utils",
   root-project macros win flat-name collisions). #}

{% macro generate_surrogate_key(field_list) -%}
md5(concat_ws('-', {% for f in field_list %}coalesce(cast({{ f }} as string), '_dbt_utils_surrogate_key_null_'){% if not loop.last %}, {% endif %}{% endfor %}))
{%- endmacro %}

{% macro surrogate_key(field_list) -%}
{{ generate_surrogate_key(field_list) }}
{%- endmacro %}

{% macro hash(field) -%}
md5(cast({{ field }} as string))
{%- endmacro %}

{% macro safe_divide(numerator, denominator) -%}
( {{ numerator }} ) / nullif( ( {{ denominator }} ), 0)
{%- endmacro %}

{% macro cast_bool_to_text(field) -%}
cast({{ field }} as string)
{%- endmacro %}

{% macro split_part(string_text, delimiter_text, part_number) -%}
split_part({{ string_text }}, {{ delimiter_text }}, {{ part_number }})
{%- endmacro %}

{% macro date_trunc(datepart, date) -%}
date_trunc('{{ datepart }}', {{ date }})
{%- endmacro %}

{% macro dateadd(datepart, interval, from_date_or_timestamp) -%}
({{ from_date_or_timestamp }} + INTERVAL {{ interval }} {{ datepart }})
{%- endmacro %}

{% macro datediff(first_date, second_date, datepart) -%}
{%- if datepart == 'day' -%}
datediff(cast({{ second_date }} as date), cast({{ first_date }} as date))
{%- elif datepart == 'month' -%}
cast(months_between(cast({{ second_date }} as date), cast({{ first_date }} as date)) as bigint)
{%- elif datepart == 'year' -%}
(year(cast({{ second_date }} as date)) - year(cast({{ first_date }} as date)))
{%- else -%}
cast((cast(cast({{ second_date }} as timestamp) as double) - cast(cast({{ first_date }} as timestamp) as double)) / {{ 3600 if datepart == 'hour' else 60 if datepart == 'minute' else 1 }} as bigint)
{%- endif -%}
{%- endmacro %}

{% macro date_spine(datepart, start_date, end_date) -%}
{# one row per {{ datepart }} from start_date (inclusive) to end_date
   (exclusive) — Spark-native: explode(sequence(...)), no recursive CTE #}
select explode(sequence(
    cast({{ start_date }} as timestamp),
    cast({{ end_date }} as timestamp) - interval 1 {{ datepart }},
    interval 1 {{ datepart }}
)) as date_{{ datepart }}
{%- endmacro %}

{% macro pivot(column, values, alias=True, agg='sum', cmp='=', prefix='', suffix='', then_value=1, else_value=0) -%}
{% for value in values %}
{{ agg }}(case when {{ column }} {{ cmp }} '{{ value }}' then {{ then_value }} else {{ else_value }} end){% if alias %} as `{{ prefix }}{{ value }}{{ suffix }}`{% endif %}{% if not loop.last %}, {% endif %}
{%- endfor %}
{%- endmacro %}

{% macro star(from, relation_alias='', except=[], prefix='', suffix='') -%}
{%- if not execute -%}
*
{%- else -%}
{%- set cols = adapter.get_columns_in_relation(from) -%}
{%- set outputs = [] -%}
{%- for col in cols if col.name not in except -%}
    {%- set qualified = (relation_alias ~ '.' ~ col.quoted) if relation_alias else col.quoted -%}
    {%- if prefix or suffix -%}
        {%- do outputs.append(qualified ~ ' as `' ~ prefix ~ col.name ~ suffix ~ '`') -%}
    {%- else -%}
        {%- do outputs.append(qualified) -%}
    {%- endif -%}
{%- endfor -%}
{{ outputs | join(', ') }}
{%- endif -%}
{%- endmacro %}

{% macro union_relations(relations, exclude=[], source_column_name='_dbt_source_relation') -%}
{%- if not execute -%}
select 1 as _dbt_parse_placeholder
{%- else -%}
{# ordered union of all columns (first-seen order, typed from the first
   relation that has each); every relation selects the full set with NULL
   fills — the standard schema-drift-tolerant UNION ALL BY NAME #}
{%- set all_cols = [] -%}
{%- set col_types = {} -%}
{%- set rel_cols = {} -%}
{%- for rel in relations -%}
    {%- set cols = adapter.get_columns_in_relation(rel) -%}
    {%- set names = [] -%}
    {%- for col in cols if col.name not in exclude -%}
        {%- if col.name not in col_types -%}
            {%- do all_cols.append(col.name) -%}
            {%- do col_types.update({col.name: col.dtype}) -%}
        {%- endif -%}
        {%- do names.append(col.name) -%}
    {%- endfor -%}
    {%- do rel_cols.update({rel | string: names}) -%}
{%- endfor -%}
{%- for rel in relations %}
select
  cast('{{ rel }}' as string) as {{ source_column_name }},
  {% for name in all_cols -%}
  {%- if name in rel_cols[rel | string] -%}
  `{{ name }}`
  {%- else -%}
  cast(null as {{ col_types[name] }}) as `{{ name }}`
  {%- endif -%}
  {%- if not loop.last %}, {% endif %}
  {%- endfor %}
from {{ rel }}
{% if not loop.last %}union all{% endif %}
{%- endfor -%}
{%- endif -%}
{%- endmacro %}

{% macro group_by(n) -%}
group by {% for i in range(1, n + 1) %}{{ i }}{% if not loop.last %}, {% endif %}{% endfor %}
{%- endmacro %}

{% macro deduplicate(relation, partition_by, order_by) -%}
{# keep exactly one row per partition_by group, first under order_by —
   one row_number() window (single shuffle on the partition key) #}
select * except (_dbt_dedup_rn) from (
    select *, row_number() over (
        partition by {{ partition_by }}
        order by {{ order_by }}
    ) as _dbt_dedup_rn
    from {{ relation }}
) where _dbt_dedup_rn = 1
{%- endmacro %}

{% macro unpivot(relation, cast_to='string', exclude=[], remove=[], field_name='field_name', value_name='value') -%}
{%- if not execute -%}
select 1 as _dbt_parse_placeholder
{%- else -%}
{%- set cols = [] -%}
{%- for col in adapter.get_columns_in_relation(relation) -%}
  {%- if col.name not in exclude and col.name not in remove -%}
    {%- do cols.append(col.name) -%}
  {%- endif -%}
{%- endfor -%}
{%- for col in cols %}
select
  {% for ex in exclude %}{{ ex }}, {% endfor %}
  cast('{{ col }}' as string) as {{ field_name }},
  cast({{ col }} as {{ cast_to }}) as {{ value_name }}
from {{ relation }}
{% if not loop.last %}union all{% endif %}
{%- endfor -%}
{%- endif -%}
{%- endmacro %}

{% macro get_column_values(table, column, max_records=None, default=None, where=None, order_by='count(*) desc') -%}
{%- if not execute -%}
{{ return(default if default is not none else []) }}
{%- else -%}
{%- set sql -%}
select {{ column }} as value from {{ table }}
{% if where %}where {{ where }}{% endif %}
group by {{ column }} order by {{ order_by }}
{% if max_records is not none %}limit {{ max_records }}{% endif %}
{%- endset -%}
{%- set res = run_query(sql) -%}
{%- if res is none -%}
{{ return(default if default is not none else []) }}
{%- else -%}
{%- set vals = [] -%}
{%- for row in res.rows -%}{%- do vals.append(row[0]) -%}{%- endfor -%}
{{ return(vals) }}
{%- endif -%}
{%- endif -%}
{%- endmacro %}

{% macro get_filtered_columns_in_relation(from, except=[]) -%}
{%- if not execute -%}
{{ return([]) }}
{%- else -%}
{%- set names = [] -%}
{%- for col in adapter.get_columns_in_relation(from) -%}
  {%- if col.name not in except -%}{%- do names.append(col.name) -%}{%- endif -%}
{%- endfor -%}
{{ return(names) }}
{%- endif -%}
{%- endmacro %}

{% macro safe_add(field_list) -%}
{%- for f in field_list -%}
coalesce({{ f }}, 0){% if not loop.last %} + {% endif %}
{%- endfor -%}
{%- endmacro %}

{% macro safe_subtract(field_list) -%}
{%- for f in field_list -%}
coalesce({{ f }}, 0){% if not loop.last %} - {% endif %}
{%- endfor -%}
{%- endmacro %}

{% macro generate_series(upper_bound) -%}
select explode(sequence(1, {{ upper_bound }})) as generated_number
{%- endmacro %}

{% macro get_url_host(field) -%}
regexp_extract(regexp_replace({{ field }}, '^[a-zA-Z]+://', ''), '^([^/?#]*)', 1)
{%- endmacro %}

{% macro get_url_path(field) -%}
nullif(regexp_extract(regexp_replace({{ field }}, '^[a-zA-Z]+://', ''), '^[^/?#]*([^?#]*)', 1), '')
{%- endmacro %}

{% macro get_url_parameter(field, url_parameter) -%}
nullif(regexp_extract({{ field }}, '[?&]{{ url_parameter }}=([^&#]*)', 1), '')
{%- endmacro %}

{% macro slugify(column) -%}
regexp_replace(regexp_replace(regexp_replace(trim(lower({{ column }})), '[^a-z0-9\\s_-]+', ''), '[\\s-]+', '_'), '^_+|_+$', '')
{%- endmacro %}

{% macro width_bucket(expr, min_value, max_value, num_buckets) -%}
width_bucket({{ expr }}, {{ min_value }}, {{ max_value }}, {{ num_buckets }})
{%- endmacro %}

{% macro get_relations_by_pattern(schema_pattern, table_pattern, exclude='', database=None) -%}
{%- if not execute -%}
{{ return([]) }}
{%- else -%}
{{ return(adapter.get_relations_by_pattern(schema_pattern, table_pattern, exclude)) }}
{%- endif -%}
{%- endmacro %}

{% macro get_relations_by_prefix(schema, prefix, exclude='', database=None) -%}
{%- if not execute -%}
{{ return([]) }}
{%- else -%}
{{ return(adapter.get_relations_by_pattern(schema, prefix ~ '%', exclude)) }}
{%- endif -%}
{%- endmacro %}

{% macro haversine_distance(lat1, lon1, lat2, lon2, unit='mi') -%}
{#- great-circle distance; 2*R*asin(sqrt(haversine)) with R in {{ unit }} -#}
(2 * {{ 3959.0 if unit == 'mi' else 6371.0 }} * asin(sqrt(
    pow(sin(radians(({{ lat2 }}) - ({{ lat1 }})) / 2), 2)
    + cos(radians({{ lat1 }})) * cos(radians({{ lat2 }}))
      * pow(sin(radians(({{ lon2 }}) - ({{ lon1 }})) / 2), 2)
)))
{%- endmacro %}

{% macro nullcheck(cols) -%}
{# empty-string -> NULL for string-typed columns; non-strings pass through
   (Spark has no implicit numeric<->'' comparison) #}
{%- for col in cols -%}
{%- set cname = col.name if col.name is defined else col -%}
{%- set ctype = col.dtype if col.dtype is defined else 'string' -%}
{%- if ctype == 'string' -%}
nullif({{ cname }}, '') as {{ cname }}
{%- else -%}
{{ cname }}
{%- endif -%}{% if not loop.last %}, {% endif %}
{%- endfor -%}
{%- endmacro %}

{% macro nullcheck_table(relation) -%}
{%- if not execute -%}
select 1 as _dbt_parse_placeholder
{%- else -%}
select {{ nullcheck(adapter.get_columns_in_relation(relation)) }} from {{ relation }}
{%- endif -%}
{%- endmacro %}
