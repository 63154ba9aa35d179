{# Adapter DDL helpers for CUSTOM {% materialization %} macros — the
   dbt-adapters "global project" surface custom materializations compose
   (reference dbt-adapters create_table_as/create_view_as contract,
   invoked from core task/run.py materialization execution). The Spark
   forms write USING PARQUET LOCATION under the engine warehouse so the
   engine can adopt the files as the node's relation with no copy
   (operators/custom_mat.py). #}

{% macro create_table_as(temporary, relation, compiled_code, language='sql') %}
{{ return(adapter.dispatch('create_table_as')(temporary, relation, compiled_code, language)) }}
{% endmacro %}

{% macro default__create_table_as(temporary, relation, compiled_code, language='sql') %}
{%- if temporary -%}
CREATE OR REPLACE TEMPORARY VIEW {{ relation }} AS {{ compiled_code }}
{%- else -%}
CREATE TABLE {{ relation }} USING PARQUET LOCATION '{{ relation.location }}' AS {{ compiled_code }}
{%- endif -%}
{% endmacro %}

{% macro create_view_as(relation, sql) %}
CREATE OR REPLACE TEMPORARY VIEW {{ relation }} AS {{ sql }}
{% endmacro %}

{% macro get_create_table_as_sql(temporary, relation, sql) %}
{{ return(create_table_as(temporary, relation, sql)) }}
{% endmacro %}

{% macro drop_relation_if_exists(relation) %}
{%- if relation is not none -%}
DROP TABLE IF EXISTS {{ relation }}
{%- endif -%}
{% endmacro %}
