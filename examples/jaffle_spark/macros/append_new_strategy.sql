-- A CUSTOM incremental strategy (round-11 engine feature): any
-- incremental_strategy name that is not a builtin dispatches to a macro
-- named get_incremental_<name>_sql receiving the reference arg_dict and
-- returning the DML to execute. This one is first-write-wins: only keys
-- the target has never seen are inserted.
{% macro get_incremental_append_new_sql(arg_dict) %}
{% set t = arg_dict['target_relation'] %}
{% set s = arg_dict['temp_relation'] %}
{% set k = arg_dict['unique_key'] %}
{% set preds = arg_dict['incremental_predicates'] %}
INSERT INTO {{ t }}
SELECT {{ arg_dict['dest_columns'] | map(attribute='quoted') | join(', ') }}
FROM {{ s }}
WHERE {{ k }} NOT IN (SELECT {{ k }} FROM {{ t }})
{%- if preds %}
  AND {{ preds | join(' AND ') }}
{%- endif %}
{% endmacro %}
