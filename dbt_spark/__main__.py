"""CLI: python -m dbt_spark <command> [...].

The command surface mirrors core/dbt/cli/main.py registrations (SURVEY §2B
CLI inventory): run, build, test, seed, snapshot, compile, ls/list, show,
run-operation, docs generate, source freshness, retry. Flags: --project-dir,
--select/-s, --exclude, --full-refresh, --vars, --state, --args, --inline,
--limit.
"""

from __future__ import annotations

import argparse
import os
import sys

import yaml


def main() -> int:
    ap = argparse.ArgumentParser(prog="dbt_spark")
    ap.add_argument(
        "command",
        choices=["run", "build", "test", "seed", "snapshot", "compile", "ls",
                 "list", "show", "run-operation", "docs", "source", "retry",
                 "clone", "deps", "debug", "init", "parse", "clean"],
    )
    ap.add_argument("subcommand", nargs="?", default=None,
                    help="docs generate | source freshness | run-operation <macro>")
    ap.add_argument("--project-dir", default=".")
    ap.add_argument("--select", "-s", action="append", default=[])
    ap.add_argument("--models", "--model", "-m", action="append", default=[],
                    dest="models_alias",
                    help="alias for --select (reference -m/--models)")
    ap.add_argument("--exclude", action="append", default=[])
    ap.add_argument("--full-refresh", action="store_true")
    ap.add_argument("--vars", default=None)
    ap.add_argument("--state", default=None)
    ap.add_argument("--args", dest="op_args", default=None)
    ap.add_argument("--inline", default=None)
    ap.add_argument("--inline-direct", default=None,
                    help="show: raw SQL with no Jinja/ref resolution "
                         "(reference --inline-direct)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--defer", action="store_true", dest="defer_flag")
    ap.add_argument("--empty", action="store_true")
    ap.add_argument("--threads", type=int, default=None)
    ap.add_argument("--sample", default=None,
                    help="trailing event-time window, e.g. '3 days'")
    ap.add_argument("--selector", default=None)
    ap.add_argument("--indirect-selection", dest="indirect", default=None)
    ap.add_argument("--warn-error", action="store_true")
    ap.add_argument("--log-level", default=os.environ.get("DBT_LOG_LEVEL", "none"),
                    choices=["debug", "info", "warn", "error", "none"],
                    help="stream structured events at/above this level to "
                         "stderr (reference --log-level; 'none' = summary "
                         "output only)")
    ap.add_argument("--log-format", default=os.environ.get("DBT_LOG_FORMAT", "text"),
                    choices=["text", "json"],
                    help="console event encoding (reference --log-format)")
    ap.add_argument("--quiet", "-q", action="store_true",
                    help="suppress per-node result lines and the summary; "
                         "errors still print (reference --quiet)")
    ap.add_argument("--warn-error-options",
                    default=os.environ.get("DBT_WARN_ERROR_OPTIONS"),
                    help="YAML/JSON {error|warn|silence: [EventName,...]} "
                         "(error/warn alias include/exclude)")
    ap.add_argument("--fail-fast", "-x", action="store_true")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--host", default=None,
                    help="docs serve bind address (reference --host)")
    ap.add_argument("--target", "-t", default=None)
    ap.add_argument("--output", default="default",
                    choices=["default", "selector", "name", "path", "fqn", "json"],
                    help="ls output format")
    ap.add_argument("--output-keys", default=None,
                    help="keys to keep in --output json entries")
    ap.add_argument("--favor-state", action="store_true",
                    help="with --defer, unselected upstreams prefer --state")
    ap.add_argument("--store-failures", action="store_true")
    ap.add_argument("--include-saved-query", action="store_true")
    ap.add_argument("--resource-type", "--resource-types",
                    action="append", default=[])
    ap.add_argument("--exclude-resource-type", "--exclude-resource-types",
                    action="append", default=[])
    ap.add_argument("--record-timing-info", default=None,
                    help="write per-node timing profile to this path "
                         "(reference --record-timing-info)")
    ap.add_argument("--source", dest="deps_source", default="hub",
                    choices=["hub", "git", "local"],
                    help="deps --add-package source (reference --source)")
    ap.add_argument("--log-format-file",
                    default=os.environ.get("DBT_LOG_FORMAT_FILE"),
                    choices=["text", "debug", "json", "default", None],
                    help="file log encoding, overrides --log-format for the "
                         "file sink (reference --log-format-file)")
    ap.add_argument("--log-file-max-bytes", type=int,
                    default=os.environ.get("DBT_LOG_FILE_MAX_BYTES"),
                    help="roll dbt.log past this size; 0 = unlimited "
                         "(reference --log-file-max-bytes)")
    ap.add_argument("--no-partial-parse", action="store_true")
    ap.add_argument("--no-write-json", action="store_true")
    ap.add_argument("--defer-state", default=None,
                    help="state dir for --defer resolution (overrides --state)")
    ap.add_argument("--add-package", default=None,
                    help="deps: add 'org/name@versionspec' to packages.yml "
                         "and install")
    ap.add_argument("--upgrade", action="store_true",
                    help="deps: ignore package-lock.yml and re-resolve")
    ap.add_argument("--lock", action="store_true",
                    help="deps: resolve + write package-lock.yml, no install")
    ap.add_argument("--event-time-start", default=None)
    ap.add_argument("--event-time-end", default=None)
    ap.add_argument("--profile", default=None,
                    help="profiles.yml entry to use (overrides the "
                         "project's profile: key; reference --profile)")
    ap.add_argument("--profiles-dir", default=None,
                    help="directory containing profiles.yml (reference "
                         "--profiles-dir / DBT_PROFILES_DIR)")
    ap.add_argument("--target-path", default=None,
                    help="artifact output dir (reference --target-path / "
                         "DBT_TARGET_PATH; default <project>/target)")
    ap.add_argument("--log-level-file",
                    default=os.environ.get("DBT_LOG_LEVEL_FILE"),
                    choices=["debug", "info", "warn", "error", None],
                    help="minimum level written to the JSONL log file "
                         "(reference --log-level-file; default debug=all)")
    ap.add_argument("--log-path", default=None,
                    help="log directory (reference --log-path / "
                         "DBT_LOG_PATH; default <target-path>/logs)")
    ap.add_argument("--empty-catalog", action="store_true",
                    help="docs generate: skip warehouse introspection")
    ap.add_argument("--static", action="store_true",
                    help="docs generate: self-contained index.html (always "
                         "on; accepted for reference parity)")
    ap.add_argument("--config-dir", action="store_true",
                    help="debug: print the profiles directory and exit "
                         "(reference --config-dir)")
    ap.add_argument("--connection", action="store_true",
                    help="debug: test the connection only, skip "
                         "project/parse checks (reference --connection)")
    ap.add_argument("--skip-profile-setup", "-S", action="store_true",
                    help="init: do not scaffold profiles.yml "
                         "(reference --skip-profile-setup)")
    ap.add_argument("--partial-parse-file-path", default=None,
                    help="override the partial-parse cache location "
                         "(reference --partial-parse-file-path)")
    ap.add_argument("--version", action="version",
                    version="dbt_spark 1.10.0 (PySpark analytics engine; "
                            "reference-parity CLI)")
    args = ap.parse_args()

    if args.command == "init":
        return _init(args.subcommand or "my_dbt_spark_project",
                     skip_profile=args.skip_profile_setup)

    if args.command == "debug" and args.config_dir:
        # reference task/debug.py: print the config location, no checks
        print(args.profiles_dir or os.environ.get("DBT_PROFILES_DIR")
              or os.path.expanduser("~/.dbt"))
        return 0

    from dbt_spark.runner import Engine

    command = "ls" if args.command == "list" else args.command
    engine = Engine(
        args.project_dir,
        vars=yaml.safe_load(args.vars) if args.vars else None,
        target=args.target,
        profile_name=args.profile,
        profiles_dir=args.profiles_dir,
        target_path=args.target_path,
        log_path=args.log_path,
        log_level_file=args.log_level_file,
        log_format_file=args.log_format_file,
        log_file_max_bytes=(int(args.log_file_max_bytes)
                            if args.log_file_max_bytes is not None else None),
    )
    if args.threads:
        engine.project.profile["threads"] = args.threads
    if args.log_level != "none":
        # stream events live to stderr, like the reference's console logger
        # (core/dbt/events/logging.py): file JSONL always written regardless
        import json as _json
        import sys as _sys

        rank = {"debug": 0, "info": 1, "warn": 2, "error": 3}
        floor = rank[args.log_level]

        def _sink(ev):
            if rank.get(ev.level, 1) < floor:
                return
            if args.log_format == "json":
                print(_json.dumps(ev.to_dict(), default=str), file=_sys.stderr)
            else:
                ts = (ev.ts or "")[11:19]
                print(f"{ts}  [{ev.level:5s}] {ev.msg or ev.name}",
                      file=_sys.stderr)

        engine.events.callbacks.append(_sink)
    argv = [command]
    if args.subcommand:
        argv.append(args.subcommand)
    for s in args.select + args.models_alias:
        argv += ["--select", s]
    for e in args.exclude:
        argv += ["--exclude", e]
    if args.full_refresh:
        argv.append("--full-refresh")
    if args.state:
        argv += ["--state", args.state]
    if args.op_args:
        argv += ["--args", args.op_args]
    if args.inline:
        argv += ["--inline", args.inline]
    if args.inline_direct:
        argv += ["--inline-direct", args.inline_direct]
    if args.limit is not None:
        argv += ["--limit", str(args.limit)]
    if args.defer_flag:
        argv.append("--defer")
    if args.empty:
        argv.append("--empty")
    if args.sample:
        argv += ["--sample", args.sample]
    if args.selector:
        argv += ["--selector", args.selector]
    if args.indirect:
        argv += ["--indirect-selection", args.indirect]
    if args.warn_error:
        argv.append("--warn-error")
    if args.warn_error_options:
        argv += ["--warn-error-options", args.warn_error_options]
    if args.fail_fast:
        argv.append("--fail-fast")
    if args.port is not None:
        argv += ["--port", str(args.port)]
    if args.host:
        argv += ["--host", args.host]
    if args.output and args.output != "default":
        argv += ["--output", args.output]
    if args.output_keys:
        argv += ["--output-keys", args.output_keys]
    if args.favor_state:
        argv.append("--favor-state")
    if args.store_failures:
        argv.append("--store-failures")
    if args.include_saved_query:
        argv.append("--include-saved-query")
    for rt in args.resource_type:
        argv += ["--resource-type", rt]
    for rt in args.exclude_resource_type:
        argv += ["--exclude-resource-type", rt]
    if args.no_partial_parse:
        argv.append("--no-partial-parse")
    if args.no_write_json:
        argv.append("--no-write-json")
    if args.defer_state:
        argv += ["--defer-state", args.defer_state]
    if args.add_package:
        argv += ["--add-package", args.add_package]
        if args.deps_source != "hub":
            argv += ["--source", args.deps_source]
    if args.record_timing_info:
        argv += ["--record-timing-info", args.record_timing_info]
    if args.upgrade:
        argv.append("--upgrade")
    if args.lock:
        argv.append("--lock")
    if args.event_time_start:
        argv += ["--event-time-start", args.event_time_start]
    if args.event_time_end:
        argv += ["--event-time-end", args.event_time_end]
    if args.empty_catalog:
        argv.append("--empty-catalog")
    if args.static:
        argv.append("--static")
    if args.connection:
        argv.append("--connection")
    if args.partial_parse_file_path:
        argv += ["--partial-parse-file-path", args.partial_parse_file_path]
    try:
        result = engine.invoke(argv)
    except Exception as e:  # noqa: BLE001 — CLI boundary: clean error, not a
        # traceback (reference prints "Encountered an error:" and exits 2)
        import sys as _sys

        print(f"Encountered an error:\n  {type(e).__name__}: {e}",
              file=_sys.stderr)
        return 2
    if result.preview is not None:
        if command == "show" and args.output == "json":
            # reference `dbt show --output json` (cli/params.py:570,
            # task/show.py:95-96): machine-readable preview rows
            import json as _json

            print(_json.dumps({"show": result.preview}, default=str, indent=2))
            return 0 if result.success else 1
        for row in result.preview:
            print(row)
    if command == "ls" and args.output != "default":
        # reference `dbt ls --output ...` (task/list.py:27-212): the runner
        # already rendered each row via _ls_render into the result message
        for r in result.results:
            print(r.message if r.message else r.unique_id)
        return 0 if result.success else 1
    for r in result.results:
        if args.quiet and r.status not in ("error", "fail"):
            continue
        print(f"{r.status:8s} {r.unique_id:60s} {r.execution_time:6.2f}s "
              f"{r.message.splitlines()[0] if r.message else ''}")
    if not args.quiet:
        print(f"\n{'OK' if result.success else 'FAILED'}: "
              f"{len(result.results)} node(s)")
    return 0 if result.success else 1


STARTER = {
    "dbt_project.yml": """name: {name}
model-paths: ["models"]
seed-paths: ["seeds"]
models:
  {name}:
    example:
      +materialized: table
""",
    "models/example/my_first_model.sql": """-- start here: `python -m dbt_spark run`
select 1 as id, 'hello' as greeting
""",
    "models/example/my_second_model.sql": """select id, upper(greeting) as greeting
from {{{{ ref('my_first_model') }}}}
""",
    "models/example/schema.yml": """models:
  - name: my_first_model
    columns:
      - name: id
        data_tests: [not_null, unique]
  - name: my_second_model
    columns:
      - name: id
        data_tests:
          - relationships:
              to: ref('my_first_model')
              field: id
""",
}


def _init(name: str, skip_profile: bool = False) -> int:
    """Scaffold a starter project (core/dbt/task/init.py:52-297,
    core/dbt/include/starter_project). A default profiles.yml is written
    beside the project unless --skip-profile-setup/-S (reference -s)."""
    import os

    if os.path.exists(name):
        print(f"error: {name} already exists")
        return 1
    files = dict(STARTER)
    if not skip_profile:
        files["profiles.yml"] = (
            "{name}:\n"
            "  target: dev\n"
            "  outputs:\n"
            "    dev:\n"
            "      type: spark\n"
            "      warehouse: spark-warehouse\n"
            "      schema: main\n"
            "      threads: 4\n"
        )
    for rel, content in files.items():
        p = os.path.join(name, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(content.format(name=os.path.basename(name)))
    print(f"created {name}/ — next: cd {name} && python -m dbt_spark build")
    return 0


if __name__ == "__main__":
    sys.exit(main())
