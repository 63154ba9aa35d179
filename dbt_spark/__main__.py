"""CLI: python -m dbt_spark <command> [...].

The command surface mirrors core/dbt/cli/main.py registrations (SURVEY §2B
CLI inventory): run, build, test, seed, snapshot, compile, ls/list, show,
run-operation, docs generate, source freshness, retry. Flags: --project-dir,
--select/-s, --exclude, --full-refresh, --vars, --state, --args, --inline,
--limit.
"""

from __future__ import annotations

import argparse
import sys

import yaml


def main() -> int:
    ap = argparse.ArgumentParser(prog="dbt_spark")
    ap.add_argument(
        "command",
        choices=["run", "build", "test", "seed", "snapshot", "compile", "ls",
                 "list", "show", "run-operation", "docs", "source", "retry",
                 "clone", "deps"],
    )
    ap.add_argument("subcommand", nargs="?", default=None,
                    help="docs generate | source freshness | run-operation <macro>")
    ap.add_argument("--project-dir", default=".")
    ap.add_argument("--select", "-s", action="append", default=[])
    ap.add_argument("--exclude", action="append", default=[])
    ap.add_argument("--full-refresh", action="store_true")
    ap.add_argument("--vars", default=None)
    ap.add_argument("--state", default=None)
    ap.add_argument("--args", dest="op_args", default=None)
    ap.add_argument("--inline", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--defer", action="store_true", dest="defer_flag")
    ap.add_argument("--empty", action="store_true")
    args = ap.parse_args()

    from dbt_spark.runner import Engine

    command = "ls" if args.command == "list" else args.command
    engine = Engine(
        args.project_dir,
        vars=yaml.safe_load(args.vars) if args.vars else None,
    )
    argv = [command]
    if args.subcommand:
        argv.append(args.subcommand)
    for s in args.select:
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
    if args.limit is not None:
        argv += ["--limit", str(args.limit)]
    if args.defer_flag:
        argv.append("--defer")
    if args.empty:
        argv.append("--empty")
    result = engine.invoke(argv)
    if result.preview is not None:
        for row in result.preview:
            print(row)
    for r in result.results:
        print(f"{r.status:8s} {r.unique_id:60s} {r.execution_time:6.2f}s "
              f"{r.message.splitlines()[0] if r.message else ''}")
    print(f"\n{'OK' if result.success else 'FAILED'}: {len(result.results)} node(s)")
    return 0 if result.success else 1


if __name__ == "__main__":
    sys.exit(main())
