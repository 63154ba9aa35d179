"""Profile the 2,000-model engine run (bench.py's _bench_run_2000 shape).

Usage: python tools/prof_run2k.py [--cprofile] [--reps N]
Prints wall seconds per rep; with --cprofile, dumps the top cumulative
functions of ONE run (threads=1 profile catches only the main thread, so
the run uses --threads 1 under cProfile for full visibility).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_project() -> str:
    root = tempfile.mkdtemp(prefix="prof_run2000_")
    with open(os.path.join(root, "dbt_project.yml"), "w") as f:
        f.write("name: perf2000run\n")
    models = os.path.join(root, "models")
    os.makedirs(models)
    for c in range(200):
        for i in range(10):
            sql = ("select 1 as id, 'x' as v" if i == 0 else
                   f"select * from {{{{ ref('n_{c}_{i - 1}') }}}}")
            with open(os.path.join(models, f"n_{c}_{i}.sql"), "w") as f:
                f.write(sql)
    return root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--threads", type=int, default=None)
    args = ap.parse_args()

    from dbt_spark.runner import Engine
    from dbt_spark.session import get_spark

    spark = get_spark("prof_run2k")
    spark.range(10).count()  # warm the JVM

    argv = ["run"]
    if args.threads:
        argv += ["--threads", str(args.threads)]

    if args.cprofile:
        import cProfile
        import pstats

        root = build_project()
        try:
            eng = Engine(root, spark=spark)
            pr = cProfile.Profile()
            pr.enable()
            res = eng.invoke(["run", "--threads", "1"])
            pr.disable()
            assert res.success
            stats = pstats.Stats(pr)
            stats.sort_stats("cumulative").print_stats(45)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return

    for _ in range(args.reps):
        root = build_project()
        try:
            eng = Engine(root, spark=spark)
            t0 = time.time()
            res = eng.invoke(argv)
            dt = time.time() - t0
            print(f"run2k: {dt:.3f}s ok={res.success}", file=sys.stderr)
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
