"""Dump .explain('formatted') for named queries() entries to
plans/r06/<query>_<tag>.txt (judge evidence for the optimization round).

Usage: python tools/dump_plans.py <tag> <name> [name...]
Env: SF_DIR (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as em
    from pyg_timeseries_spark.session import get_spark

    spark = get_spark("dump_plans", master="local[8]", shuffle_partitions=8)
    qdict = em.queries()
    out_dir = os.path.join(ROOT, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qdict[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
