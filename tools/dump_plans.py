"""Dump explain("formatted") for catalog queries to text files.

The optimization-round deliverable: plans/r{N}/<query>_{before,after}.txt
holds the formatted physical plan of every query a round touched, so the
judge can check plan claims (Exchange counts, join strategies, pushed
filters) without running Spark.

Usage:
    python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query. Plans are captured
BEFORE execution (AdaptiveSparkPlan initial plan), which is what
explain("formatted") prints.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix, sf_dir, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from replicadb_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = entry.queries()
    rc = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            plan = sdf._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 - record the failure in the file
            plan = f"ERROR dumping plan: {e}"
            rc = 1
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({suffix}) @ {sf_dir}\n")
            f.write(plan)
            if not plan.endswith("\n"):
                f.write("\n")
        print(f"wrote {path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
