"""Split a query's wall time into build (py4j plan construction + any
in-construction actions) vs execute (the count() the bench times minus
build). Mirrors bench.py's methodology: warm session, two cold runs,
release_caches between. Usage:

    python tools/profile_queries.py sf_dir query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir, *names = sys.argv[1:]

    from replicadb_spark.cache import release_caches
    from replicadb_spark.plans.catalog import QUERIES
    from replicadb_spark.session import get_spark

    spark = get_spark("profile-queries")
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def _ident(it):
        import numpy as np

        for pdf in it:
            pdf["id"] = pdf["id"] + np.int64(0)
            yield pdf

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()

    for name in names:
        fn = QUERIES[name]
        for run in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            n = df.count()
            t2 = time.time()
            release_caches(spark)
            spark.catalog.clearCache()
            print(
                f"{name} run{run}: build {t1 - t0:.3f}s  exec {t2 - t1:.3f}s"
                f"  total {t2 - t0:.3f}s  ({n} rows)"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
