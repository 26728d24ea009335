"""Tree-vs-tree A/B for bench drift root-causing (VERDICT r14 item 2).

Usage: python tools/ab_drift.py <tree_root> [n_runs] [query ...]

Runs the named queries (default: the five from VERDICT r14) from the
given checked-out tree, with bench.py's exact protocol — same session
config, same warmups, same host-throughput probes, cache-cold runs with
release_caches + clearCache between — but 3 runs per query instead of
2, and prints one JSON line with every raw timing. Run it alternately
(BOTH orders — the r15 A/B showed run order alone can fake a 20%
delta) against the two trees on a QUIET host; if the per-query deltas
reproduce tree-vs-tree the regression is real code or memory-pressure
effect, if they vanish the readings were host drift the probe
under-corrected.

Each invocation is its own process (fresh JVM) so per-(process, sf_dir)
persisted layouts rebuild exactly like a driver bench run.
"""

from __future__ import annotations

import json
import os
import sys
import time

DEFAULT_QUERIES = [
    "dedup_containment",
    "q2_min_cost_supplier",
    "basket_jaccard_customers",
    "pagerank_copurchase",
    "tfidf_top_terms",
]


def main() -> int:
    tree = os.path.abspath(sys.argv[1])
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    QUERIES = sys.argv[3:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, tree)
    os.chdir(tree)

    from replicadb_spark.cache import persisted_df_count, release_caches
    from replicadb_spark.plans.catalog import QUERIES as CATALOG
    from replicadb_spark.session import get_spark

    spark = get_spark("ab-drift")
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def _ident(it):
        import numpy as np

        for pdf in it:
            pdf["id"] = pdf["id"] + np.int64(0)
            yield pdf

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()

    def _probe_py() -> float:
        def k(it):
            import numpy as np

            for pdf in it:
                a = np.arange(200_000, dtype=np.float64)
                pdf["id"] = pdf["id"] + np.int64((a * 1.0001).sum() % 7)
                yield pdf

        t0 = time.time()
        spark.range(500_000).repartition(32).mapInPandas(k, "id long").count()
        return time.time() - t0

    def _probe_jvm() -> float:
        t0 = time.time()
        spark.range(0, 200_000_000).selectExpr("sum(id * 2 + 1)").collect()
        return time.time() - t0

    probes = {
        "py": [round(_probe_py(), 3) for _ in range(3)],
        "jvm": [round(_probe_jvm(), 3) for _ in range(3)],
    }

    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = CATALOG[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            release_caches(spark)
            spark.catalog.clearCache()
        out[name] = {"runs": runs, "min": min(runs), "rows": n}
        print(f"# {tree} {name}: min {min(runs):.2f}s runs {runs}",
              file=sys.stderr)
        assert persisted_df_count(spark) == 0

    print(json.dumps({
        "tree": tree,
        "probes": {k: min(v) for k, v in probes.items()},
        "probe_runs": probes,
        "queries": out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
