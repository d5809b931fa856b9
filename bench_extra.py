#!/usr/bin/env python
"""Supplementary benchmarks (round 6) — bench.py is FROZEN for driver
measurement, so everything extra lives here.

Two blocks, one JSON line out:

- "queries_noop": the bench HEADLINE queries plus the training-data
  operators (d5/d6/d7/d8, c3/c4, t6) timed with the noop sink
  (guide §1.4: computes every column of every row, no driver collect,
  no count-pruning) at $SPARK_GRAFT_SF_DIR. Each query runs ``repeats``
  times; the per-query list is printed so warmup vs steady state is
  visible (bench.py's single cold pass charges session/JIT warmup to
  whichever query runs first — q1's bench number is ~90% warmup, see
  OPTIMIZATION_r06.md).
- "frontier": the same frontier job bench.py runs (same generator, same
  config), for in-repo A/B work.

Usage: python bench_extra.py [--no-frontier] [--repeats N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen harness — reused, never modified)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

EXTRA = [
    "d5_simhash",
    "d6_dedup_clusters",
    "d7_incremental_dedup",
    "d8_dup_substring",
    "c3_cluster_canonical",
    "c4_decontaminate",
    "t6_repetition",
]


def run_queries_noop(spark, repeats: int = 3) -> dict[str, list[float]]:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict[str, list[float]] = {}
    for name in list(bench.HEADLINE) + EXTRA:
        times = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} [noop {i}]")
            t0 = time.time()
            (
                qs[name](spark, SF_DIR)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = times
    return out


def main() -> None:
    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    spark = bench.fresh_spark(bench.CPUS)
    result: dict = {"sf": SF_DIR, "cpus": bench.CPUS}
    result["queries_noop"] = run_queries_noop(spark, repeats=repeats)
    if "--no-frontier" not in sys.argv:
        result["frontier"] = bench.run_frontier(spark)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
