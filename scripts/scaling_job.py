"""One scaling-measurement job: fixed graph workload at a given core count.

Usage: python scripts/scaling_job.py <cpus> <edges_parquet> <out_json>

Runs, in a fresh JVM (one process per parallelism level so nothing is
shared): PageRank for a FIXED number of supersteps (identical work at
every parallelism level) and the CSR cogroup triangle count, over the
same input parquet. Prints/writes JSON timings.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

FIXED_SUPERSTEPS = 10    # median over 10: robust to this VM's bursty CPU
                         # AND to JVM/JIT warmup, which otherwise inflates
                         # the fast level's median (a 13s superstep carries
                         # proportionally more warmup than a 41s one)
TRIANGLE_REPS = 3        # median-of-3 for the triangle wall time


def main() -> None:
    cpus = int(sys.argv[1])
    edges_path = sys.argv[2]
    out_path = sys.argv[3]

    from adopt_spark.algos.pagerank import pagerank
    from adopt_spark.algos.triangles import triangle_count
    from adopt_spark.session import get_spark

    spark = get_spark(f"scaling_{cpus}", cpus=cpus)
    edges = spark.read.parquet(edges_path).persist()
    n_edges = edges.count()

    t0 = time.time()
    _, metrics = pagerank(spark, edges, tol=0.0, max_iter=FIXED_SUPERSTEPS)
    pr_sec = time.time() - t0
    import statistics
    # true median (averages the middle pair for even counts): jitter-robust
    per_step = statistics.median(m["sec"] for m in metrics)

    # North-rule metric also names triangle-count wall time. Measure the
    # partition-parallel COGROUP kernel — the north star's own wording
    # ("partition-parallel cogroup over degree-ordered CSR blocks") and
    # the variant built to scale with executors; the broadcast-CSR
    # kernel is the small-graph shortcut whose serial driver-side CSR
    # build dominates here by design (measured: 69.6s→60.1s for 2→8
    # cores = no scaling, exactly why it is NOT the 100-TB path).
    # Median of TRIANGLE_REPS runs in the same JVM (rep 1 absorbs
    # codegen/JIT warmup).
    tri_secs = []
    n_triangles = None
    for _ in range(TRIANGLE_REPS):
        t0 = time.time()
        rows = triangle_count(edges.selectExpr("sid", "tid"), "cogroup").collect()
        tri_secs.append(round(time.time() - t0, 3))
        n_triangles = int(rows[0][0])
    tri_sec = statistics.median(tri_secs)

    out = {
        "cpus": cpus,
        "n_edges": n_edges,
        "pagerank_supersteps": len(metrics),
        "pagerank_total_sec": round(pr_sec, 3),
        "pagerank_sec_per_superstep": round(per_step, 3),
        "pagerank_edges_per_sec": round(n_edges / per_step, 1),
        "pagerank_steps_sec": [round(m["sec"], 3) for m in metrics],
        "triangle_cogroup_sec": round(tri_sec, 3),
        "triangle_cogroup_secs": tri_secs,
        "n_triangles": n_triangles,
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
