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

FIXED_SUPERSTEPS = 6     # median over 6 is robust to this VM's bursty CPU


def main() -> None:
    cpus = int(sys.argv[1])
    edges_path = sys.argv[2]
    out_path = sys.argv[3]

    from adopt_spark.algos.pagerank import pagerank
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

    out = {
        "cpus": cpus,
        "n_edges": n_edges,
        "pagerank_supersteps": len(metrics),
        "pagerank_total_sec": round(pr_sec, 3),
        "pagerank_sec_per_superstep": round(per_step, 3),
        "pagerank_edges_per_sec": round(n_edges / per_step, 1),
        "pagerank_steps_sec": [round(m["sec"], 3) for m in metrics],
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
