"""Cluster job entrypoint: PageRank over an edge parquet table.

Deploy path (north rule):
    scripts/make_dist.sh
    spark-submit --master <cluster> --py-files dist/adopt_spark.zip \\
        scripts/job_pagerank.py --edges <parquet> --checkpoint-dir <dir> \\
        [--resume] [--tol 1e-6] [--max-iter 100]

The entrypoint builds NO SparkSession config of its own beyond app
name — master, executor counts, memory, and shuffle settings come from
spark-submit, which is what lets the same job run at N and 4N
executors unchanged. Locally it also runs under plain `python` (the
session factory fills in local[N] defaults).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--edges", required=True, help="parquet path with (sid, tid)")
    p.add_argument("--output", default=None, help="parquet path for final ranks")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=100)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from adopt_spark.algos.pagerank import pagerank

    # under spark-submit the session (master, executors) is preconfigured;
    # standalone `python` falls back to the local factory
    spark = SparkSession.getActiveSession()
    if spark is None:
        builder = SparkSession.builder.appName("adopt_spark_pagerank")
        spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    edges = spark.read.parquet(args.edges)
    ranks, metrics = pagerank(
        spark, edges, damping=args.damping, tol=args.tol,
        max_iter=args.max_iter, checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
    )
    if args.output:
        ranks.write.mode("overwrite").parquet(args.output)
    summary = {
        "supersteps": len(metrics),
        "final_l1_delta": metrics[-1]["l1_delta"] if metrics else None,
        "edges": metrics[-1]["edges"] if metrics else 0,
        "median_edges_per_sec": sorted(m["edges_per_sec"] for m in metrics)[len(metrics) // 2]
        if metrics else 0,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
