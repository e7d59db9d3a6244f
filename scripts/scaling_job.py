"""One scaling-measurement job: fixed graph workload at a given core count.

Usage: python scripts/scaling_job.py <cpus> <edges_parquet> <out_json> [parts]

``parts`` (default ``pr,cogroup,join``; also ``sssp``) selects which measurements run,
so a single part can be re-measured without paying for the others:

  pr       — PageRank for a FIXED number of supersteps (identical work
             at every parallelism level)
  cogroup  — the partition-parallel cogroup triangle kernel (the north
             star's named at-scale strategy)
  join     — the degree-oriented wedge self-join triangle plan (what
             ``triangle_count(..., "auto")`` actually picks on a sparse
             W/E≈1 graph like the scaling input)

Runs in a fresh JVM (one process per parallelism level so nothing is
shared). Prints/writes JSON timings.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

# Under the north-rule deploy path (spark-submit --py-files
# dist/adopt_spark.zip, launched from a NEUTRAL cwd) the package must
# import from the shipped zip — only fall back to the repo checkout
# when the artifact is absent (plain `python scripts/scaling_job.py`).
try:
    import adopt_spark  # noqa: F401
except ImportError:
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
    parts = (sys.argv[4] if len(sys.argv) > 4 else "pr,cogroup,join").split(",")

    from adopt_spark.algos.pagerank import pagerank
    from adopt_spark.algos.triangles import triangle_count
    from adopt_spark.session import get_spark

    # periodic driver GC so the ContextCleaner actually drops shuffle
    # files from completed supersteps — with a 64g heap the driver may
    # never GC on its own, and 20+ rounds of 2-4 GB shuffle spill can
    # fill the sandbox disk (observed: ENOSPC mid-LPA at 8 rounds)
    spark = get_spark(f"scaling_{cpus}", cpus=cpus,
                      extra_conf={"spark.cleaner.periodicGC.interval": "120s"})
    edges = spark.read.parquet(edges_path).persist()
    n_edges = edges.count()
    out = {"cpus": cpus, "n_edges": n_edges}

    if "pr" in parts:
        t0 = time.time()
        _, metrics = pagerank(spark, edges, tol=0.0, max_iter=FIXED_SUPERSTEPS)
        pr_sec = time.time() - t0
        # true median (averages the middle pair for even counts): jitter-robust
        per_step = statistics.median(m["sec"] for m in metrics)
        out.update({
            "pagerank_supersteps": len(metrics),
            "pagerank_total_sec": round(pr_sec, 3),
            "pagerank_sec_per_superstep": round(per_step, 3),
            "pagerank_edges_per_sec": round(n_edges / per_step, 1),
            "pagerank_steps_sec": [round(m["sec"], 3) for m in metrics],
        })

    # North-rule metric also names triangle-count wall time. Two plans:
    # the partition-parallel COGROUP kernel (the north star's own wording,
    # "partition-parallel cogroup over degree-ordered CSR blocks" — the
    # 100-TB strategy, but array-shuffle-heavy, so on ONE box it is
    # bounded by the shared disk/memory-bandwidth, not cores), and the
    # wedge self-JOIN plan, which is what `auto` dispatches on this
    # sparse W/E≈1 graph and whose shuffle is rows, not arrays. The
    # broadcast-CSR kernel is deliberately NOT measured: its serial
    # driver-side CSR build dominates (measured 69.6s→60.1s for 2→8
    # cores = no scaling), which is exactly why it is capped to the
    # small-graph regime. Median of TRIANGLE_REPS runs in the same JVM
    # (rep 1 absorbs codegen/JIT warmup).
    for method in ("cogroup", "join"):
        if method not in parts:
            continue
        secs = []
        n_triangles = None
        for _ in range(TRIANGLE_REPS):
            t0 = time.time()
            rows = triangle_count(edges.selectExpr("sid", "tid"), method).collect()
            secs.append(round(time.time() - t0, 3))
            n_triangles = int(rows[0][0])
        out.update({
            f"triangle_{method}_sec": statistics.median(secs),
            f"triangle_{method}_secs": secs,
            "n_triangles": n_triangles,
        })

    if "cc" in parts:
        # large-star/small-star CC: round count is graph-determined
        # (identical work at every level); median round sec scales.
        from adopt_spark.algos.cc import connected_components

        t0 = time.time()
        # explicit: the repo default became delta ("auto") in round 5;
        # this part measures the star plan specifically
        labels, metrics = connected_components(spark, edges,
                                               method="star")
        n_comp = labels.select("component").distinct().count()
        cc_sec = time.time() - t0
        per_round = statistics.median(m["sec"] for m in metrics)
        out.update({
            "cc_rounds": len(metrics),
            "cc_components": n_comp,
            "cc_total_sec": round(cc_sec, 3),
            "cc_sec_per_round": round(per_round, 3),
            "cc_round_secs": [round(m["sec"], 3) for m in metrics],
        })

    if "ccdelta" in parts:
        # delta-frontier CC: per-round work shrinks with the frontier,
        # so the honest throughput statistic is TOTAL wall time (the
        # work sequence is deterministic and identical at every level).
        from adopt_spark.algos.cc import connected_components

        t0 = time.time()
        labels, metrics = connected_components(spark, edges,
                                               method="delta")
        n_comp = labels.select("component").distinct().count()
        sec = time.time() - t0
        out.update({
            "ccdelta_rounds": len(metrics),
            "ccdelta_components": n_comp,
            "ccdelta_total_sec": round(sec, 3),
            "ccdelta_round_secs": [round(m["sec"], 3) for m in metrics],
            "ccdelta_changed": [m.get("changed") for m in metrics],
        })

    if "lpadelta" in parts:
        # frontier-recompute LPA at the same FIXED round count as the
        # sync measurement — identical labels, work ∝ frontier edges.
        from adopt_spark.algos.lpa import label_propagation

        LPA_ROUNDS = 8
        t0 = time.time()
        labels, metrics = label_propagation(spark, edges,
                                            max_iter=LPA_ROUNDS,
                                            mode="delta")
        n_labels = labels.select("label").distinct().count()
        sec = time.time() - t0
        out.update({
            "lpadelta_rounds": len(metrics),
            "lpadelta_labels": n_labels,
            "lpadelta_total_sec": round(sec, 3),
            "lpadelta_round_secs": [round(m["sec"], 3) for m in metrics],
            "lpadelta_changed": [m.get("changed") for m in metrics],
        })

    if "lpa" in parts:
        # synchronous LPA capped at a FIXED round count (far below
        # convergence on this graph), so both levels do identical work.
        # 8 rounds (was 5): at the fast level the first 2-3 rounds are
        # JIT/cache-warmup-inflated, so a 5-round median lands on a
        # warmup round; 8 rounds lets the median measure steady state
        # — the regime any 100+-superstep production run lives in.
        from adopt_spark.algos.lpa import label_propagation

        LPA_ROUNDS = 8
        t0 = time.time()
        labels, metrics = label_propagation(spark, edges,
                                            max_iter=LPA_ROUNDS)
        n_labels = labels.select("label").distinct().count()
        lpa_sec = time.time() - t0
        per_round = statistics.median(m["sec"] for m in metrics)
        out.update({
            "lpa_rounds": len(metrics),
            "lpa_labels": n_labels,
            "lpa_total_sec": round(lpa_sec, 3),
            "lpa_sec_per_round": round(per_round, 3),
            "lpa_round_secs": [round(m["sec"], 3) for m in metrics],
        })

    if "sssp" in parts:
        # weighted SSSP from vertex 0: the round count is a property of
        # the graph, not the parallelism, so the work is identical at
        # every level; median round time is the scaling statistic.
        from adopt_spark.algos.paths import shortest_paths

        t0 = time.time()
        dist, metrics = shortest_paths(spark, edges, 0, weighted=True,
                                       directed=True)
        n_reached = dist.count()
        sssp_sec = time.time() - t0
        per_round = statistics.median(m["sec"] for m in metrics)
        out.update({
            "sssp_rounds": len(metrics),
            "sssp_reached": n_reached,
            "sssp_total_sec": round(sssp_sec, 3),
            "sssp_sec_per_round": round(per_round, 3),
            "sssp_round_secs": [round(m["sec"], 3) for m in metrics],
        })

    with open(out_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
