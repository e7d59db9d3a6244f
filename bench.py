"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pagerank_edges_per_sec": ..., "triangle_csr_sec": ...}

Headline set: the reference's flagship (triangle counting, both
physical strategies + the 4-cycle motif on the sparse corpus graph),
the iterative north-rule algorithms (PageRank throughput in
edges/sec/superstep, CC), the end-to-end corpus pipeline
(extract → encode → count), and a relational/dedup/knn slice.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _hw_calibration() -> dict:
    """Fixed numpy busy-work measured immediately before the suite —
    a same-box noise gauge for this VM's documented bursty CPU (the
    identical binary workload has measured 1x-6x wall-time swings
    between runs). Readers comparing BENCH_r{N}.json across rounds
    should read suite seconds relative to these two constants:
    `hw_calib_1p_sec` (single process) and `hw_calib_8p_sec`
    (8 concurrent processes, which also senses all-core throttling /
    co-tenant contention). The work is fixed and deterministic, so on
    an idle box both numbers are stable run-to-run.
    """
    import multiprocessing as mp

    import numpy as np

    def burn(reps: int) -> None:
        rng = np.random.default_rng(0)
        keys = np.sort(rng.integers(0, 1 << 40, 2_000_000))
        q = rng.integers(0, 1 << 40, 500_000)
        for _ in range(reps):
            np.searchsorted(keys, q)

    t0 = time.time()
    burn(10)
    one = round(time.time() - t0, 3)
    t0 = time.time()
    with mp.Pool(8) as p:
        p.map(_burn_child, [10] * 8)
    eight = round(time.time() - t0, 3)
    return {"hw_calib_1p_sec": one, "hw_calib_8p_sec": eight}


def _burn_child(reps: int) -> None:
    import numpy as np

    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, 1 << 40, 2_000_000))
    q = rng.integers(0, 1 << 40, 500_000)
    for _ in range(reps):
        np.searchsorted(keys, q)


def main() -> None:
    from pyspark.sql import functions as F

    from adopt_spark.algos.cc import connected_components
    from adopt_spark.algos.motifs import count_cycle
    from adopt_spark.algos.pagerank import pagerank
    from adopt_spark.algos.triangles import triangle_count
    from adopt_spark.corpus import corpus_df, generate_corpus
    from adopt_spark.edges import derived_edges
    from adopt_spark.extract import repo_edges
    from adopt_spark.functions.dedup import minhash_near_dup_pairs
    from adopt_spark.functions.similarity import brute_force_topk
    from adopt_spark.queries.registry import all_queries
    from adopt_spark.session import get_spark
    from adopt_spark.vertices import build_vertex_dictionary, encode_edges

    spark = get_spark("bench", cpus=CPUS)
    timings: dict[str, float] = {}
    extras: dict[str, float] = dict(_hw_calibration())

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # --- warm the JVM/session (excluded from timings)
    spark.range(1000).count()

    # --- graph: dense derived edge table (the driver-contract graph)
    edges = derived_edges(spark, SF_DIR).persist()
    timed("edge_build", edges.count)
    timed("triangle_join", lambda: triangle_count(edges, "join").collect())
    timed("triangle_csr", lambda: triangle_count(edges, "csr").collect())
    extras["triangle_csr_sec"] = timings["triangle_csr"]
    timed("triangle_cogroup", lambda: triangle_count(edges, "cogroup").collect())
    # median-of-3 for the adaptivity headline: single reps on this VM's
    # bursty CPU have produced 5x outliers (r03 driver artifact: 19.5s
    # for a dispatch whose chosen plan cost 3.8s standalone in the same
    # run); the raw reps are recorded alongside the median.
    auto_secs = []
    for _ in range(3):
        t0 = time.time()
        triangle_count(edges, "auto").collect()
        auto_secs.append(round(time.time() - t0, 3))
    timings["triangle_auto"] = sorted(auto_secs)[1]
    extras["triangle_auto_secs"] = auto_secs

    # --- n-cycle DP kernels on the dense graph (the reference's hardest
    # workload; the generated SQL plan is infeasible here — it would
    # materialize ~1e12 length-4 path rows for the 5-cycle)
    from adopt_spark.algos.cycles import cycle_count_cogroup
    timed("cycle4_kernel", lambda: cycle_count_cogroup(edges, 4).collect())
    timed("cycle5_kernel", lambda: cycle_count_cogroup(edges, 5).collect())

    # --- corpus pipeline on the sparse power-law dependency graph
    def corpus_pipeline():
        c = generate_corpus(n_repos=2000, n_files=20000, seed=42,
                            n_hubs=5, hub_prob=0.2)
        df = corpus_df(spark, c, num_partitions=CPUS)
        vocab = build_vertex_dictionary(df, "repo")
        enc = encode_edges(repo_edges(df), vocab)
        return enc.persist()

    corpus_edges = timed("corpus_pipeline", corpus_pipeline)
    n_corpus_edges = corpus_edges.count()
    timed("corpus_triangles", lambda: triangle_count(corpus_edges, "csr").collect())
    timed("corpus_4cycle", lambda: count_cycle(spark, corpus_edges, 4).collect())

    # --- PageRank throughput (the BASELINE.json metric)
    t0 = time.time()
    _, pr_metrics = pagerank(spark, edges, tol=1e-6, max_iter=40)
    timings["pagerank"] = round(time.time() - t0, 3)
    if pr_metrics:
        n_edges = pr_metrics[0]["edges"]
        per_step = sum(m["sec"] for m in pr_metrics) / len(pr_metrics)
        extras["pagerank_supersteps"] = len(pr_metrics)
        extras["pagerank_edges_per_sec"] = round(n_edges / per_step, 1)

    t0 = time.time()
    connected_components(spark, corpus_edges)
    timings["cc"] = round(time.time() - t0, 3)

    t0 = time.time()
    connected_components(spark, corpus_edges, method="delta")
    timings["cc_delta"] = round(time.time() - t0, 3)

    from adopt_spark.algos.lpa import label_propagation

    t0 = time.time()
    label_propagation(spark, corpus_edges, max_iter=5)
    timings["lpa5"] = round(time.time() - t0, 3)

    # --- weighted SSSP on the dense graph (round-3 iterative op)
    from adopt_spark.algos.paths import shortest_paths

    def run_sssp():
        src = int(edges.agg(F.min("sid")).collect()[0][0])
        d, m = shortest_paths(spark, edges, src, weighted=True, directed=True)
        d.count()
        return m

    t0 = time.time()
    sssp_metrics = run_sssp()
    timings["sssp"] = round(time.time() - t0, 3)
    extras["sssp_rounds"] = len(sssp_metrics)

    # --- relational / text / similarity slice via the registry
    qs = all_queries()
    for name in ("r_q1_pricing", "r_join_q3", "r_join_q5ish", "r_window_rank",
                 "t_token_count", "t_exact_dedup", "s_knn_bruteforce"):
        timed(name, lambda n=name: qs[n](spark, SF_DIR).collect())
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("t_minhash_near_dup",
          lambda: minhash_near_dup_pairs(docs, threshold=0.8).count())

    # --- JOB/IMDB acyclic-join suite (the reference's published
    # benchmark workload class). Two lines: the round-4 18-query set
    # (round-over-round comparability) and the full round-5 48-query
    # suite (2- to 17-way joins).
    from adopt_spark.queries.job import JOB_QUERIES, job_query, register_imdb_views

    _R4_JOB = ["job_1a", "job_2a", "job_3b", "job_4a", "job_5c", "job_6b",
               "job_7b", "job_8a", "job_10a", "job_11a", "job_13a",
               "job_14a", "job_16a", "job_17a", "job_23a", "job_25a",
               "job_32a", "job_0a"]

    def run_job_suite(names):
        register_imdb_views(spark, SF_DIR)
        for jq in names:
            job_query(jq)(spark, SF_DIR).collect()

    timed("job_suite_18q", lambda: run_job_suite(_R4_JOB))
    timed("job_suite_48q", lambda: run_job_suite(list(JOB_QUERIES)))
    extras["job_suite_queries"] = len(JOB_QUERIES)

    # attach the latest two-parallelism scaling evidence if present
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            s = json.load(f)
        extras["scaling_efficiency_pagerank"] = s.get("efficiency_pagerank")
        extras["scaling_efficiency_triangle_join"] = s.get("efficiency_triangle_join")
        extras["scaling_efficiency_triangle_cogroup"] = s.get("efficiency_triangle_cogroup")
        for key in ("efficiency_cc", "efficiency_lpa",
                    "efficiency_cc_delta", "efficiency_lpa_delta",
                    "efficiency_cc_delta_bw_normalized",
                    "efficiency_lpa_bw_normalized"):
            if s.get(key) is not None:
                extras[f"scaling_{key}"] = s.get(key)
        hwb = s.get("hardware_baseline", {})
        if hwb.get("stream"):
            extras["scaling_hw_bandwidth_efficiency"] = \
                hwb["stream"].get("efficiency")
        extras["scaling_low_cpus"] = s.get("low", {}).get("cpus")
        extras["scaling_high_cpus"] = s.get("high", {}).get("cpus")
        extras["scaling_edges"] = s.get("high", {}).get("n_edges")
        extras["scaling_low_edges_per_sec"] = \
            s.get("low", {}).get("pagerank_edges_per_sec")
        extras["scaling_high_edges_per_sec"] = \
            s.get("high", {}).get("pagerank_edges_per_sec")

    timings.pop("edge_build", None)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline suite wall time (graph motifs + PageRank/CC + "
                  "corpus pipeline + relational/dedup/knn)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "corpus_edges": n_corpus_edges,
        **extras,
    }))


if __name__ == "__main__":
    main()
