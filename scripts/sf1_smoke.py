"""sf1-scale smoke of the flagship corpus path (round-4 verdict item 6).

Generates a 10x-beyond-sf0.1 synthetic code corpus (1M files across
100k repos — the deterministic generator the unit fixtures use, scaled
up), then drives the whole flagship pipeline IN ONE SESSION:

    corpus -> corpus_df (sha256 invariant) -> repo_edges (vectorized
    extract) -> vertex dictionary -> encoded edges -> triangle count
    (auto plan + forced cogroup for multi-strategy agreement) ->
    PageRank -> connected components (delta default)

Records wall time per stage + peak RSS into BENCH/sf1_smoke.json.
Correctness claim is multi-strategy agreement (two triangle plans
agree; PageRank mass sums to 1; CC label count = CC star label count),
not a value oracle — per the round-4 verdict's "no correctness claim
needed beyond multi-strategy agreement".

Usage: python scripts/sf1_smoke.py [n_files] [n_repos]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + \
    os.environ.get("PYTHONPATH", "")


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_repos = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import functions as F

    from adopt_spark.algos.cc import connected_components
    from adopt_spark.algos.pagerank import pagerank
    from adopt_spark.algos.triangles import triangle_count
    from adopt_spark.corpus import corpus_df, generate_corpus
    from adopt_spark.extract import repo_edges
    from adopt_spark.vertices import encode_edges
    from adopt_spark.session import get_spark
    from adopt_spark.vertices import build_vertex_dictionary

    rec: dict = {"n_files": n_files, "n_repos": n_repos}
    t_all = time.time()

    t0 = time.time()
    c = generate_corpus(n_repos=n_repos, n_files=n_files, seed=42,
                        max_imports=8)
    rec["gen_sec"] = round(time.time() - t0, 2)
    rec["expected_edges"] = len(c.expected_edges)

    spark = get_spark("sf1_smoke", cpus=32, shuffle_partitions=64)
    t0 = time.time()
    df = corpus_df(spark, c, num_partitions=64)
    df = df.persist()
    rec["corpus_rows"] = df.count()
    rec["sha_distinct"] = df.select("content_sha").distinct().count()
    rec["corpus_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    e = repo_edges(df)
    verts = build_vertex_dictionary(
        e.select(F.col("src_repo").alias("repo"))
        .unionAll(e.select(F.col("dst_repo").alias("repo"))))
    enc = encode_edges(e, verts).persist()
    rec["edges"] = enc.count()
    rec["edges_match_expected"] = rec["edges"] == rec["expected_edges"]
    rec["extract_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    tri_auto = triangle_count(enc, "auto").collect()[0][0]
    rec["triangle_auto_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    tri_cg = triangle_count(enc, "cogroup").collect()[0][0]
    rec["triangle_cogroup_sec"] = round(time.time() - t0, 2)
    rec["triangles"] = int(tri_auto)
    rec["triangle_plans_agree"] = int(tri_auto) == int(tri_cg)

    t0 = time.time()
    ranks, pr_metrics = pagerank(spark, enc, tol=1e-6, max_iter=30)
    mass = ranks.agg(F.sum("rank")).first()[0]
    rec["pagerank_sec"] = round(time.time() - t0, 2)
    rec["pagerank_supersteps"] = len(pr_metrics)
    rec["pagerank_mass_ok"] = abs(float(mass) - 1.0) < 1e-6

    t0 = time.time()
    lab, cc_metrics = connected_components(spark, enc)     # delta default
    n_delta = lab.select("component").distinct().count()
    rec["cc_sec"] = round(time.time() - t0, 2)
    rec["cc_rounds"] = len(cc_metrics)
    t0 = time.time()
    lab_star, _ = connected_components(spark, enc, method="star")
    n_star = lab_star.select("component").distinct().count()
    rec["cc_star_sec"] = round(time.time() - t0, 2)
    rec["cc_components"] = int(n_delta)
    rec["cc_methods_agree"] = int(n_delta) == int(n_star)

    rec["total_sec"] = round(time.time() - t_all, 2)
    rec["peak_rss_driver_gib"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20, 2)
    # the JVM (a child process) holds the executor memory — report its
    # high-water mark too (local[32]: one JVM is the whole cluster)
    try:
        import subprocess
        kids = subprocess.run(
            ["ps", "-o", "pid=,comm=", "--ppid", str(os.getpid())],
            capture_output=True, text=True).stdout.split()
        for pid, comm in zip(kids[::2], kids[1::2]):
            if comm == "java":
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmHWM"):
                            kib = int(line.split()[1])
                            rec["peak_rss_jvm_gib"] = round(kib / 2**20, 2)
    except OSError:
        pass
    out = "/root/repo/BENCH/sf1_smoke.json"
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
