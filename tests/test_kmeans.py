"""Fixed-iteration k-means vs a numpy Lloyd twin."""

import numpy as np

from adopt_spark.functions.kmeans import kmeans_assign


def numpy_kmeans(vecs, k, iters):
    ids = sorted(vecs)
    cents = {c: np.array(vecs[pid], dtype=np.float64)
             for c, pid in enumerate(ids[:k])}

    def assign():
        out = {}
        for pid in ids:
            v = np.array(vecs[pid], dtype=np.float64)
            best = min(((float(((v - m) ** 2).sum()), c)
                        for c, m in cents.items()))
            out[pid] = best[1]
        return out

    for _ in range(iters):
        a = assign()
        nxt = {}
        for c in set(a.values()):
            pts = [np.array(vecs[p], dtype=np.float64)
                   for p in ids if a[p] == c]
            nxt[c] = np.mean(pts, axis=0)
        cents = nxt
    return assign()


def _run(spark, vecs, k, iters, n_parts):
    df = spark.createDataFrame(
        [(pid, [float(x) for x in v]) for pid, v in vecs.items()],
        "vec_id long, embedding array<double>").repartition(n_parts)
    got = {r["vec_id"]: r["cid"]
           for r in kmeans_assign(df, k=k, iters=iters).collect()}
    assert got == numpy_kmeans(vecs, k, iters)


def test_kmeans_three_blobs(spark):
    rng = np.random.default_rng(9)
    vecs = {}
    for b, center in enumerate([(0, 0), (10, 0), (0, 10)]):
        for i in range(40):
            vecs[b * 100 + i] = np.array(center) + rng.normal(0, 1, 2)
    _run(spark, vecs, k=3, iters=4, n_parts=6)


def test_kmeans_more_clusters_than_structure(spark):
    rng = np.random.default_rng(1)
    vecs = {i: rng.normal(0, 1, 5) for i in range(60)}
    _run(spark, vecs, k=8, iters=3, n_parts=4)


def test_kmeans_duplicate_points_deterministic(spark):
    # identical vectors tie on distance to every centroid: the
    # smaller-cid tie-break must put them in the SAME cluster
    vecs = {i: [1.0, 1.0] for i in range(10)}
    vecs.update({100 + i: [5.0, 5.0] for i in range(10)})
    _run(spark, vecs, k=2, iters=2, n_parts=5)
