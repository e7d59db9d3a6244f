"""Similarity search: brute force vs numpy truth; LSH recall vs brute."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from adopt_spark.functions.similarity import (
    brute_force_topk, embedding_near_dup, ivf_topk, lsh_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    rows = emb.limit(5).collect()
    return spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in rows],
        "q_id long, q_vec array<float>",
    )


def numpy_topk(emb_rows, q_rows, k):
    ids = np.array([r["vec_id"] for r in emb_rows])
    M = np.array([r["embedding"] for r in emb_rows], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for qid, qv in q_rows:
        q = np.asarray(qv, dtype=np.float64)
        q = q / np.linalg.norm(q)
        cos = M @ q
        # tie-break by id ascending, rank by cos desc
        order = np.lexsort((ids, -cos))[:k]
        out[qid] = [int(ids[i]) for i in order]
    return out


def test_brute_force_matches_numpy(spark, emb, queries):
    k = 5
    got_rows = brute_force_topk(emb, queries, k=k).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["q_id"], r["rank"])):
        got.setdefault(r["q_id"], []).append(r["vec_id"])
    exp = numpy_topk(emb.collect(), [(r["q_id"], r["q_vec"]) for r in queries.collect()], k)
    assert got == exp
    # self-match is always rank 1 with cos ≈ 1
    for r in got_rows:
        if r["rank"] == 1:
            assert r["vec_id"] == r["q_id"]
            assert r["cos"] == pytest.approx(1.0, abs=1e-6)


def test_lsh_topk_recall(spark, emb, queries):
    k = 5
    brute = brute_force_topk(emb, queries, k=k).collect()
    approx = lsh_topk(emb, queries, k=k, bits=12, bands=4).collect()
    bset = {(r["q_id"], r["vec_id"]) for r in brute}
    aset = {(r["q_id"], r["vec_id"]) for r in approx}
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.4          # banded LSH on 64-dim random-ish vectors
    # rank-1 self matches must survive LSH (identical vector → same buckets)
    for q in {r["q_id"] for r in brute}:
        assert (q, q) in aset


def test_ivf_full_probe_equals_brute_force(spark, emb, queries):
    """n_probe = n_centroids probes every cell → exact brute-force result."""
    k = 5
    brute = {(r["q_id"], r["vec_id"], r["rank"])
             for r in brute_force_topk(emb, queries, k=k).collect()}
    ivf = {(r["q_id"], r["vec_id"], r["rank"])
           for r in ivf_topk(emb, queries, k=k, n_centroids=8, n_probe=8).collect()}
    assert ivf == brute


def test_ivf_partial_probe_recall(spark, emb, queries):
    k = 5
    brute = brute_force_topk(emb, queries, k=k).collect()
    approx = ivf_topk(emb, queries, k=k, n_centroids=8, n_probe=3).collect()
    bset = {(r["q_id"], r["vec_id"]) for r in brute}
    aset = {(r["q_id"], r["vec_id"]) for r in approx}
    assert len(bset & aset) / len(bset) >= 0.4
    # each query's own vector shares its cell → self-match always found
    for q in {r["q_id"] for r in brute}:
        assert (q, q) in aset


def test_ivf_deterministic_across_parallelism(spark, emb, queries):
    a = ivf_topk(emb.repartition(2), queries, k=3, n_centroids=8, n_probe=2).collect()
    b = ivf_topk(emb.repartition(16), queries, k=3, n_centroids=8, n_probe=2).collect()
    key = lambda rows: sorted((r["q_id"], r["vec_id"], r["rank"]) for r in rows)
    assert key(a) == key(b)


def test_embedding_near_dup_self_excluded(spark, emb):
    pairs = embedding_near_dup(emb.limit(100), threshold=0.99)
    for r in pairs.collect():
        assert r["a"] < r["b"]
        assert r["cos"] >= 0.99


def test_sq8_topk_vs_numpy(spark):
    import numpy as np

    from adopt_spark.functions.similarity import sq8_topk

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]]), (1, [float(x) for x in vecs[1]])],
        "q_id long, q_vec array<float>")
    got = {(r.q_id, r.rank): (r.vec_id, r.cos)
           for r in sq8_topk(emb, q, k=3).collect()}

    x = vecs.astype(np.float64)
    lo, hi = x.min(axis=0), x.max(axis=0)
    codes = np.clip(np.floor((x - lo) / (hi - lo) * 255.0 + 0.5), 0, 255)
    dq = lo + codes / 255.0 * (hi - lo)
    for qi in (0, 1):
        qv = x[qi]
        cos = (dq @ qv) / (np.linalg.norm(dq, axis=1) * np.linalg.norm(qv))
        order = sorted(range(len(vecs)),
                       key=lambda i: (-round(cos[i], 6), i))[:3]
        for rank, i in enumerate(order, 1):
            vid, c = got[(qi, rank)]
            assert vid == i
            assert c == pytest.approx(round(cos[i], 6), abs=2e-6)


def test_sq8_recall_vs_exact(spark):
    """int8 quantization of well-spread vectors must keep top-1."""
    import numpy as np

    from adopt_spark.functions.similarity import brute_force_topk, sq8_topk

    rng = np.random.default_rng(31)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(7, [float(x) for x in vecs[7]])], "q_id long, q_vec array<float>")
    exact = [r.vec_id for r in brute_force_topk(emb, q, k=5).collect()]
    approx = [r.vec_id for r in sq8_topk(emb, q, k=5).collect()]
    assert approx[0] == exact[0] == 7          # self-match survives
    assert len(set(exact) & set(approx)) >= 3  # recall@5 >= 0.6


def test_sq8_constant_dimension(spark):
    """A dimension with hi == lo must not divide by zero."""
    from adopt_spark.functions.similarity import sq8_topk

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 3.0]), (2, [1.0, -1.0])],
        "vec_id long, embedding array<float>")
    q = spark.createDataFrame([(0, [1.0, 2.0])],
                              "q_id long, q_vec array<float>")
    rows = sq8_topk(emb, q, k=3).collect()
    assert [r.vec_id for r in rows][0] == 0
    assert all(not (r.cos != r.cos) for r in rows)  # no NaN


def test_pq_topk_recall_and_self_hit(spark):
    """Random-codebook PQ: lossy but deterministic. Pin (a) a recall
    floor vs brute force (measured 0.26 @10 on sf0.01 with the
    data-independent codebook; floor set with margin), (b) rank
    structure (exactly k rows per query, ranks 1..k), (c) run-to-run
    determinism."""
    from pyspark.sql import functions as F

    from adopt_spark.functions.similarity import brute_force_topk, pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    bf = {(r.q_id, r.vec_id) for r in brute_force_topk(emb, q, k=10).collect()}
    rows = pq_topk(emb, q, k=10).collect()
    pq = {(r.q_id, r.vec_id) for r in rows}
    assert len(bf & pq) / len(bf) >= 0.15
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())
    rows2 = pq_topk(emb, q, k=10).collect()
    assert {(r.q_id, r.vec_id, r.cos, r.rank) for r in rows} == \
           {(r.q_id, r.vec_id, r.cos, r.rank) for r in rows2}


def test_knn_graph_clusters_blobs_twin(spark):
    """Three tight blobs + one far-off singleton: the mutual 3-NN
    graph must recover exactly the blobs, and the majority label per
    cluster must match a numpy/union-find twin."""
    import numpy as np

    from adopt_spark.functions.similarity import knn_graph_clusters

    rng = np.random.default_rng(7)
    dim, per = 16, 8
    centers = rng.normal(size=(3, dim)) * 10
    vecs, labels = [], []
    for ci, c in enumerate(centers):
        for _ in range(per):
            vecs.append(c + rng.normal(size=dim) * 0.05)
            labels.append(ci)
    vecs.append(-centers[0] * 3)  # the loner
    labels.append(9)
    x = np.asarray(vecs, dtype=np.float64)

    emb = spark.createDataFrame(
        [(i, [float(v) for v in x[i]], int(labels[i]))
         for i in range(len(x))],
        "vec_id long, embedding array<float>, label int")
    out = knn_graph_clusters(spark, emb, k=3).collect()

    # twin: mutual 3-NN + union-find (float32 first, like the table)
    x32 = x.astype(np.float32).astype(np.float64)
    nrm = np.linalg.norm(x32, axis=1)
    cos = (x32 @ x32.T) / np.outer(nrm, nrm)
    np.fill_diagonal(cos, -np.inf)
    n = len(x32)
    topk = {
        i: set(sorted(range(n), key=lambda j: (-cos[i, j], j))[:3])
        for i in range(n)
    }
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in topk[i]:
            if i in topk[j]:
                parent[find(i)] = find(j)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    want = {}
    for members in comp.values():
        rep = min(members)
        labs = sorted((labels[m] for m in members))
        top = max(set(labs), key=lambda l: (labs.count(l), -l))
        want[rep] = (len(members), top, labs.count(top))
    got = {r.component: (r.size, r.top_label, r.top_label_n) for r in out}
    assert got == want
    # structure: no cluster mixes blobs (majority == unanimity), the
    # loner is a singleton with its own label, and the three largest
    # clusters are one per blob
    assert all(s == tn for s, _, tn in got.values())
    assert got[len(x) - 1] == (1, 9, 1)
    big = sorted(got.values(), reverse=True)[:3]
    assert [lab for _, lab, _ in sorted(big, key=lambda t: t[1])] == [0, 1, 2]
    assert all(s >= 7 for s, _, _ in big)


def test_knn_graph_clusters_empty_and_union_mode(spark):
    from adopt_spark.functions.similarity import knn_graph_clusters

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int")
    assert knn_graph_clusters(spark, empty, k=3).count() == 0

    # two mutually-nearest pairs; union (non-mutual) mode must give
    # the same answer here since all edges are reciprocal
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.99, 0.1], 0),
         (2, [0.0, 1.0], 1), (3, [0.1, 0.99], 1)],
        "vec_id long, embedding array<float>, label int")
    a = {(r.component, r.size) for r in
         knn_graph_clusters(spark, emb, k=1, mutual=True).collect()}
    b = {(r.component, r.size) for r in
         knn_graph_clusters(spark, emb, k=1, mutual=False).collect()}
    assert a == b == {(0, 2), (2, 2)}


def test_ivfpq_full_probe_equals_pq(spark):
    """With every cell probed the coarse stage prunes nothing, so
    IVF-PQ must be bit-identical to plain PQ (same codebook, same
    rounding, same tie order) — the property the contract oracle
    relies on (s_knn_ivfpq reuses the PQ SQL)."""
    from pyspark.sql import functions as F

    from adopt_spark.functions.similarity import ivfpq_topk, pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    pq = {(r.q_id, r.vec_id, r.cos, r.rank)
          for r in pq_topk(emb, q, k=5).collect()}
    ivfpq = {(r.q_id, r.vec_id, r.cos, r.rank)
             for r in ivfpq_topk(emb, q, k=5, n_centroids=4,
                                 n_probe=4).collect()}
    assert ivfpq == pq


def test_ivfpq_partial_probe_candidates_and_recall(spark):
    """Partial probe: every returned candidate must come from a probed
    cell (the pruning invariant), and recall vs plain PQ (the same
    scorer without pruning) must clear a measured floor."""
    from pyspark.sql import functions as F

    from adopt_spark.functions.similarity import (
        _assign_cells, _spherical_kmeans, ivfpq_topk, pq_topk,
    )
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    got = ivfpq_topk(emb, q, k=10, n_centroids=8, n_probe=4,
                     seed=42).collect()

    # recompute the coarse assignment exactly as ivfpq_topk does
    sample = (emb.select(F.col("embedding"),
                         F.xxhash64(F.col("vec_id")).alias("_h"))
              .orderBy("_h").limit(4096).select("embedding").toPandas())
    cents = _spherical_kmeans(
        np.array(sample["embedding"].tolist(), dtype=np.float64), 8, 42)
    e_cell = {r.vec_id: r.cid for r in _assign_cells(
        emb.select("vec_id", "embedding"), "embedding", cents, 1).collect()}
    q_cells = {}
    for r in _assign_cells(q, "q_vec", cents, 4).collect():
        q_cells.setdefault(r.q_id, set()).add(r.cid)
    assert got, "partial probe returned nothing"
    for r in got:
        assert e_cell[r.vec_id] in q_cells[r.q_id]

    pq = {(r.q_id, r.vec_id) for r in pq_topk(emb, q, k=10).collect()}
    hit = {(r.q_id, r.vec_id) for r in got}
    assert len(pq & hit) / len(pq) >= 0.3  # measured ~0.5+; floor w/ margin


def test_ivfpq_empty_and_ragged(spark):
    from adopt_spark.functions.similarity import ivfpq_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    q = spark.createDataFrame([(0, [0.1] * 64)], "q_id long, q_vec array<float>")
    assert ivfpq_topk(empty, q, k=3).count() == 0
    bad = spark.createDataFrame([(0, [0.1] * 64), (1, [0.1] * 32)],
                                "vec_id long, embedding array<float>")
    import pytest as _pytest
    with _pytest.raises(Exception, match="ragged|dimension"):
        ivfpq_topk(bad, q, k=3).count()


def test_maxsim_vs_numpy(spark):
    """MaxSim late interaction vs a numpy reference (sum-order ulps
    tolerated at 2e-6 on the 6dp lattice); structure exact: ranks,
    ids, and the self-match always ranking first."""
    import numpy as np
    from pyspark.sql import functions as F

    from adopt_spark.functions.similarity import maxsim_topk

    rng = np.random.default_rng(17)
    V = rng.standard_normal((50, 64)).astype(np.float64)
    rows = [(i, [float(x) for x in V[i]]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    got = maxsim_topk(emb, q, k=5).collect()

    def score(qv, dv):
        qs, ds = qv.reshape(8, 8), dv.reshape(8, 8)
        cos = (qs @ ds.T) / (
            np.linalg.norm(qs, axis=1)[:, None]
            * np.linalg.norm(ds, axis=1)[None, :])
        return float(cos.max(axis=1).sum())

    for qi in range(4):
        want = sorted(((score(V[qi], V[d]), d) for d in range(50)),
                      key=lambda t: (-t[0], t[1]))[:5]
        mine = sorted([r for r in got if r.q_id == qi],
                      key=lambda r: r.rank)
        assert [r.vec_id for r in mine] == [d for _, d in want]
        for r, (s, _) in zip(mine, want):
            assert abs(r.score - s) < 2e-6
        # a vector's best match under MaxSim is itself (all cos = 1)
        assert mine[0].vec_id == qi and abs(mine[0].score - 8.0) < 1e-9


def test_maxsim_partial_match_beats_pooled(spark):
    """The aspect-match property: a doc matching ONE query sub-vector
    perfectly and orthogonal elsewhere must outscore a doc that is
    uniformly mediocre — the case single pooled cosine gets wrong."""
    import numpy as np
    from pyspark.sql import functions as F

    from adopt_spark.functions.similarity import maxsim_topk

    q = np.zeros(64); q[0:8] = 1.0  # one active "token"
    exact = np.zeros(64); exact[0:8] = 1.0     # matches that token
    # alternating signs: orthogonal to the all-ones query token in
    # EVERY sub-vector (a uniform constant would be parallel, cos=1)
    mediocre = np.tile([0.1, -0.1], 32)
    emb = spark.createDataFrame(
        [(0, [float(x) for x in exact]),
         (1, [float(x) for x in mediocre])],
        "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(
        [(9, [float(x) for x in q])], "q_id long, q_vec array<double>")
    rows = {r.vec_id: r for r in maxsim_topk(emb, qdf, k=2).collect()}
    assert rows[0].rank == 1 and rows[0].score > rows[1].score


def test_retrieval_eval_laws(spark):
    """NDCG/MRR on crafted rankings: perfect ANN -> ndcg=1, rr=1;
    the DCG arithmetic replayed in python."""
    import math
    from unittest import mock

    from adopt_spark.queries import registry as R

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with mock.patch.object(R, "_t", lambda s_, sf, name: emb):
        rows = {r.q_id: r for r in
                R.q_retrieval_eval(spark, "x").collect()}
    assert set(rows) == {0, 1, 2}
    idcg = sum(1 / math.log2(i + 1) for i in range(1, 6))
    for r in rows.values():
        assert 0 <= r.ndcg <= 1 and 0 <= r.rr <= 1
        assert r.n_hits <= 5
        # a query whose LSH list contains all 5 exact items in exact
        # order would read exactly 1.0; all-hit queries bound below
        if r.n_hits == 5 and r.rr == 1.0:
            assert r.ndcg <= 1.0
        # zero hits forces both metrics to zero
        if r.n_hits == 0:
            assert r.ndcg == 0.0 and r.rr == 0.0
    # at least the self-match (q_id == vec_id, cosine 1) must be
    # found by LSH (identical signatures), so rr == 1 everywhere
    assert all(r.rr == 1.0 for r in rows.values())
    assert all(r.ndcg >= round(1 / idcg, 6) for r in rows.values())


def test_knn_auto_dispatch_boundary(spark):
    """Below the crossover auto == brute force exactly; the dispatch
    threshold itself is exercised by monkeypatching it to 0 (forcing
    the IVF branch) and checking full-probe IVF agreement."""
    from unittest import mock

    import adopt_spark.functions.similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    from pyspark.sql import functions as F

    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    bf = {(r.q_id, r.vec_id, r.rank)
          for r in S.brute_force_topk(emb, qs, k=5).collect()}
    auto = {(r.q_id, r.vec_id, r.rank)
            for r in S.knn_topk_auto(emb, qs, k=5).collect()}
    assert auto == bf
    n_cells = 8
    with mock.patch.object(S, "KNN_AUTO_BRUTE_MAX", 0):
        ivf = {(r.q_id, r.vec_id, r.rank)
               for r in S.knn_topk_auto(emb, qs, k=5,
                                        n_centroids=n_cells,
                                        n_probe=n_cells).collect()}
    assert ivf == bf          # full probe is exact
