"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute_force_topk — exact cosine top-k. The dot product is a pure
    Column expression (F.zip_with + F.aggregate — JVM-side, codegen),
    top-k per query via max_by-free window row_number. O(Q·N) pairs:
    correct baseline and the verifier for the approximate path.
  * lsh_topk — random-hyperplane LSH: sign-bit signature per vector,
    candidates = same bucket (multi-probe over all bands), exact
    cosine re-rank inside buckets. The scale path: pair count drops
    from N² to Σ bucket².

  * ivf_topk — inverted-file (IVF) index: deterministic spherical
    k-means centroids fitted on a driver-side sample, every corpus
    vector assigned to its nearest centroid (one Arrow-batched matmul),
    queries probe their n_probe nearest cells, exact cosine re-rank
    inside probed cells. The classic ANN scale path: pair count drops
    from Q·N to Q·N·(n_probe/n_centroids) with recall controlled by
    n_probe (n_probe = n_centroids degenerates to exact brute force).

Hyperplanes/centroids come from a seeded numpy Generator and are
deterministic at any parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _norm_col(vec: str):
    return F.sqrt(F.aggregate(F.col(vec), F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact cosine top-k: [q_id, vec_id, cos] with rank ≤ k per query.

    Broadcast the query side (queries ≪ corpus in the retrieval
    pattern); corpus side streams — no shuffle until the final
    per-query top-k aggregation.
    """
    e = embeddings.select(F.col(id_col), F.col(vec_col),
                          _norm_col(vec_col).alias("_n1"))
    q = queries.select(F.col(q_id_col), F.col(q_vec_col),
                       _norm_col(q_vec_col).alias("_n2"))
    pairs = e.crossJoin(F.broadcast(q))
    cos = (_dot(F.col(vec_col), F.col(q_vec_col))
           / (F.col("_n1") * F.col("_n2"))).alias("cos")
    scored = pairs.select(q_id_col, id_col, cos).where(~F.isnan("cos"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id_col, id_col, "cos", "rank"))


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_signature(df: DataFrame, vec_col: str, planes: np.ndarray,
                  out: str = "sig") -> DataFrame:
    """Sign-bit signature as a long (bits ≤ 63), pure Column math.

    bit_i = 1 if <v, h_i> > 0; the dot products are F.aggregate
    expressions over literal hyperplane arrays — JVM-side, no UDF.
    """
    bits = []
    for i, h in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in h])
        d = _dot(F.col(vec_col), lit)
        bits.append(F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return df.withColumn(out, sig.cast("long"))


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             bits: int = 12, bands: int = 3, seed: int = 42,
             dim: int | None = None) -> DataFrame:
    """Approximate cosine top-k via banded hyperplane LSH.

    ``bits`` hyperplanes split into ``bands`` bands; candidate =
    same band value in any band (union). Exact cosine re-rank within
    candidates. Recall grows with bands; cost with 2^(bits/bands).
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    per_band = bits // bands

    e = lsh_signature(
        embeddings.select(F.col(id_col), F.col(vec_col),
                          _norm_col(vec_col).alias("_n1")),
        vec_col, planes)
    q = lsh_signature(
        queries.select(F.col(q_id_col), F.col(q_vec_col),
                       _norm_col(q_vec_col).alias("_n2")),
        q_vec_col, planes)

    mask = (1 << per_band) - 1
    cand = None
    for b in range(bands):
        key = lambda c: F.shiftrightunsigned(F.col(c), b * per_band).bitwiseAND(F.lit(mask))
        le = e.withColumn("_bk", key("sig")).drop("sig")
        lq = q.withColumn("_bk", key("sig")).drop("sig")
        p = le.join(lq, "_bk").drop("_bk")
        cand = p if cand is None else cand.unionAll(p)
    cand = cand.dropDuplicates([q_id_col, id_col])
    cos = (_dot(F.col(vec_col), F.col(q_vec_col))
           / (F.col("_n1") * F.col("_n2"))).alias("cos")
    scored = cand.select(q_id_col, id_col, cos).where(~F.isnan("cos"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id_col, id_col, "cos", "rank"))


def _spherical_kmeans(x: np.ndarray, n_centroids: int, seed: int,
                      iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd iterations on unit-normalized sample rows."""
    xn = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
    rng = np.random.default_rng(seed)
    c = xn[rng.choice(len(xn), size=min(n_centroids, len(xn)), replace=False)].copy()
    for _ in range(iters):
        assign = (xn @ c.T).argmax(axis=1)
        for j in range(len(c)):
            members = xn[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c /= np.linalg.norm(c, axis=1, keepdims=True) + 1e-12
    return c


def _assign_cells(df: DataFrame, vec_col: str, centroids: np.ndarray,
                  n_probe: int) -> DataFrame:
    """Append ``cid`` (nearest-centroid id); n_probe > 1 replicates each
    row into its n_probe nearest cells. One Arrow-batched matmul per
    batch — no per-row Python."""
    n_probe = min(n_probe, len(centroids))
    schema = StructType(list(df.schema.fields)
                        + [StructField("cid", LongType())])

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            try:
                v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            except ValueError as exc:   # ragged rows outside the sample
                raise ValueError(
                    f"embedding column '{vec_col}' has ragged dimensions"
                ) from exc
            vn = v / (np.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
            sims = vn @ centroids.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            out = pdf.loc[pdf.index.repeat(n_probe)].reset_index(drop=True)
            out["cid"] = top.ravel().astype(np.int64)
            yield out

    return df.mapInPandas(kernel, schema=schema)


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
             sample_size: int = 4096) -> DataFrame:
    """Approximate cosine top-k via an IVF index; [q_id, vec_id, cos, rank].

    Centroids: spherical k-means on a deterministic hash-ranked sample
    of the corpus (top-``sample_size`` rows by xxhash64(id) — Spark
    plans TakeOrderedAndProject: per-partition top-k + driver merge,
    NO full global sort; deterministic at any parallelism and
    unbiased w.r.t. id assignment order). Corpus vectors land in
    exactly one cell; queries fan out to ``n_probe`` cells; the
    cell-key equi-join replaces the brute-force cross join, then exact
    cosine re-ranks inside probed cells. At 100 TB the corpus side is
    written bucketed by ``cid`` once and every query batch joins
    shuffle-free against its probed buckets.

    Degenerate inputs: an empty corpus (or empty query set) returns an
    empty result; ragged embedding dimensions raise ValueError.
    """
    sample = (embeddings
              .select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("_h"))
              .orderBy("_h").limit(sample_size)
              .select(vec_col).toPandas())
    if len(sample) == 0:
        return (queries.select(q_id_col).limit(0)
                .crossJoin(embeddings.select(id_col).limit(0))
                .withColumn("cos", F.lit(0.0))
                .withColumn("rank", F.lit(1).cast("integer")))
    try:
        x = np.array(sample[vec_col].tolist(), dtype=np.float64)
    except ValueError as exc:
        raise ValueError(
            "ivf_topk: embedding column has ragged dimensions") from exc
    if x.ndim != 2:
        raise ValueError("ivf_topk: embedding column has ragged dimensions")
    centroids = _spherical_kmeans(x, n_centroids, seed)

    e = _assign_cells(
        embeddings.select(F.col(id_col), F.col(vec_col),
                          _norm_col(vec_col).alias("_n1")),
        vec_col, centroids, n_probe=1)
    q = _assign_cells(
        queries.select(F.col(q_id_col), F.col(q_vec_col),
                       _norm_col(q_vec_col).alias("_n2")),
        q_vec_col, centroids, n_probe=n_probe)

    cand = e.join(q, "cid").drop("cid")
    cos = (_dot(F.col(vec_col), F.col(q_vec_col))
           / (F.col("_n1") * F.col("_n2"))).alias("cos")
    scored = cand.select(q_id_col, id_col, cos).where(~F.isnan("cos"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id_col, id_col, "cos", "rank"))


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       bits: int = 12, bands: int = 4, seed: int = 42) -> DataFrame:
    """Cosine-threshold near-dup pairs via the same banded LSH.

    Returns [a, b, cos] with cos ≥ threshold, a < b. Approximate
    (LSH recall), exact within retrieved candidates.
    """
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    per_band = bits // bands
    e = lsh_signature(
        embeddings.select(F.col(id_col), F.col(vec_col),
                          _norm_col(vec_col).alias("_n")),
        vec_col, planes)
    mask = (1 << per_band) - 1
    cand = None
    for b in range(bands):
        key = F.shiftrightunsigned(F.col("sig"), b * per_band).bitwiseAND(F.lit(mask))
        side = e.withColumn("_bk", key)
        l = side.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                        F.col("_n").alias("na"), "_bk")
        r = side.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                        F.col("_n").alias("nb"), "_bk")
        p = l.join(r, "_bk").where(F.col("a") < F.col("b")).drop("_bk")
        cand = p if cand is None else cand.unionAll(p)
    cand = cand.dropDuplicates(["a", "b"])
    cos = (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos")
    return cand.select("a", "b", cos).where(F.col("cos") >= threshold)


def knn_graph_clusters(spark, embeddings: DataFrame, k: int = 3,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       label_col: str = "label",
                       mutual: bool = True) -> DataFrame:
    """Embedding clustering: exact-cosine (mutual) kNN graph →
    connected components → per-cluster majority-label report.

    Pipeline (all deterministic, parallelism-independent):
      1. directed kNN edges: for every vector its top-k neighbors by
         cosine (self excluded BEFORE ranking; ties broken by
         neighbor id asc),
      2. ``mutual=True`` keeps an edge only when BOTH endpoints list
         each other (the standard mutual-kNN sparsifier — fragments
         hub-dominated graphs into real clusters); otherwise the
         union of directions is kept,
      3. hash-min connected components (algos/cc.py large/small-star,
         O(log n) rounds); vectors with no surviving edge become
         singleton clusters,
      4. per component: size, majority label (ties → smallest label),
         and the majority count.

    Returns [component, size, top_label, top_label_n]; ``component``
    is the minimum vec_id of the cluster.

    Scale: step 1 here scores corpus × corpus with the query side
    broadcast — correct for the ≤ broadcast-threshold fixture; at
    corpus scale swap the candidate generator for the banded-LSH join
    (``embedding_near_dup``) or IVF cells (``ivf_topk``) — steps 2-4
    are unchanged and shuffle only id pairs, never vectors.
    """
    from adopt_spark.algos.cc import connected_components

    e = embeddings.select(F.col(id_col), F.col(vec_col),
                          _norm_col(vec_col).alias("_n1"))
    q = embeddings.select(F.col(id_col).alias("_qid"),
                          F.col(vec_col).alias("_qvec"),
                          _norm_col(vec_col).alias("_n2"))
    pairs = (e.crossJoin(F.broadcast(q))
             .where(F.col("_qid") != F.col(id_col)))
    cos = (_dot(F.col(vec_col), F.col("_qvec"))
           / (F.col("_n1") * F.col("_n2"))).alias("_cos")
    scored = pairs.select("_qid", id_col, cos).where(~F.isnan("_cos"))
    w = Window.partitionBy("_qid").orderBy(F.desc("_cos"), F.asc(id_col))
    knn = (scored.withColumn("_rnk", F.row_number().over(w))
           .where(F.col("_rnk") <= k).select("_qid", id_col))
    if mutual:
        rev = knn.select(F.col(id_col).alias("_qid"),
                         F.col("_qid").alias(id_col))
        knn = knn.join(rev, ["_qid", id_col], "left_semi")
    edges = knn.select(
        F.least(F.col("_qid"), F.col(id_col)).alias("sid"),
        F.greatest(F.col("_qid"), F.col(id_col)).alias("tid")).distinct()
    comp, _ = connected_components(spark, edges)
    singles = (embeddings.select(F.col(id_col).alias("v"))
               .join(comp.select("v"), "v", "left_anti")
               .select("v", F.col("v").alias("component")))
    labels = comp.unionByName(singles)
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    lab = labels.join(
        embeddings.select(F.col(id_col).alias("v"),
                          F.col(label_col).alias("_lab")), "v")
    counts = lab.groupBy("component", "_lab").agg(
        F.count(F.lit(1)).alias("_n"))
    wl = Window.partitionBy("component").orderBy(
        F.desc("_n"), F.asc("_lab"))
    top = (counts.withColumn("_r", F.row_number().over(wl))
           .where(F.col("_r") == 1)
           .select("component", F.col("_lab").alias("top_label"),
                   F.col("_n").alias("top_label_n")))
    return sizes.join(top, "component").select(
        "component", "size", "top_label", "top_label_n")


def group_centroids(df: DataFrame, group_col: str,
                    vec_col: str = "embedding") -> DataFrame:
    """Element-wise mean vector per group, in LONG form ->
    (``group_col``, pos, centroid) with pos 0-based and the mean at
    6 dp (double accumulation; the quantization absorbs sum-order
    last-ulp differences between engines).

    Scale shape: one posexplode (rows x dim, a narrow map) + one hash
    aggregate keyed by (group, pos) with map-side partial agg — the
    standard distributed dense-centroid plan (what a k-means superstep
    or a per-language embedding profile runs). Long form keeps the
    result join-/oracle-friendly; re-assembling an array column is a
    sort_array(collect_list(struct(pos, val))) away when needed.
    """
    ex = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("pos", "val"))
    return (ex.groupBy(group_col, "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6)
                 .alias("centroid"))
            .select(group_col, F.col("pos").cast("int").alias("pos"),
                    "centroid"))


def centroid_similarity(df: DataFrame, group_col: str,
                        vec_col: str = "embedding") -> DataFrame:
    """Cosine similarity between every pair of group centroids ->
    (a, b, cosine) for a < b, 6 dp — the cluster-separation report an
    embedding pipeline logs after computing per-group centroids.

    Runs on the LONG-form output of ``group_centroids`` (6 dp-quantized
    means, so both engines dot IDENTICAL doubles): one self-equi-join
    on the dimension index + a pair-keyed sum aggregate + one norm
    join. Pair count is n_groups^2/2 — a GROUP-level (tiny) frame, not
    row-level; the heavy lifting stays in the centroid aggregation.
    """
    c = group_centroids(df, group_col, vec_col) \
        .select(F.col(group_col).alias("g"), "pos", "centroid")
    dots = (c.alias("x").join(c.alias("y"), "pos")
            .where(F.col("x.g") < F.col("y.g"))
            .groupBy(F.col("x.g").alias("a"), F.col("y.g").alias("b"))
            .agg(F.sum(F.col("x.centroid") * F.col("y.centroid"))
                 .alias("dot")))
    norms = (c.groupBy("g")
             .agg(F.sqrt(F.sum(F.col("centroid") * F.col("centroid")))
                  .alias("nrm")))
    return (dots
            .join(norms.select(F.col("g").alias("a"),
                               F.col("nrm").alias("na")), "a")
            .join(norms.select(F.col("g").alias("b"),
                               F.col("nrm").alias("nb")), "b")
            .select("a", "b",
                    F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                     .alias("cosine")))


def sq8_quantize_stats(embeddings: DataFrame,
                       vec_col: str = "embedding") -> list[tuple[float, float]]:
    """Per-dimension (lo, hi) corpus ranges for scalar quantization —
    one posexplode + min/max hash aggregate; the result is
    dimension-sized (tiny) and is the only driver-resident state."""
    stats = (embeddings
             .select(F.posexplode(vec_col).alias("i", "x"))
             .groupBy("i")
             .agg(F.min(F.col("x").cast("double")).alias("lo"),
                  F.max(F.col("x").cast("double")).alias("hi"))
             .orderBy("i")
             .collect())
    return [(float(r.lo), float(r.hi)) for r in stats]


def _sq8_dequantized(vec_col, lo_arr, hi_arr):
    """codes = clamp(floor((x-lo)/(hi-lo)*255 + 0.5), 0..255), then
    dequantize back to lo + code/255*(hi-lo) — one JVM-side transform,
    exact IEEE-reproducible arithmetic (no Python, no randomness)."""
    def dq(x, i):
        lo = F.element_at(lo_arr, i + 1)
        hi = F.element_at(hi_arr, i + 1)
        code = F.when(hi > lo, F.greatest(
            F.lit(0.0), F.least(F.lit(255.0), F.floor(
                (x.cast("double") - lo) / (hi - lo) * 255.0 + 0.5)
                .cast("double")))).otherwise(F.lit(0.0))
        return lo + code / 255.0 * (hi - lo)
    return F.transform(F.col(vec_col), dq)


def sq8_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             stats: list[tuple[float, float]] | None = None) -> DataFrame:
    """Scalar-quantized (int8) cosine top-k -> [q_id, vec_id, cos,
    rank]: the corpus side is compressed to one byte per dimension
    (4x smaller scans / cache footprint — the standard first rung of
    ANN compression), queries stay exact, scores are computed against
    the DEQUANTIZED corpus vectors (asymmetric distance computation).

    Plan shape = brute_force_topk (broadcast queries, corpus streams,
    one per-query top-k window); the quantizer adds one per-dimension
    min/max aggregate up front. Ranking uses the 6 dp-quantized score
    (ties broken by vec_id) so results are engine- and
    order-independent. At 100 TB the codes column is what you PERSIST
    (byte array + the dim-sized stats table); this operator computes
    it inline to stay self-contained.
    """
    if stats is None:
        stats = sq8_quantize_stats(embeddings, vec_col)
    lo_arr = F.array(*[F.lit(lo) for lo, _ in stats])
    hi_arr = F.array(*[F.lit(hi) for _, hi in stats])

    e = embeddings.select(
        F.col(id_col),
        _sq8_dequantized(vec_col, lo_arr, hi_arr).alias("_dq"))
    e = e.select(id_col, "_dq",
                 F.sqrt(F.aggregate("_dq", F.lit(0.0),
                                    lambda a, x: a + x * x)).alias("_n1"))
    q = queries.select(F.col(q_id_col), F.col(q_vec_col),
                       _norm_col(q_vec_col).alias("_n2"))
    pairs = e.crossJoin(F.broadcast(q))
    cos = (_dot_raw(F.col("_dq"), F.col(q_vec_col))
           / (F.col("_n1") * F.col("_n2")))
    scored = (pairs.select(q_id_col, id_col,
                           F.round(cos, 6).alias("cos"))
              .where(~F.isnan("cos")))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id_col, id_col, "cos", "rank"))


def _dot_raw(a, b):
    """Dot product where ``a`` is already double (dequantized) and
    ``b`` may be float — cast only b."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


# ---------------------------------------------------- product quantization

PQ_M, PQ_K, PQ_SEED, PQ_SCALE = 8, 16, 2024, 0.15


def pq_codebook(dim: int, m: int = PQ_M, k: int = PQ_K,
                seed: int = PQ_SEED) -> np.ndarray:
    """Deterministic (m, k, dim//m) codebook from a seeded Generator,
    scaled to the corpus' typical coordinate spread. Data-independent
    on purpose: like the LSH hyperplanes it lets the DuckDB oracle
    replicate the codes bit-for-bit from embedded float literals
    (a k-means-trained codebook would tie the static oracle SQL to
    one dataset). Recall is below trained-PQ but the entire encode /
    ADC machinery is identical; swap in trained centroids in
    production."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, k, dim // m)) * PQ_SCALE


def pq_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            q_id_col: str = "q_id", q_vec_col: str = "q_vec",
            m_sub: int = PQ_M, k_cent: int = PQ_K) -> DataFrame:
    """Product-quantized cosine top-k -> [q_id, vec_id, cos, rank]
    via asymmetric distance computation (ADC).

    Encode: each corpus vector splits into ``m_sub`` subvectors; each
    subvector maps to its nearest codebook centroid (argmin of exact
    L2², ties to the smaller centroid id) — the persisted form is
    m_sub 4-bit/8-bit codes per vector, a 32-64x compression of a
    float corpus, the standard billion-scale ANN layout (IVF-PQ's
    second stage). Score: queries stay exact; dot(q, reconstruction)
    and |reconstruction|² decompose over subspaces, so the plan never
    materializes reconstructed vectors — per-subspace partial
    products aggregate in one (q_id, vec_id) hash agg, the ADC
    lookup-table trick expressed relationally.

    Plan shape: posexplode to (vec_id, subspace) rows; one broadcast
    join against the (m·k)-row codebook; one min_by argmin per
    (vec_id, subspace); one broadcast join against exploded queries;
    one hash agg per pair; one per-query top-k window. All JVM-side
    Column arithmetic — the codebook is the only driver-resident
    state. Ranking uses the 6 dp-quantized score (ties by vec_id).
    """
    first = embeddings.select(vec_col).head()
    if first is None:
        return embeddings.sparkSession.createDataFrame(
            [], f"{q_id_col} long, {id_col} long, cos double, rank int")
    dim = len(first[0])
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d_sub = dim // m_sub
    cb = pq_codebook(dim, m_sub, k_cent)
    spark = embeddings.sparkSession
    cb_rows = [(mi, ki, [float(x) for x in cb[mi, ki]])
               for mi in range(m_sub) for ki in range(k_cent)]
    cb_df = spark.createDataFrame(
        cb_rows, "m int, j int, cent array<double>")

    def subspaces(col_name):
        vd = F.transform(F.col(col_name), lambda x: x.cast("double"))
        return F.posexplode(F.array(
            *[F.slice(vd, mi * d_sub + 1, d_sub) for mi in range(m_sub)]))

    # encode: nearest centroid per (vector, subspace)
    sub = embeddings.select(F.col(id_col),
                            subspaces(vec_col).alias("m", "sv"))
    dist2 = (_dot_raw(F.col("sv"), F.col("sv"))
             - F.lit(2.0) * _dot_raw(F.col("sv"), F.col("cent"))
             + _dot_raw(F.col("cent"), F.col("cent")))
    enc = (sub.join(F.broadcast(cb_df), "m")
           .groupBy(id_col, "m")
           .agg(F.min_by(F.col("cent"), F.struct(dist2.alias("d"),
                                                 F.col("j"))).alias("cent"))
           .withColumn("c2", _dot_raw(F.col("cent"), F.col("cent"))))

    qn = queries.select(F.col(q_id_col), _norm_col(q_vec_col).alias("_n2"))
    qsub = queries.select(F.col(q_id_col),
                          subspaces(q_vec_col).alias("m", "qsv"))
    pairs = (enc.join(F.broadcast(qsub), "m")
             .groupBy(q_id_col, id_col)
             .agg(F.sum(_dot_raw(F.col("qsv"), F.col("cent"))).alias("dot"),
                  F.sqrt(F.sum("c2")).alias("_n1")))
    scored = (pairs.join(F.broadcast(qn), q_id_col)
              .select(q_id_col, id_col,
                      F.round(F.col("dot") / (F.col("_n1") * F.col("_n2")),
                              6).alias("cos"))
              .where(~F.isnan("cos")))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id_col, id_col, "cos", "rank"))


def ivfpq_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               q_id_col: str = "q_id", q_vec_col: str = "q_vec",
               n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
               sample_size: int = 4096,
               m_sub: int = PQ_M, k_cent: int = PQ_K) -> DataFrame:
    """IVF-PQ: coarse cells prune candidates, PQ/ADC scores them —
    the standard billion-scale ANN composition (FAISS IndexIVFPQ).

    Stage 1 (coarse): spherical-k-means centroids on a hash-ranked
    driver sample (identical to ``ivf_topk``); corpus rows land in one
    cell each, queries fan out to ``n_probe`` cells, and the cell-key
    equi-join yields the candidate (q_id, vec_id) set — never a cross
    join. Stage 2 (fine): the corpus is PQ-encoded ONCE (same
    deterministic codebook as ``pq_topk``, so at full probe the result
    is bit-identical to ``pq_topk`` and the static PQ oracle pins the
    whole composition); ADC partial products are aggregated only for
    candidate pairs.

    Scale shape: encode is one pass over the corpus (the persisted
    form is m_sub codes/vector, 32-64x compression); scoring joins
    candidates (cell-bounded) against the encoded corpus on vec_id
    and broadcasts the exploded queries — per-query cost is
    |probed cells| x cell size, not corpus size.
    """
    first = embeddings.select(vec_col).head()
    if first is None:
        return embeddings.sparkSession.createDataFrame(
            [], f"{q_id_col} long, {id_col} long, cos double, rank int")
    dim = len(first[0])
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d_sub = dim // m_sub

    # ---- coarse quantizer (shared construction with ivf_topk)
    sample = (embeddings
              .select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("_h"))
              .orderBy("_h").limit(sample_size)
              .select(vec_col).toPandas())
    try:
        x = np.array(sample[vec_col].tolist(), dtype=np.float64)
    except ValueError as exc:
        raise ValueError(
            "ivfpq_topk: embedding column has ragged dimensions") from exc
    if x.ndim != 2:
        raise ValueError("ivfpq_topk: embedding column has ragged dimensions")
    centroids = _spherical_kmeans(x, n_centroids, seed)
    e_cells = _assign_cells(embeddings.select(id_col, vec_col), vec_col,
                            centroids, n_probe=1).select(id_col, "cid")
    q_cells = _assign_cells(queries.select(q_id_col, q_vec_col), q_vec_col,
                            centroids, n_probe=n_probe).select(q_id_col, "cid")
    # corpus rows sit in exactly one cell, so a candidate pair appears
    # at most once — no dedup needed
    cand = e_cells.join(q_cells, "cid").select(q_id_col, id_col)

    # ---- PQ encode (identical to pq_topk) + ADC over candidates only
    cb = pq_codebook(dim, m_sub, k_cent)
    spark = embeddings.sparkSession
    cb_df = spark.createDataFrame(
        [(mi, ki, [float(v) for v in cb[mi, ki]])
         for mi in range(m_sub) for ki in range(k_cent)],
        "m int, j int, cent array<double>")

    def subspaces(col_name):
        vd = F.transform(F.col(col_name), lambda v: v.cast("double"))
        return F.posexplode(F.array(
            *[F.slice(vd, mi * d_sub + 1, d_sub) for mi in range(m_sub)]))

    sub = embeddings.select(F.col(id_col), subspaces(vec_col).alias("m", "sv"))
    dist2 = (_dot_raw(F.col("sv"), F.col("sv"))
             - F.lit(2.0) * _dot_raw(F.col("sv"), F.col("cent"))
             + _dot_raw(F.col("cent"), F.col("cent")))
    enc = (sub.join(F.broadcast(cb_df), "m")
           .groupBy(id_col, "m")
           .agg(F.min_by(F.col("cent"), F.struct(dist2.alias("d"),
                                                 F.col("j"))).alias("cent"))
           .withColumn("c2", _dot_raw(F.col("cent"), F.col("cent"))))

    qn = queries.select(F.col(q_id_col), _norm_col(q_vec_col).alias("_n2"))
    qsub = queries.select(F.col(q_id_col),
                          subspaces(q_vec_col).alias("m", "qsv"))
    pairs = (cand.join(enc, id_col)
             .join(F.broadcast(qsub), [q_id_col, "m"])
             .groupBy(q_id_col, id_col)
             .agg(F.sum(_dot_raw(F.col("qsv"), F.col("cent"))).alias("dot"),
                  F.sqrt(F.sum("c2")).alias("_n1")))
    scored = (pairs.join(F.broadcast(qn), q_id_col)
              .select(q_id_col, id_col,
                      F.round(F.col("dot") / (F.col("_n1") * F.col("_n2")),
                              6).alias("cos"))
              .where(~F.isnan("cos")))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id_col, id_col, "cos", "rank"))


def maxsim_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                n_sub: int = 8,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "q_vec"
                ) -> DataFrame:
    """ColBERT-style late-interaction retrieval (MaxSim): each vector
    is treated as ``n_sub`` contiguous sub-vectors ("token
    embeddings"); score(q, d) = sum over query tokens of the MAX
    cosine against any document token. Captures partial/aspect matches
    a single pooled cosine dilutes.

    Plan shape: broadcast the (small) query side against the streaming
    corpus — identical to brute_force_topk — with the whole
    sum-of-max-of-cosines computed as ONE nested higher-order-function
    Column (sequence/slice/zip_with/aggregate/array_max), entirely in
    the JVM; the only shuffle is the final per-query top-k window. At
    100-TB corpus scale the candidate stage swaps for the LSH/IVF
    generators, re-ranked with this exact expression.
    """
    dim_probe = embeddings.select(
        F.size(vec_col).alias("d")).limit(1).collect()
    if not dim_probe:
        return embeddings.sparkSession.createDataFrame(
            [], f"{q_id_col} long, {id_col} long, score double, rank int")
    dim = int(dim_probe[0].d)
    if dim % n_sub != 0:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    w = dim // n_sub

    def sub(v, i):
        return F.slice(v, i * w + 1, w)

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    def nrm(a):
        return F.sqrt(dot(a, a))

    idx = F.sequence(F.lit(0), F.lit(n_sub - 1))
    qv, dv = F.col(q_vec_col), F.col(vec_col)

    def tok_cos(i, j):
        # zero-norm tokens (padding) contribute 0, never NaN/ANSI
        # divide-by-zero
        den = nrm(sub(qv, i)) * nrm(sub(dv, j))
        return F.when(den > 0,
                      dot(sub(qv, i), sub(dv, j)) / den).otherwise(
            F.lit(0.0))

    score = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, i: acc + F.array_max(F.transform(
            idx, lambda j: tok_cos(i, j))))
    pairs = embeddings.crossJoin(F.broadcast(queries))
    scored = (pairs.select(q_id_col, id_col, score.alias("score"))
              .where(~F.isnan("score")))
    win = Window.partitionBy(q_id_col).orderBy(F.desc("score"),
                                               F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select(q_id_col, id_col, "score", "rank"))


# measured on this engine (BENCH/ann_scale.json): brute-force beats
# IVF below ~1e5 vectors — centroid fit + assignment don't pay for
# themselves until the scan they avoid is big enough
KNN_AUTO_BRUTE_MAX = 100_000


def knn_topk_auto(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                  **kwargs) -> DataFrame:
    """Adaptive kNN dispatch — the vector-family twin of
    triangle_count('auto'): measure the corpus size, run the
    broadcast brute-force dot product below KNN_AUTO_BRUTE_MAX
    vectors (the measured crossover, BENCH/ann_scale.json), else IVF
    with cell pruning. Both strategies return the same schema; below
    the bound the answer is exact by construction, above it IVF's
    probe width is the recall/cost dial (s_ann_recall measures it).
    """
    n = embeddings.count()
    if n <= KNN_AUTO_BRUTE_MAX:
        return brute_force_topk(embeddings, queries, k=k, **kwargs)
    return ivf_topk(embeddings, queries, k=k, **kwargs)
