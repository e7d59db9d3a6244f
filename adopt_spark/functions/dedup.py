"""Deduplication suite for a large-scale training-data pipeline.

Five strategies, scale-ordered:

  * exact_dedup          — hash-groupBy on sha256(text); one shuffle.
  * minhash_lsh_pairs    — shingle → k minhashes → banded LSH buckets
                           → within-bucket candidate pairs (+ exact
                           Jaccard verify). The classic near-dup path:
                           no O(n²) stage, every step a shuffle on a
                           bounded key.
  * simhash_pairs        — 64-bit simhash + Hamming-ball bucketing by
                           band masks.
  * ngram_jaccard_pairs  — exact n-gram Jaccard verification (used as
                           the verify stage of minhash and standalone
                           for small blocks).
  * embedding_near_dup   — cosine-threshold pairs over the embeddings
                           table (delegates to similarity.py).

Everything numeric is deterministic: hash functions are FNV-1a /
xxhash64 with fixed seeds, minhash permutations (aᵢx+bᵢ) mod p with a
seeded numpy Generator — identical output at any parallelism
(north-rule reproducibility).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_MERSENNE_P = (1 << 61) - 1


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per distinct text; adds group size.

    Plan: sha256 of text → groupBy hash (partial agg map-side) →
    min(id), count. Returns [doc_id, text_sha, n_copies].
    """
    h = F.sha2(F.col(text_col), 256).alias("text_sha")
    return (
        docs.select(F.col(id_col), h)
        .groupBy("text_sha")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "text_sha", "n_copies")
    )


def _minhash_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_P, size=k, dtype=np.int64)
    b = rng.integers(0, _MERSENNE_P, size=k, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Character n-gram values over rolling byte windows, unique.

    For n ≤ 8 the window's bytes are packed directly into a uint64
    (exact, collision-free, pure vectorized numpy); larger n falls
    back to a wraparound polynomial hash. Both deterministic.
    """
    s = " ".join(text.split()).lower()
    if len(s) < n:
        s = s.ljust(n)
    arr = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(arr) < n:
        return np.zeros(1, dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(arr, n).astype(np.uint64)
    if n <= 8:
        weights = (np.uint64(256) ** np.arange(n - 1, -1, -1, dtype=np.uint64))
    else:
        weights = np.power(np.uint64(257), np.arange(n, dtype=np.uint64))  # wraps mod 2^64
    vals = (windows * weights).sum(axis=1, dtype=np.uint64)
    return np.unique(vals).astype(np.int64)


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       shingle: int = 5, seed: int = 42) -> DataFrame:
    """[id, sig: array<long>] — k minhashes per doc, Arrow-batched."""
    a, b = _minhash_params(num_hashes, seed)

    a_u = a.astype(np.uint64) | np.uint64(1)      # odd multipliers
    b_u = b.astype(np.uint64)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = []
            for t in pdf[text_col].fillna(""):
                sh = _shingle_hashes(t, shingle).astype(np.uint64)
                # multiply-add mod 2^64 (wraparound), rowwise min -> k-vector
                vals = a_u[:, None] * sh[None, :] + b_u[:, None]
                sigs.append(vals.min(axis=1).astype(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, sig array<long>"
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        bands: int = 8) -> DataFrame:
    """Banded LSH: docs sharing any band hash become a candidate pair.

    Band key = xxhash64 of the band's slice → groupBy-free self-join on
    the band key; pairs deduped with a < b. Skew note: a band bucket
    containing B docs yields B² pairs — degenerate buckets (all-equal
    texts) are exactly the true-duplicate clusters, so the quadratic
    term is output-bound, not skew.
    """
    k = len(sigs.select("sig").first()["sig"])
    rows_per_band = k // bands
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.array(*[
                F.xxhash64(
                    F.lit(i),
                    *[F.col("sig")[j] for j in range(i * rows_per_band,
                                                     (i + 1) * rows_per_band)]
                )
                for i in range(bands)
            ])
        ).alias("band", "bkey"),
    )
    l = banded.select(F.col(id_col).alias("a"), "band", "bkey")
    r = banded.select(F.col(id_col).alias("b"), "band", "bkey")
    return (
        l.join(r, ["band", "bkey"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, pairs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle: int = 5, threshold: float = 0.8) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs.

    Joins texts onto pairs (two shuffles on doc id) then computes
    |A∩B|/|A∪B| in an Arrow kernel. Returns [a, b, jaccard] ≥ threshold.
    """
    t = docs.select(F.col(id_col), F.col(text_col))
    withtext = (
        pairs.join(t.withColumnRenamed(id_col, "a").withColumnRenamed(text_col, "ta"), "a")
        .join(t.withColumnRenamed(id_col, "b").withColumnRenamed(text_col, "tb"), "b")
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            jac = np.empty(len(pdf), dtype=np.float64)
            for i, (ta, tb) in enumerate(zip(pdf["ta"], pdf["tb"])):
                sa = _shingle_hashes(ta or "", shingle)
                sb = _shingle_hashes(tb or "", shingle)
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                jac[i] = inter / union if union else 1.0
            yield pd.DataFrame({"a": pdf["a"], "b": pdf["b"], "jaccard": jac})

    out = withtext.mapInPandas(kernel, schema="a long, b long, jaccard double")
    return out.where(F.col("jaccard") >= threshold)


def minhash_near_dup_pairs(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 64,
                           bands: int = 8, shingle: int = 5,
                           threshold: float = 0.8, seed: int = 42) -> DataFrame:
    """Full near-dup pipeline: minhash → LSH buckets → exact verify."""
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle, seed)
    cand = lsh_candidate_pairs(sigs, id_col, bands)
    return ngram_jaccard_pairs(docs, cand, text_col, id_col, shingle, threshold)


def _md5_token_hashes(text: str) -> np.ndarray:
    """First 8 bytes (big-endian) of md5 per whitespace token.

    The md5 hash mode exists for ORACLE parity: DuckDB computes the
    identical token hash as ('0x' || substr(md5(t), 1, 16))::UBIGINT,
    so the full simhash (bit votes included) can be replicated in SQL
    and the emitted pair set compared exactly. The FNV mode stays the
    default fast path.
    """
    import hashlib

    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
         for t in toks), dtype=np.uint64, count=len(toks))


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", hash_mode: str = "fnv") -> DataFrame:
    """64-bit simhash per doc: weighted bit votes of per-token hashes.

    ``hash_mode``: "fnv" (default, fastest) or "md5" (shared with SQL
    engines — see _md5_token_hashes; used by the driver contract)."""
    from adopt_spark.functions.text import _token_hashes

    if hash_mode not in ("fnv", "md5"):
        raise ValueError(f"unknown hash_mode: {hash_mode}")
    token_hash = _token_hashes if hash_mode == "fnv" else _md5_token_hashes

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, t in enumerate(pdf[text_col].fillna("")):
                hs = token_hash(t)
                if hs.size == 0:
                    out[i] = 0
                    continue
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
                votes = bits.astype(np.int64).sum(axis=0) * 2 - hs.size
                word = np.uint64(0)
                for bit in np.nonzero(votes > 0)[0]:
                    word |= np.uint64(1) << np.uint64(bit)
                out[i] = int(word.astype(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, simhash long"
    )


def simhash_pairs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  hash_mode: str = "fnv") -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.

    Bucketing: split 64 bits into (max_hamming+1) bands — any pair
    within the Hamming ball shares at least one identical band
    (pigeonhole), so candidates come from equality joins on band
    values, never a cross join. The pigeonhole is COMPLETE: the
    output is exactly every pair within the ball, which is what lets
    the md5 hash mode carry an exact all-pairs SQL oracle.
    """
    sh = simhash(docs, text_col, id_col, hash_mode=hash_mode)
    nb = max_hamming + 1
    width = 64 // nb
    bandcols = [
        F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
            F.lit((1 << width) - 1)
        ).alias(f"b{i}")
        for i in range(nb)
    ]
    banded = sh.select(id_col, "simhash", *bandcols)
    pairs = None
    for i in range(nb):
        l = banded.select(F.col(id_col).alias("a"), F.col("simhash").alias("ha"),
                          F.col(f"b{i}").alias("bk"))
        r = banded.select(F.col(id_col).alias("b"), F.col("simhash").alias("hb"),
                          F.col(f"b{i}").alias("bk"))
        p = l.join(r, "bk").where(F.col("a") < F.col("b")).select("a", "b", "ha", "hb")
        pairs = p if pairs is None else pairs.unionAll(p)
    pairs = pairs.distinct()
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.where(ham <= max_hamming).select("a", "b", ham.alias("hamming"))


def near_dup_clusters(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 64,
                      bands: int = 8, shingle: int = 5,
                      threshold: float = 0.8, seed: int = 42) -> DataFrame:
    """End-to-end fuzzy dedup: near-dup pairs → connected components →
    canonical doc per cluster — the operator a 100-TB training-data
    pipeline actually runs (pair emission alone is not dedup: A~B and
    B~C must collapse to ONE keeper even when A~C is below threshold).

    Pipeline: minhash_near_dup_pairs (banded LSH + exact verify) gives
    the similarity edges; algos.cc.connected_components (large-star /
    small-star hash-min, O(log n) rounds) gives min-id cluster labels;
    docs in no pair become their own singleton cluster via a left join.
    Returns [id, cluster, is_canonical] — ``cluster`` is the minimum
    doc id of the component and keeping ``is_canonical`` rows is the
    dedup. Every stage is a bounded-key shuffle; nothing all-pairs.
    """
    from adopt_spark.algos.cc import connected_components

    pairs = minhash_near_dup_pairs(docs, text_col, id_col, num_hashes,
                                   bands, shingle, threshold, seed)
    edges = pairs.select(F.col("a").alias("sid"), F.col("b").alias("tid"))
    labels, _ = connected_components(docs.sparkSession, edges)
    out = (
        docs.select(id_col)
        .join(labels.withColumnRenamed("v", id_col), id_col, "left")
        .select(id_col,
                F.coalesce(F.col("component"), F.col(id_col)).alias("cluster"))
    )
    return out.withColumn("is_canonical", F.col(id_col) == F.col("cluster"))


def word_ngram_jaccard_all_pairs(docs: DataFrame, text_col: str = "text",
                                 id_col: str = "doc_id",
                                 n_words: int = 3) -> DataFrame:
    """Exact word-n-gram Jaccard for EVERY doc pair, pure Column ops.

    Returns [a, b, jaccard] for all id pairs a < b among docs with at
    least one shingle. Shingles are distinct word n-grams
    (whitespace-split); intersections come from a shingle equi-join +
    groupBy (the scalable shape — candidate generation never crosses
    docs that share nothing), and the all-pairs frame is the (small)
    per-doc-size table joined to itself. Intended for bounded blocks /
    oracle duty; at corpus scale use minhash_near_dup_pairs, whose
    verify stage is the same computation restricted to LSH candidates.
    All JVM-side (codegen): no Python in any stage.
    """
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(F.col(id_col).alias("d"), t.alias("t")) \
               .where(F.size("t") >= n_words)
    sh = base.select(
        "d",
        F.explode(F.expr(
            f"transform(sequence(1, size(t) - {n_words - 1}),"
            f" i -> concat_ws(' ', slice(t, i, {n_words})))")).alias("s"),
    ).distinct()
    sizes = sh.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.select(F.col("d").alias("a"), "s")
        .join(sh.select(F.col("d").alias("b"), "s"), "s")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("i"))
    )
    pairs = (
        sizes.select(F.col("d").alias("a"), F.col("n").alias("na"))
        .crossJoin(sizes.select(F.col("d").alias("b"), F.col("n").alias("nb")))
        .where(F.col("a") < F.col("b"))
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .select("a", "b",
                (F.coalesce(F.col("i"), F.lit(0)).cast("double")
                 / (F.col("na") + F.col("nb")
                    - F.coalesce(F.col("i"), F.lit(0)))).alias("jaccard"))
    )


def dedup_report(clusters: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One-row corpus dedup summary over a cluster assignment
    (``near_dup_clusters`` output or any [id, cluster] frame) ->
    (n_docs, n_clusters, n_duplicates, max_cluster_size, dup_rate):
    what a 100-TB pipeline logs after the fuzzy-dedup stage to decide
    whether thresholds need retuning. n_duplicates = docs that would
    be dropped keeping one canonical per cluster; dup_rate at 6 dp.

    Scale shape: one cluster-keyed count aggregate + single-row
    roll-up — nothing driver-side.
    """
    sizes = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("sz"))
    return sizes.agg(
        F.sum("sz").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.sum("sz") - F.count(F.lit(1))).cast("long")
        .alias("n_duplicates"),
        F.max("sz").cast("long").alias("max_cluster_size"),
        F.round((F.sum("sz") - F.count(F.lit(1)))
                / F.sum("sz").cast("double"), 6).alias("dup_rate"))


def prefix_jaccard_join(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: float = 0.9) -> DataFrame:
    """EXACT word-set Jaccard join >= threshold via prefix filtering
    (AllPairs / PPJoin family, Bayardo et al. WWW'07) — the classic
    scalable exact similarity join, complementing the probabilistic
    minhash path: same answers as the all-pairs join, but candidate
    generation touches only documents sharing a RARE token.

    Completeness argument (why the prefix equi-join misses nothing):
    order each doc's distinct tokens globally by (frequency asc,
    token asc) and keep the first ``|x| - ceil(t*|x|) + 1`` as the
    prefix. J(x,y) >= t implies the overlap o >= t*max(|x|,|y|), so
    the rarest shared token sits at position <= |x| - o + 1 <= prefix
    length in BOTH docs — every qualifying pair collides on at least
    one prefix token. Candidates then pass a length filter
    (|y| >= ceil(t*|x|)) and an exact-intersection verify, so the
    output is exact, not approximate.

    Scale shape (100 TB): token frequencies are one groupBy; per-doc
    ordering is a window partitioned by doc (bounded by doc length,
    never a global sort); the candidate join is an equi-join on
    prefix tokens whose postings shrink as frequency grows — the
    stop-word skew that kills a naive token join never enters a
    prefix at high t (a frequent token is only prefix-eligible for
    docs with few rarer tokens). The verify join re-reads token lists
    for candidate docs only. No driver-side state, no all-pairs frame
    anywhere (unlike word_ngram_jaccard_all_pairs, which this
    supersedes at scale). Returns [a, b, jaccard] with a < b.

    Reference parity: jxiw/ADOPT has no similarity join; this extends
    the dedup suite the same way minhash_lsh_pairs does.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from pyspark.sql import Window

    t = F.split(F.trim(F.col(text_col)), r"\s+")
    tok = (docs.select(F.col(id_col).alias("d"), F.explode(t).alias("w"))
           .where(F.col("w") != "").distinct())
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    ordered = (
        tok.join(freq, "w")
        .withColumn("pos", F.row_number().over(
            Window.partitionBy("d").orderBy("f", "w")))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("d")))
    )
    prefix = ordered.where(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    ).select("d", "w", "n")
    cand = (
        prefix.select(F.col("d").alias("a"), "w", F.col("n").alias("na"))
        .join(prefix.select(F.col("d").alias("b"), "w",
                            F.col("n").alias("nb")), "w")
        .where((F.col("a") < F.col("b"))
               & (F.col("nb") >= F.ceil(F.lit(threshold) * F.col("na")))
               & (F.col("na") >= F.ceil(F.lit(threshold) * F.col("nb"))))
        .select("a", "b", "na", "nb").distinct()
    )
    inter = (
        cand.join(tok.select(F.col("d").alias("a"), "w"), "a")
        .join(tok.select(F.col("d").alias("b"), "w"), ["b", "w"])
        .groupBy("a", "b", "na", "nb").agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.select(
            "a", "b",
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
                    .cast("double"), 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def containment_join(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     threshold: float = 0.8) -> DataFrame:
    """Asymmetric set-containment join: pairs (a, b) with
    |tokens(a) ∩ tokens(b)| / |tokens(a)| >= threshold — catches a
    document EMBEDDED in a larger one, which symmetric Jaccard dilutes
    below any useful threshold. Directional: a is the contained side.
    Self-pairs excluded; containment rounded to 6 dp BEFORE the
    threshold compare (round-then-filter keeps the boundary identical
    across engines).

    Plan: one distinct (doc, token) explode, token-key equi-join
    (candidates share a token — never all-pairs; at corpus scale swap
    in the df-ordered prefix filter exactly as prefix_jaccard_join),
    pair-count aggregate, one size join.
    """
    tok = (docs.select(F.col(id_col).alias("d"),
                       F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                        .alias("w"))
           .where(F.col("w") != "").distinct())
    sizes = tok.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    inter = (tok.alias("x").join(tok.alias("y"),
                                 (F.col("x.w") == F.col("y.w"))
                                 & (F.col("x.d") != F.col("y.d")))
             .groupBy(F.col("x.d").alias("a"), F.col("y.d").alias("b"))
             .agg(F.count(F.lit(1)).alias("i")))
    return (inter
            .join(sizes.select(F.col("d").alias("a"),
                               F.col("n").alias("na")), "a")
            .withColumn("containment",
                        F.round(F.col("i") / F.col("na"), 6))
            .where(F.col("containment") >= threshold)
            .select("a", "b", "containment"))


CONTAINMENT_SQL = """WITH tok AS MATERIALIZED (
    SELECT DISTINCT doc_id AS d, w
    FROM documents,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS u(w)
    WHERE w <> ''
), sizes AS (
    SELECT d, count(*) AS n FROM tok GROUP BY d
), inter AS (
    SELECT x.d AS a, y.d AS b, count(*) AS i
    FROM tok x JOIN tok y ON x.w = y.w AND x.d <> y.d
    GROUP BY 1, 2
)
SELECT a, b, containment FROM (
    SELECT i.a, i.b, round(i.i / CAST(s.n AS DOUBLE), 6) AS containment
    FROM inter i JOIN sizes s ON s.d = i.a
) WHERE containment >= 0.8"""


def sorted_neighborhood_pairs(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              block_chars: int = 8,
                              window: int = 4) -> DataFrame:
    """Blocked sorted-neighborhood dedup (Hernandez-Stolfo merge/purge):
    sort documents by a blocking key, compare each doc only to its
    ``window`` successors in sort order, score candidates with exact
    word-set Jaccard. The classic low-recall/low-cost rung of the
    blocking ladder (below prefix_jaccard_join and minhash LSH): cost
    is |docs|·window candidate pairs regardless of token statistics.

    This is the BLOCKED variant — the sort/rank window is partitioned
    by the first ``block_chars`` characters of the key, so ranking is
    a per-block window (never a global single-task sort) and blocks
    shard freely across executors at 100 TB. Pairs never span blocks:
    the standard multi-pass answer (re-run with a different key /
    pass) is orthogonal and out of scope here.

    Returns [a, b, jaccard] for every in-window candidate pair
    (a < b by rank order), jaccard 6 dp — unthresholded so the caller
    (or the contract oracle) sees the whole candidate set.
    """
    from pyspark.sql import Window as W

    key = F.trim(F.col(text_col))
    keyed = docs.select(
        F.col(id_col).alias("d"),
        key.alias("k"),
        F.substring(key, 1, block_chars).alias("blk"))
    rn = keyed.withColumn(
        "rn", F.row_number().over(
            W.partitionBy("blk").orderBy("k", "d")))
    left = rn.select("blk", F.col("d").alias("a"), F.col("rn").alias("ra"))
    right = rn.select("blk", F.col("d").alias("b"), F.col("rn").alias("rb"))
    cand = None
    for off in range(1, window + 1):
        c = left.join(
            right,
            (left["blk"] == right["blk"]) & (right["rb"] == left["ra"] + off)
        ).select("a", "b")
        cand = c if cand is None else cand.unionAll(c)
    tok = (docs.select(F.col(id_col).alias("d"),
                       F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                        .alias("w"))
           .where(F.col("w") != "").distinct())
    sizes = tok.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    inter = (cand
             .join(tok.select(F.col("d").alias("a"), "w"), "a")
             .join(tok.select(F.col("d").alias("b"), "w"), ["b", "w"])
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("i")))
    return (cand
            .join(inter, ["a", "b"], "left")
            .join(sizes.select(F.col("d").alias("a"),
                               F.col("n").alias("na")), "a")
            .join(sizes.select(F.col("d").alias("b"),
                               F.col("n").alias("nb")), "b")
            .select("a", "b",
                    F.round(F.coalesce(F.col("i"), F.lit(0))
                            / (F.col("na") + F.col("nb")
                               - F.coalesce(F.col("i"), F.lit(0)))
                            .cast("double"), 6).alias("jaccard")))


SORTED_NEIGHBORHOOD_SQL = """WITH keyed AS MATERIALIZED (
    SELECT doc_id AS d, trim(text) AS k, substr(trim(text), 1, 8) AS blk
    FROM documents
), rn AS MATERIALIZED (
    SELECT d, blk,
           row_number() OVER (PARTITION BY blk ORDER BY k, d) AS rn
    FROM keyed
), cand AS MATERIALIZED (
    SELECT l.d AS a, r.d AS b
    FROM rn l JOIN rn r
      ON l.blk = r.blk AND r.rn - l.rn BETWEEN 1 AND 4
), tok AS MATERIALIZED (
    SELECT DISTINCT doc_id AS d, w
    FROM documents,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS u(w)
    WHERE w <> ''
), sizes AS (
    SELECT d, count(*) AS n FROM tok GROUP BY d
), inter AS (
    SELECT c.a, c.b, count(*) AS i
    FROM cand c
    JOIN tok x ON x.d = c.a
    JOIN tok y ON y.d = c.b AND y.w = x.w
    GROUP BY 1, 2
)
SELECT c.a, c.b,
       round(COALESCE(i.i, 0)
             / CAST(sa.n + sb.n - COALESCE(i.i, 0) AS DOUBLE), 6) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sizes sa ON sa.d = c.a
JOIN sizes sb ON sb.d = c.b"""


# ------------------------------------------------- semantic dedup
#
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
# embedding space with k-means, then prune near-duplicate SEMANTIC
# copies within each cluster by pairwise cosine. The clustering is
# what makes it scale: candidate generation is within-cluster only,
# so the pair stage is sum(|cluster|^2) not n^2 — at 100-TB corpus
# scale k grows with n to bound cluster sizes (the paper uses
# k ~ n/10k on LAION), and each cluster's pair block is an ordinary
# skewed-key join handled by AQE. Keep policy here: lowest vec_id in
# each near-dup neighborhood survives (deterministic; the paper keeps
# the point farthest from the centroid — any fixed rule works for
# dedup purposes and an id rule is engine-portable).


def semantic_dedup(emb: DataFrame, k: int | None = None,
                   tau: float = 0.3,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Per-cluster SemDeDup report.

    Returns DataFrame[cid, n_docs, n_dropped, n_kept] where a doc is
    dropped iff some LOWER-id doc in the same k-means cluster has
    cosine similarity >= tau with it.
    """
    from adopt_spark.functions.kmeans import KMEANS_K, kmeans_assign

    k = k or KMEANS_K
    assign = kmeans_assign(emb, k=k, id_col=id_col, vec_col=vec_col)

    unit = emb.select(
        F.col(id_col).alias("pid"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"))
    unit = unit.withColumn(
        "nrm", F.sqrt(F.aggregate("v", F.lit(0.0),
                                  lambda a, x: a + x * x)))
    pts = (unit.join(assign.withColumnRenamed(id_col, "pid"), "pid")
           .select("pid", "cid", "v", "nrm")
           .persist())

    a = pts.select(F.col("pid").alias("a"), "cid",
                   F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = pts.select(F.col("pid").alias("b"), "cid",
                   F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dropped = (a.join(b, "cid")
               .where(F.col("a") < F.col("b"))
               .withColumn("cos", F.aggregate(
                   F.zip_with("va", "vb", lambda x, y: x * y),
                   F.lit(0.0), lambda acc, x: acc + x)
                   / (F.col("na") * F.col("nb")))
               .where(F.col("cos") >= tau)
               .select("cid", F.col("b").alias("pid"))
               .dropDuplicates(["pid"]))

    report = (pts.join(dropped.select("pid",
                                      F.lit(1).alias("is_dropped")),
                       "pid", "left")
              .groupBy("cid")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum(F.coalesce("is_dropped", F.lit(0)))
                    .cast("long").alias("n_dropped"))
              .select("cid", "n_docs", "n_dropped",
                      (F.col("n_docs") - F.col("n_dropped"))
                      .alias("n_kept"))
              .orderBy("cid"))
    out = report.localCheckpoint(eager=True)
    pts.unpersist()
    return out


def semantic_dedup_sql(k: int | None = None, tau: float = 0.3,
                       table: str = "embeddings",
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    """DuckDB twin: the kmeans_assign twin feeds the identical
    within-cluster cosine prune and per-cluster rollup."""
    from adopt_spark.functions.kmeans import KMEANS_K, kmeans_assign_sql

    k = k or KMEANS_K
    assign = kmeans_assign_sql(k=k, table=table, id_col=id_col,
                               vec_col=vec_col)
    return f"""
WITH assign AS MATERIALIZED (
    {assign}
), ex AS MATERIALIZED (
    SELECT {id_col} AS pid, generate_subscripts({vec_col}, 1) AS i,
           CAST(unnest({vec_col}) AS DOUBLE) AS x
    FROM {table}
), norms AS MATERIALIZED (
    SELECT pid, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY pid
), pairs AS (
    SELECT aa.{id_col} AS a, bb.{id_col} AS b, aa.cid
    FROM assign aa JOIN assign bb
      ON aa.cid = bb.cid AND aa.{id_col} < bb.{id_col}
), cos AS (
    SELECT p.a, p.b, p.cid,
           sum(xa.x * xb.x) / (na.nrm * nb.nrm) AS c
    FROM pairs p
    JOIN ex xa ON xa.pid = p.a
    JOIN ex xb ON xb.pid = p.b AND xb.i = xa.i
    JOIN norms na ON na.pid = p.a
    JOIN norms nb ON nb.pid = p.b
    GROUP BY p.a, p.b, p.cid, na.nrm, nb.nrm
), dropped AS (
    SELECT DISTINCT b AS pid FROM cos WHERE c >= {tau}
)
SELECT a.cid, count(*) AS n_docs,
       CAST(sum(CASE WHEN d.pid IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(count(*) - sum(CASE WHEN d.pid IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM assign a LEFT JOIN dropped d ON d.pid = a.{id_col}
GROUP BY a.cid
ORDER BY a.cid
""".strip()
