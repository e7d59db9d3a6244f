"""Deterministic stratified sampling for training-data pipelines.

A 100-TB corpus is never sampled with ``rand()`` — the sample must be
reproducible across retries, resumable jobs, and engines. The standard
trick (what every large-scale dedup/sampling pipeline does) is a
KEYED HASH GATE: a fixed arithmetic hash of the stable row key mapped
into [0, 1000), compared against a per-stratum keep-rate. The same
row always lands on the same side of the gate, any engine can
recompute it, and the gate is a pure Column expression (JVM-side,
codegen, pushdown-friendly — no Python, no shuffle: the sample is a
FILTER, not a join).

The hash here is a multiply-mod chain over two fixed primes, kept
within int64 by reducing the key first (supports arbitrary 64-bit
keys); it is the engine-side twin of the SQL in
queries/registry.py's ``t_stratified_sample`` oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# key reduction / mixing constants (fixed contract values — the DuckDB
# oracle replicates them digit for digit)
_KEY_MOD = 100_000_007          # reduce the key below sqrt(int64 max)
_MIX_A = 2_654_435_761          # Knuth multiplicative constant
_MIX_B = 11
_MIX_MOD = 1_000_000_007


def sample_gate(key: Column) -> Column:
    """Deterministic per-row gate value in [0, 1000)."""
    h = (F.pmod(key.cast("long"), F.lit(_KEY_MOD)) * F.lit(_MIX_A)
         + F.lit(_MIX_B))
    return F.pmod(F.pmod(h, F.lit(_MIX_MOD)), F.lit(1000))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_per_mille: dict[str, int],
    default_per_mille: int = 500,
) -> DataFrame:
    """Keep each row iff gate(key) < rate(stratum); adds the gate and
    the applied rate as audit columns. Pure narrow filter — scales as
    the scan does; the per-stratum rate map is a CASE expression
    (broadcast-free)."""
    rate = F.lit(default_per_mille)
    for stratum, r in sorted(rates_per_mille.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(r)) \
                .otherwise(rate)
    g = sample_gate(F.col(key_col))
    return (df.withColumn("gate", g.cast("int"))
            .withColumn("rate", rate.cast("int"))
            .where(F.col("gate") < F.col("rate")))


def weighted_sample_topk(df: DataFrame, key_col: str, weight_col: str,
                         k: int = 20) -> DataFrame:
    """Deterministic weight-proportional sample without replacement
    (Efraimidis-Spirakis priority sampling) -> [key, weight, score,
    rk]: each row draws a reproducible hash-uniform u in (0, 1) from
    its key and keeps score = -ln(u) / w; the k SMALLEST scores are
    the sample. P(row in sample) is proportional to its weight, the
    sample is identical across engines/retries/parallelism (no
    rand()), and streaming/distributed merging is a k-row top-k —
    the standard reservoir-free weighted sampler for 100-TB corpora.

    Cross-engine contract: u = (gate_hash + 1) / (MOD + 1) uses the
    same multiply-mod chain as sample_gate (before the %1000 fold);
    the score is rounded to 9 dp so libm ln() last-ulp differences
    cannot reorder the rank; ties break on the key. Rows with
    weight <= 0 are excluded (they cannot be drawn).

    Plan: pure Column arithmetic + one TakeOrdered top-k (per-
    partition heaps, k-row driver merge) — no shuffle of the corpus.
    """
    h = (F.pmod(F.col(key_col).cast("long"), F.lit(_KEY_MOD))
         * F.lit(_MIX_A) + F.lit(_MIX_B))
    u = ((F.pmod(h, F.lit(_MIX_MOD)) + F.lit(1.0))
         / F.lit(float(_MIX_MOD + 1)))
    score = F.round(-F.log(u) / F.col(weight_col).cast("double"), 9)
    w = Window.orderBy("score", key_col)
    return (df.where(F.col(weight_col) > 0)
            .select(F.col(key_col), F.col(weight_col),
                    score.alias("score"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select(key_col, weight_col, "score",
                    F.col("rk").cast("int").alias("rk")))


def weighted_sample_topk_sql(table: str, key_col: str, weight_col: str,
                             k: int = 20) -> str:
    """DuckDB twin of weighted_sample_topk (same constants)."""
    return f"""
WITH s AS (
    SELECT {key_col}, {weight_col},
           round(-ln((((CAST({key_col} AS BIGINT) % {_KEY_MOD})
                        * {_MIX_A} + {_MIX_B}) % {_MIX_MOD} + 1.0)
                     / {float(_MIX_MOD + 1)!r})
                 / CAST({weight_col} AS DOUBLE), 9) AS score
    FROM {table} WHERE {weight_col} > 0
)
SELECT {key_col}, {weight_col}, score, CAST(rk AS INTEGER) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY score, {key_col}) AS rk
      FROM s)
WHERE rk <= {k}"""


# -------------------------------------- negative edge sampling

_NEG_A, _NEG_B = 6364136223846793005, 1442695040888963407  # LCG (Knuth)


def negative_samples(edges: DataFrame, k: int = 3,
                     m: int = 8) -> DataFrame:
    """Deterministic negative-edge sampler for link-prediction
    training data: for every source vertex, up to ``k`` vertices it
    is NOT connected to, drawn from ``m`` hash-generated candidates —
    the contrastive negatives a GNN/embedding trainer pairs with the
    real edges. No rand(): candidate i of vertex v is the vertex at
    dense index (A·(idx(v)+1) + B·(i+1)) mod |V| (Knuth LCG mix), so
    the sample is identical at any parallelism and replayable by the
    SQL twin.

    Plan: one window builds the dense vertex index (sorted by id),
    one ``m``-way sequence explode makes candidates, one index
    equi-join maps index -> vertex id, one anti-join removes real
    edges (and self-pairs), one per-src rank keeps the first ``k`` by
    candidate slot. Candidate volume = m·|V| — linear, never |V|².
    (The global row_number index is the fixture-scale shortcut; at
    10^12-vertex scale swap it for the range-partitioned offset
    dictionary in vertices.py — same dense index, no single-partition
    window.)
    """
    if k < 1 or m < k:
        raise ValueError(f"need m >= k >= 1, got k={k} m={m}")
    sym = (edges.select(F.col("sid").alias("u"), F.col("tid").alias("v"))
           .unionAll(edges.select(F.col("tid").alias("u"),
                                  F.col("sid").alias("v")))
           .where(F.col("u") != F.col("v")).distinct())
    verts = (sym.select(F.col("u").alias("vid")).distinct())
    w = Window.orderBy("vid")
    idx = verts.withColumn("idx", F.row_number().over(w) - 1)
    n = idx.count()
    cand = (idx.select(F.col("vid").alias("src"), "idx",
                       F.explode(F.sequence(F.lit(0), F.lit(m - 1)))
                       .alias("slot"))
            .withColumn(
                "cidx",
                ((F.lit(_NEG_A) % n) * (F.col("idx") + 1)
                 + (F.lit(_NEG_B) % n) * (F.col("slot") + 1)) % n))
    mapped = (cand.join(idx.select(F.col("idx").alias("cidx"),
                                   F.col("vid").alias("dst")), "cidx")
              .where(F.col("src") != F.col("dst")))
    non_edges = mapped.join(
        sym.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        ["src", "dst"], "left_anti")
    rw = Window.partitionBy("src").orderBy("slot", "dst")
    return (non_edges.withColumn("rank", F.row_number().over(rw))
            .where(F.col("rank") <= k)
            .select("src", "dst", F.col("rank").cast("int").alias("rank")))


def negative_samples_sql(edge_sql: str, k: int = 3, m: int = 8) -> str:
    """DuckDB twin: the same dense index, LCG candidate arithmetic,
    anti-join, and slot-ordered rank."""
    return f"""
WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT DISTINCT u, v FROM (
        SELECT sid AS u, tid AS v FROM edge
        UNION ALL SELECT tid, sid FROM edge)
    WHERE u <> v
), idx AS MATERIALIZED (
    SELECT vid, row_number() OVER (ORDER BY vid) - 1 AS idx
    FROM (SELECT DISTINCT u AS vid FROM sym)
), n AS (SELECT count(*) AS n FROM idx),
cand AS (
    SELECT i.vid AS src, i.idx, t.slot,
           (({_NEG_A} % n.n) * (i.idx + 1)
            + ({_NEG_B} % n.n) * (t.slot + 1)) % n.n AS cidx
    FROM idx i, n, unnest(generate_series(0, {m - 1})) AS t(slot)
), mapped AS (
    SELECT c.src, c.slot, j.vid AS dst
    FROM cand c JOIN idx j ON j.idx = c.cidx
    WHERE c.src <> j.vid
), non_edges AS (
    SELECT m2.src, m2.slot, m2.dst
    FROM mapped m2
    ANTI JOIN sym s ON s.u = m2.src AND s.v = m2.dst
)
SELECT src, dst, CAST(rk AS INTEGER) AS rank
FROM (SELECT src, dst,
             row_number() OVER (PARTITION BY src
                                ORDER BY slot, dst) AS rk
      FROM non_edges)
WHERE rk <= {k}
""".strip()


def link_prediction_auc_sql(edge_sql: str, holdout_mod: int = 10,
                            k_neg: int = 3, m_neg: int = 8) -> str:
    """DuckDB twin of algos.vertex_metrics.link_prediction_auc: same
    hash split, same negative sampler (negative_samples_sql over the
    TRAIN canonical edges), same wedge-join scores and exact
    histogram AUC."""
    train_sql = f"""SELECT sid, tid FROM (
    SELECT DISTINCT sid, tid FROM ({edge_sql}) WHERE sid < tid
) WHERE (sid * 1000003 + tid) % {holdout_mod} <> 0"""
    neg_sql = negative_samples_sql(train_sql, k_neg, m_neg)
    return f"""
WITH lt AS MATERIALIZED (
    SELECT DISTINCT sid, tid FROM ({edge_sql}) WHERE sid < tid
), test AS MATERIALIZED (
    SELECT sid AS u, tid AS v FROM lt
    WHERE (sid * 1000003 + tid) % {holdout_mod} = 0
), train AS MATERIALIZED (
    SELECT sid, tid FROM lt
    WHERE (sid * 1000003 + tid) % {holdout_mod} <> 0
), symt AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM train
    UNION ALL SELECT tid, sid FROM train
), negs AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM ({neg_sql})
    ANTI JOIN lt ON lt.sid = least(src, dst)
                AND lt.tid = greatest(src, dst)
), pos_cn AS MATERIALIZED (
    SELECT t.u, t.v, coalesce(h.cn, 0) AS cn
    FROM test t LEFT JOIN (
        SELECT p.u, p.v, count(*) AS cn
        FROM test p
        JOIN symt a ON a.v = p.u
        JOIN symt b ON b.v = p.v AND b.nbr = a.nbr
        GROUP BY p.u, p.v) h ON h.u = t.u AND h.v = t.v
), neg_cn AS MATERIALIZED (
    SELECT t.u, t.v, coalesce(h.cn, 0) AS cn
    FROM negs t LEFT JOIN (
        SELECT p.u, p.v, count(*) AS cn
        FROM negs p
        JOIN symt a ON a.v = p.u
        JOIN symt b ON b.v = p.v AND b.nbr = a.nbr
        GROUP BY p.u, p.v) h ON h.u = t.u AND h.v = t.v
), ph AS (SELECT cn, count(*) AS pc FROM pos_cn GROUP BY cn),
nh AS (SELECT cn, count(*) AS nc FROM neg_cn GROUP BY cn),
wins AS (
    SELECT sum(CASE WHEN ph.cn > nh.cn THEN ph.pc * nh.nc
                    ELSE 0 END) AS w,
           sum(CASE WHEN ph.cn = nh.cn THEN ph.pc * nh.nc
                    ELSE 0 END) AS t
    FROM ph, nh
), stats AS (
    SELECT (SELECT sum(pc) FROM ph) AS np,
           (SELECT sum(cn * pc) FROM ph) AS sp,
           (SELECT sum(nc) FROM nh) AS nn,
           (SELECT sum(cn * nc) FROM nh) AS sn
)
SELECT CAST(np AS BIGINT) AS n_pos,
       CAST(nn AS BIGINT) AS n_neg,
       CAST(round((w + 0.5 * t) / (np * nn), 6) AS DOUBLE) AS auc,
       CAST(round(CAST(sp AS DOUBLE) / np, 6) AS DOUBLE) AS mean_cn_pos,
       CAST(round(CAST(sn AS DOUBLE) / nn, 6) AS DOUBLE) AS mean_cn_neg
FROM stats, wins
""".strip()


# ------------------------------------- GNN neighbor-fanout sampling
#
# GraphSAGE (Hamilton et al., NeurIPS'17) trains on sampled L-hop
# computation graphs: hop h keeps at most fanout_h out-neighbors per
# frontier vertex. At 100-TB graph scale the sampler IS the training
# input pipeline (DGL/PyG run exactly this as a distributed
# pre-processing job), so it must be replayable across retries and
# engines — rand() is out. Neighbors are ranked by the same
# deterministic integer mix the walk generator uses (algos/walks.py:
# parallelism-independent, resumable, SQL-replayable) and the f
# smallest mixes win; the hop index enters the mix so hops draw
# independent samples. This is the LAYER-WISE variant: each hop's
# frontier is deduplicated before sampling (per-vertex work is done
# once per hop, not once per seed — the bound that keeps hop cost
# ≤ O(|V|·fanout) regardless of seed count).
#
# Plan shape per hop: one frontier⋈edges equi-join + one per-src
# rank. Hub vertices rank their full out-list in one task — the
# standard shape; a supernode beyond single-task range is pre-split
# with skew.py's hub machinery (same caveat as asof_join, documented
# there).


def neighbor_fanout_sample(edges: DataFrame,
                           fanouts: tuple[int, ...] = (3, 2),
                           seed_mod: int = 20) -> DataFrame:
    """Layer-wise deterministic neighbor sampling.

    Seeds are the vertices with ``v % seed_mod == 0``; hop h (1-based)
    keeps the ``fanouts[h-1]`` out-neighbors with the smallest
    ``mix(src, h, dst)`` (ties by dst). Returns the sampled block
    edge list DataFrame[hop int, src long, dst long].
    """
    from adopt_spark.algos.walks import MIX_A1, MIX_A2, MIX_A3, MIX_B, MIX_M

    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError(f"fanouts must be non-empty positive: {fanouts}")
    if seed_mod < 1:
        raise ValueError(f"seed_mod must be >= 1: {seed_mod}")

    e = (edges.select(F.col("sid").cast("long").alias("src"),
                      F.col("tid").cast("long").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .dropDuplicates(["src", "dst"]))
    verts = (e.select(F.col("src").alias("v"))
             .unionAll(e.select(F.col("dst").alias("v")))
             .distinct())
    # frontier is always a 1-column (src) frame consumed via LEFT SEMI
    # — no self-join ambiguity when hop h's frontier derives from e
    frontier = (verts.where(F.col("v") % seed_mod == 0)
                .select(F.col("v").alias("src")))

    hops = []
    for h, f in enumerate(fanouts, start=1):
        mix = F.pmod(F.lit(MIX_A1) * F.col("src") + F.lit(MIX_A2 * h)
                     + F.lit(MIX_A3) * F.col("dst") + F.lit(MIX_B),
                     F.lit(MIX_M))
        ranked = (e.join(frontier, "src", "left_semi")
                  .select("src", "dst", mix.alias("mx"))
                  .withColumn("rk", F.row_number().over(
                      Window.partitionBy("src").orderBy("mx", "dst"))))
        hop = (ranked.where(F.col("rk") <= f)
               .select(F.lit(h).cast("int").alias("hop"), "src", "dst"))
        hops.append(hop)
        frontier = hop.select(F.col("dst").alias("src")).distinct()

    out = hops[0]
    for hdf in hops[1:]:
        out = out.unionAll(hdf)
    return out.orderBy("hop", "src", "dst")


def neighbor_fanout_sample_sql(edge_sql: str,
                               fanouts: tuple[int, ...] = (3, 2),
                               seed_mod: int = 20) -> str:
    """DuckDB twin: identical mix ranking per hop."""
    from adopt_spark.algos.walks import MIX_A1, MIX_A2, MIX_A3, MIX_B, MIX_M

    ctes = [f"""e AS MATERIALIZED (
    SELECT DISTINCT sid AS src, tid AS dst FROM edge WHERE sid <> tid
), verts AS (
    SELECT src AS v FROM e UNION SELECT dst FROM e
), f0 AS (
    SELECT v FROM verts WHERE v % {seed_mod} = 0
)"""]
    sels = []
    for h, f in enumerate(fanouts, start=1):
        mix = (f"({MIX_A1} * e.src + {MIX_A2 * h} + {MIX_A3} * e.dst "
               f"+ {MIX_B}) % {MIX_M}")
        ctes.append(f"""c{h} AS (
    SELECT e.src, e.dst,
           row_number() OVER (PARTITION BY e.src
                              ORDER BY {mix}, e.dst) AS rk
    FROM f{h-1} f JOIN e ON e.src = f.v
), h{h} AS MATERIALIZED (
    SELECT {h} AS hop, src, dst FROM c{h} WHERE rk <= {f}
), f{h} AS (
    SELECT DISTINCT dst AS v FROM h{h}
)""")
        sels.append(f"SELECT hop, src, dst FROM h{h}")
    union = "\n    UNION ALL\n    ".join(sels)
    return (f"""WITH edge AS MATERIALIZED (
{edge_sql}
), """ + ",\n".join(ctes) + f"""
SELECT CAST(hop AS INTEGER) AS hop, src, dst FROM (
    {union}
)
ORDER BY hop, src, dst""")


def dsir_sample(docs: DataFrame, target_lang: str | None = None,
                keep_pct: int = 20, text_col: str = "text") -> DataFrame:
    """DSIR-style importance resampling (Xie et al., NeurIPS'23
    "Data Selection for Language Models via Importance Resampling"):
    score every document by how target-like its unigram distribution
    is, keep the top ``keep_pct`` percent -> [doc_id, lang, n_tokens,
    score (6 dp)] for the selected docs.

    The target domain is the documents of ``target_lang`` (default:
    the lexicographically smallest lang in the corpus — deterministic
    with no configuration). Two add-one-smoothed unigram LMs are
    fitted over the SHARED corpus vocabulary — target p(w) and raw
    corpus q(w) — and a document's importance weight is the mean
    log-likelihood ratio of its tokens:

        score(d) = mean over tokens w of [ ln p(w) - ln q(w) ]

    (DSIR uses hashed n-gram features; words are the n=1 instance.
    The mean, not the sum, so score is length-comparable.) Selection
    keeps the top ceil(n_docs * keep_pct / 100) by (score desc,
    doc_id asc) — integer budget arithmetic, so the cut index is
    exact on every engine.

    Scale shape: two vocabulary hash-aggs (map-side partial) with the
    target LM derived from the same token frame (one pass over the
    corpus); vocabulary-sized frames broadcast back onto the token
    stream; ONE doc-keyed aggregate for scores. The final top-k uses
    a global rank over the doc-count-sized score frame — at 10^9+
    docs swap it for the two-pass quantile threshold (approx
    percentile to bound the cutoff, exact rank inside the boundary
    bucket), the same escape hatch as zipf_fit's head cap. Scores are
    6 dp-quantized BEFORE ranking so cross-engine libm drift cannot
    reorder the cut boundary; ties break on doc_id.
    """
    if not 0 < keep_pct <= 100:
        raise ValueError(f"keep_pct must be in (0, 100], got {keep_pct}")
    toks = docs.select(
        "doc_id", "lang",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
         .alias("term"),
    ).where(F.col("term") != "")
    tgt = (target_lang if target_lang is not None
           else docs.agg(F.min("lang")).collect()[0][0])
    cf = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cq"),
        F.sum(F.when(F.col("lang") == tgt, 1).otherwise(0)).alias("cp"))
    tot = cf.agg(F.sum("cq").alias("nq"), F.sum("cp").alias("np"),
                 F.count(F.lit(1)).alias("v"))
    llr = (F.log((F.col("cp") + 1) / (F.col("np") + F.col("v")))
           - F.log((F.col("cq") + 1) / (F.col("nq") + F.col("v"))))
    scored = (toks.join(F.broadcast(cf), "term")
              .crossJoin(F.broadcast(tot))
              .groupBy("doc_id", "lang")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.round(F.avg(llr), 6).alias("score")))
    # budget denominator = SCORED (tokenized) docs, not the raw corpus:
    # zero-token docs are unselectable, so counting them in the budget
    # would silently shrink the actual keep fraction below keep_pct
    n = scored.select(F.count(F.lit(1)).alias("n_docs"))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .crossJoin(F.broadcast(n))
            .where(F.col("rnk") <= (F.col("n_docs") * keep_pct + 99)
                   .cast("long") / 100)
            .select("doc_id", "lang",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    "score"))
