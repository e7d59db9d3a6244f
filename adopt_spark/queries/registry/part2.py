# registry part 2/5 — continues part1 in the same namespace
# (executed by adopt_spark.queries.registry.__init__)
from __future__ import annotations


def q_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding
    centroids (cluster-separation report)."""
    from adopt_spark.functions.similarity import centroid_similarity

    return centroid_similarity(_t(spark, sf_dir, "embeddings"), "label")


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token estimate (whitespace words + standalone
    punctuation runs) — pure Column ops with an exact SQL oracle."""
    from adopt_spark.functions.text import word_token_count

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", word_token_count("text").alias("n_bpe_tokens"))


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d)


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(quality_score("text"), 4).alias("quality"))


def q_doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(token_count("text")).alias("total_tokens"),
             F.round(F.avg(F.length("text")), 4).alias("avg_chars"))
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF language ID. The stopword-vote heuristic is fully
    deterministic and SQL-expressible, so it carries an exact DuckDB
    oracle (oracle_gen.lang_id_sql) — occurrence counts, argmax with
    first-in-dict tie-break, 'unk' on zero."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-partition invariant with a value-level oracle.

    The 64-bit xxhash64-chain fingerprint itself has no SQL twin, but
    its CONTRACT does: docs share a fingerprint iff they share the
    whitespace-normalized token stream (no collisions at fixture
    scale). The query plants whitespace-perturbed copies of the first
    10 docs (ids +100000, every space doubled) — the fingerprint must
    merge each with its original; the oracle groups by the normalized
    text directly."""
    d = _t(spark, sf_dir, "documents")
    perturbed = (
        d.where(F.col("doc_id") < 10)
        .select((F.col("doc_id") + 100000).alias("doc_id"),
                F.regexp_replace(F.col("text"), " ", "  ").alias("text"))
    )
    aug = d.select("doc_id", "text").unionByName(perturbed)
    return (
        aug.select("doc_id", doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .select("doc_id", "n_docs")
    )


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash→LSH→exact-verify near-dup over the ASCII doc block.

    Value-level oracle: exact char-5-gram Jaccard over ALL pairs in
    DuckDB (oracle_gen.MINHASH_ASCII_JACCARD_SQL). The block is
    restricted to ASCII docs so the engine's byte-window shingles
    equal SQL's character substrings; equality additionally proves the
    banded LSH recalls every true pair at this threshold (verified
    deterministic at sf0.001/0.01 — misses would surface as missing
    rows, extras are impossible because the verify stage is exact)."""
    d = _t(spark, sf_dir, "documents") \
        .where(F.col("text").rlike("^[\\x00-\\x7F]*$"))
    return minhash_near_dup_pairs(d, threshold=0.8).select(
        "a", "b", F.round("jaccard", 4).alias("jaccard"))


def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup (pairs → connected components →
    canonical doc) over the ASCII block; oracle = exact-Jaccard pairs
    + recursive-CTE reachability + min-id labels
    (oracle_gen.NEAR_DUP_CLUSTERS_SQL)."""
    from adopt_spark.functions.dedup import near_dup_clusters

    d = _t(spark, sf_dir, "documents") \
        .where(F.col("text").rlike("^[\\x00-\\x7F]*$"))
    return near_dup_clusters(d, threshold=0.8)


def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dedup summary over the fuzzy-dedup cluster assignment
    (same ASCII-block pipeline as t_near_dup_clusters)."""
    from adopt_spark.functions.dedup import dedup_report, near_dup_clusters

    d = _t(spark, sf_dir, "documents") \
        .where(F.col("text").rlike("^[\\x00-\\x7F]*$"))
    return dedup_report(near_dup_clusters(d, threshold=0.8))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs sharing any word 4-gram
    with the deterministic benchmark slice (doc_id % 19 = 3). Gram
    equi-join with the bench shingle set broadcast; oracle rebuilds
    both shingle sets in SQL."""
    from adopt_spark.functions.text import ngram_decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 19 == 3)
    train = d.where(F.col("doc_id") % 19 != 3)
    return ngram_decontaminate(train, bench, n=4)


def q_dup_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate 8-token-block fractions per document
    (boilerplate / copy-paste mass)."""
    from adopt_spark.functions.text import dup_block_stats

    return dup_block_stats(_t(spark, sf_dir, "documents"), block=8)


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 bigram collocations by association lift (PMI = log2 of
    the reported lift); the ranking statistic is one double division
    of exact BIGINT products so both engines rank identical values."""
    from adopt_spark.functions.text import collocations

    return collocations(_t(spark, sf_dir, "documents"), min_count=10, k=50)


def q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality at 8 fixed supersteps (alpha=0.01) on the
    derived graph; oracle = the unrolled recurrence
    (oracle_gen.katz_fixed_sql)."""
    from adopt_spark.algos.katz import katz_centrality

    out, _ = katz_centrality(spark, derived_edges(spark, sf_dir),
                             alpha=0.01, max_iter=8)
    return out


def q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite butterfly (2x2 biclique) count over the co-purchase
    relation (l_orderkey, l_partkey), basket cap 16 — counted via the
    C(w,2) identity on the projected pair weights, never 4-tuples."""
    from adopt_spark.edges import butterfly_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return butterfly_count(li, "l_orderkey", "l_partkey",
                           max_group_size=16)


def q_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge neighborhood Jaccard (SCAN structural similarity) on
    the derived graph's lt-canonical edges."""
    from adopt_spark.algos.vertex_metrics import edge_jaccard

    return edge_jaccard(derived_edges(spark, sf_dir))


def q_knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) cosine top-k: corpus compressed to one
    byte/dim, asymmetric distance against exact queries. The oracle
    replays the identical quantize -> dequantize -> score arithmetic
    in SQL, so the lossy codes themselves are value-checked."""
    from adopt_spark.functions.similarity import sq8_topk

    emb = _t(spark, sf_dir, "embeddings")
    return sq8_topk(emb, _queries_from_embeddings(emb), k=5)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simhash Hamming-ball pairs in md5 hash mode — DuckDB recomputes
    the identical signatures (md5-derived token hashes + bit votes)
    and compares the complete pigeonhole-exact pair set value-for-
    value (oracle_gen.SIMHASH_MD5_PAIRS_SQL)."""
    d = _t(spark, sf_dir, "documents")
    return simhash_pairs(d, max_hamming=3, hash_mode="md5")


# ---------------- embeddings / similarity -----------------------------------

def _queries_from_embeddings(emb: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = _queries_from_embeddings(emb)
    out = brute_force_topk(emb, q, k=5)
    return out.select("q_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")


def q_knn_graph_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding clustering: exact-cosine MUTUAL 3-NN graph (self
    excluded, id tie-break; an edge survives only if both endpoints
    list each other) → hash-min connected components (no-edge vectors
    are singletons) → per-cluster size + majority label. Oracle: the
    same kNN edges in SQL + recursive reachability (the a_cc_sizes
    pattern)."""
    from adopt_spark.functions.similarity import knn_graph_clusters

    return knn_graph_clusters(spark, _t(spark, sf_dir, "embeddings"), k=3)


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN with an EXACT oracle: the seeded hyperplanes
    are embedded as float literals in the DuckDB SQL
    (oracle_gen.knn_lsh_sql), which recomputes the same signatures,
    band-key candidate union, and cosine re-rank — the approximate
    candidate generation itself is compared bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings")
    q = _queries_from_embeddings(emb)
    return lsh_topk(emb, q, k=5, bits=12, bands=4).select(
        "q_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at full probe (= exact); oracle = the brute-force SQL."""
    from adopt_spark.functions.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = _queries_from_embeddings(emb)
    return ivf_topk(emb, q, k=5, n_centroids=8, n_probe=8).select(
        "q_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")


# ---------------- iterative graph algorithms (rows-only) --------------------

def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine-threshold pairs with an exact replica
    oracle (oracle_gen.embedding_near_dup_sql: same hyperplane
    literals, same band joins, same planted vectors).

    The testdata embeddings are near-orthogonal (no organic pair above
    cos 0.8), so the query plants deterministic near-duplicates: the
    first 5 vectors re-enter scaled by 1.0001 under ids +100000. The
    LSH pipeline must recover exactly those plants (cos ≈ 1).
    """
    from adopt_spark.functions.similarity import embedding_near_dup

    emb = _t(spark, sf_dir, "embeddings")
    plants = (
        emb.where(F.col("vec_id") < 5)
        .select((F.col("vec_id") + 100000).alias("vec_id"),
                F.transform("embedding", lambda x: x * F.lit(1.0001)
                            ).cast("array<float>").alias("embedding"),
                "label")
    )
    aug = emb.unionByName(plants)
    return embedding_near_dup(aug, threshold=0.95).select(
        "a", "b", F.round("cos", 4).alias("cos"))


def _media_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (o.where(F.col("o_orderkey") % 100 < 2)
            .select(F.col("o_orderkey").alias("media_id")))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode with a value-level oracle: payloads are
    spec-conformant grayscale PNGs (every scanline filter type appears
    across the fixture) whose pixels follow a closed arithmetic law
    over (media_id, i); the decoded mean/std/thumbnail stats must
    reproduce the law's SQL evaluation
    (oracle_gen.MEDIA_FEATURES_SQL) — a wrong inflate or unfilter
    step cannot pass."""
    from adopt_spark.functions.multimodal import decode_images, synthetic_png_media

    media = synthetic_png_media(_media_keys(spark, sf_dir))
    out = decode_images(media)
    return out.select("media_id",
                      F.round("mean_px", 4).alias("mean_px"),
                      F.round("std_px", 4).alias("std_px"),
                      "thumb_w", "thumb_h")


def q_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode with a value-level oracle: payloads
    are spec-conformant JFIF streams (jpeg_codec.py — markers, Annex-K
    Huffman tables, zigzag, DCT, quantization, byte stuffing) built
    from 8x8-aligned constant blocks whose decoded values follow a
    closed arithmetic law (oracle_gen.JPEG_FEATURES_SQL); a wrong
    Huffman table, zigzag order, or dequantization step cannot pass.
    Closes the round-3 'JPEG needs an injected decoder' gap —
    reference parity: none (the reference is tabular-only); this is
    LLM-pipeline surface."""
    from adopt_spark.functions.multimodal import (
        decode_images, synthetic_jpeg_media,
    )

    media = synthetic_jpeg_media(_media_keys(spark, sf_dir))
    out = decode_images(media)
    return out.select("media_id",
                      F.round("mean_px", 4).alias("mean_px"),
                      F.round("std_px", 4).alias("std_px"),
                      "thumb_w", "thumb_h")


def q_pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank at a FIXED superstep count (tol=0), matching
    oracle_gen.pagerank_fixed_sql's unrolled CTE chain; the rank gap
    at the top-20 boundary is ~2e-6 at sf0.01, far above cross-engine
    float noise, so the selection is stable."""
    from adopt_spark.queries.oracle_gen import PR_ITERS

    e = derived_edges(spark, sf_dir)
    ranks, _ = pagerank(spark, e, tol=0.0, max_iter=PR_ITERS)
    return (ranks.orderBy(F.desc("rank"), F.asc("v")).limit(20)
            .select("v", F.round("rank", 6).alias("rank")))


def q_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL per-vertex rank vector after PR_ITERS supersteps,
    rounded to 6 dp — the strongest PageRank check in the contract
    (every vertex, every value, vs the unrolled DuckDB recurrence)."""
    from adopt_spark.queries.oracle_gen import PR_ITERS

    e = derived_edges(spark, sf_dir)
    ranks, _ = pagerank(spark, e, tol=0.0, max_iter=PR_ITERS)
    return ranks.select("v", F.round("rank", 6).alias("rank"))


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync LPA community sizes after <= LPA_ITERS supersteps; the
    oracle (oracle_gen.lpa_fixed_sql) unrolls exactly LPA_ITERS votes
    — engine early-stop at fixpoint agrees because further votes are
    no-ops there."""
    from adopt_spark.queries.oracle_gen import LPA_ITERS

    e = derived_edges(spark, sf_dir)
    labels, _ = label_propagation(spark, e, max_iter=LPA_ITERS)
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio features over closed-form PCM clips with a value-level
    oracle (oracle_gen.AUDIO_FEATURES_SQL): duration/RMS/zero-
    crossings/peak must reproduce the sample law's SQL evaluation."""
    from adopt_spark.functions.multimodal import audio_features, synthetic_pcm_media

    media = synthetic_pcm_media(_media_keys(spark, sf_dir))
    out = audio_features(media)
    return out.select("media_id",
                      F.round("duration_s", 7).alias("duration_s"),
                      F.round("rms", 4).alias("rms"),
                      "zero_crossings", "peak")


def q_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio features over REAL RIFF/WAVE payloads (wav_codec.py): the
    same closed-form sample law as q_audio_features but container-
    encoded, so the container parse + 8-bit decode + mixdown path runs
    under the same value-level oracle (oracle_gen.AUDIO_FEATURES_SQL —
    duration comes from the WAV header's own sample rate)."""
    from adopt_spark.functions.multimodal import audio_features, synthetic_wav_media

    media = synthetic_wav_media(_media_keys(spark, sf_dir))
    out = audio_features(media)
    return out.select("media_id",
                      F.round("duration_s", 7).alias("duration_s"),
                      F.round("rms", 4).alias("rms"),
                      "zero_crossings", "peak")


def q_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition histogram (incremental peel) on the sparse
    planted graph; oracle = bounded-depth peel unrolled in SQL
    (oracle_gen.core_numbers_sql)."""
    from adopt_spark.algos.kcore import core_numbers

    e = derived_edges_sparse(spark, sf_dir)
    cores = core_numbers(spark, e)
    return cores.groupBy("core").agg(F.count(F.lit(1)).alias("n_vertices"))


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING: 8 merge rules learned from
    the documents corpus — vocab built in one pass, each round one
    pair-count aggregate + deterministic argmax + literal replace
    (functions/bpe.py; the repeated-replace merge convention is
    shared with the oracle). Output = the merge table itself."""
    from adopt_spark.functions.bpe import bpe_train

    return bpe_train(_t(spark, sf_dir, "documents"), n_merges=8)


def q_lp_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction EVALUATION: hold out 1/10 of the sparse
    graph's edges, score positives + sampled negatives by
    common-neighbor count over the train graph, report exact
    histogram AUC + mean scores (algos/vertex_metrics.py:
    link_prediction_auc — never materializes pos x neg pairs)."""
    from adopt_spark.algos.vertex_metrics import link_prediction_auc

    return link_prediction_auc(derived_edges_sparse(spark, sf_dir))


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-edge sampling (GNN/embedding training
    negatives): 3 non-neighbors per vertex from 8 LCG-generated
    candidates — replayable at any parallelism, linear candidate
    volume (functions/sampling.py:negative_samples)."""
    from adopt_spark.functions.sampling import negative_samples

    return negative_samples(derived_edges_sparse(spark, sf_dir),
                            k=3, m=8)


def q_reshard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshard move matrix (16 -> 24 shards): per (old, new) cell the
    docs/tokens that travel under the deterministic LCG assignment —
    the transfer-job sizing an export orchestrator needs
    (functions/export.py:reshard_plan)."""
    from adopt_spark.functions.export import reshard_plan

    return reshard_plan(_t(spark, sf_dir, "documents"),
                        n_old=16, n_new=24)


def q_triangle_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering significance vs the configuration-model null: the
    observed triangle count against the Chung-Lu closed-form
    expectation E[tri] = (Σ d(d-1) / Σd)³ / 6 — the one-row
    network-science stat that says whether the dependency graph is
    MORE clustered than its degree sequence alone explains. Composes
    the oracle-green cogroup triangle kernel with two degree
    aggregates; expectation and ratio at 6 dp."""
    from adopt_spark.algos.triangles import triangle_count

    e = derived_edges_sparse(spark, sf_dir)
    lt = (e.where(F.col("sid") < F.col("tid"))
          .dropDuplicates(["sid", "tid"]))
    sym = lt.select(F.col("sid").alias("v")).unionAll(
        lt.select(F.col("tid").alias("v")))
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    mom = deg.agg(
        F.sum("d").cast("double").alias("s1"),
        F.sum(F.col("d") * (F.col("d") - 1)).cast("double").alias("s2"))
    tri = triangle_count(e, "cogroup").select(
        F.col("n_triangles").cast("double").alias("tri"))
    # r*r*r, not pow(r, 3): IEEE multiply is bit-deterministic across
    # engines, libm pow is not
    r = F.col("s2") / F.col("s1")
    exp_null = r * r * r / F.lit(6.0)
    return (tri.crossJoin(mom)
            .select(
                F.col("tri").cast("long").alias("n_triangles"),
                F.round(exp_null, 6).alias("expected_null"),
                F.round(F.col("tri") / exp_null, 6).alias("ratio")))


def q_orbit3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex 3-node graphlet orbit counts (GDV orbits 0-3) on
    the sparse planted graph: degree, wedge-end, wedge-center,
    triangle — from two aggregates + one neighbor-degree join via
    closed forms, no wedge enumeration
    (algos/vertex_metrics.py:orbit_counts_3)."""
    from adopt_spark.algos.vertex_metrics import orbit_counts_3

    return orbit_counts_3(derived_edges_sparse(spark, sf_dir))


def q_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval (MaxSim): vectors as
    8 sub-vector "tokens", score = sum over query tokens of the max
    cosine against any document token, computed as ONE nested
    higher-order-function Column (functions/similarity.py:
    maxsim_topk); broadcast query side, top-5 per query."""
    from adopt_spark.functions.similarity import maxsim_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = maxsim_topk(emb, _queries_from_embeddings(emb), k=5)
    return out.select("q_id", "vec_id",
                      F.round("score", 6).alias("score"), "rank")


def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline END TO END as one declarative chain:
    quality gate (top-half per lang) -> exact dedup on the normalized
    text (keep min doc_id) -> deterministic 80/10/10 split -> token
    chunking (32/24) -> per (split, lang) docs/chunks/tokens report.
    Every stage is individually oracle-green; this entry checks the
    COMPOSITION (the oracle recomposes the same four SQL stages)."""
    from pyspark.sql import Window

    from adopt_spark.functions.export import chunk_documents
    from adopt_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        F.round(quality_score("text"), 4).alias("q"))
    w = Window.partitionBy("lang").orderBy(F.desc("q"), F.asc("doc_id"))
    kept = (d.withColumn("pr", F.percent_rank().over(w))
            .where(F.col("pr") <= 0.5)
            .select("doc_id", "lang", "text"))
    norm = kept.withColumn(
        "k", F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    keep_ids = norm.groupBy("k").agg(F.min("doc_id").alias("doc_id"))
    docs2 = norm.join(keep_ids.select("doc_id"), "doc_id", "left_semi")
    bucket = ((F.lit(SPLIT_A) * F.col("doc_id") + F.lit(SPLIT_B))
              % F.lit(SPLIT_M)) % 100
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))
    tagged = docs2.select("doc_id", "lang", "text", split.alias("split"))
    chunks = chunk_documents(tagged.select("doc_id", "text"), 32, 24)
    per_doc = (chunks.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("nc"),
                    F.sum("n_tokens").alias("nt")))
    return (tagged.join(per_doc, "doc_id", "left")
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(F.coalesce("nc", F.lit(0))).cast("long")
                 .alias("n_chunks"),
                 F.sum(F.coalesce("nt", F.lit(0))).cast("long")
                 .alias("n_tokens")))


def q_nested_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type / higher-order-function surface (the reference's
    type system has no arrays at all, SURVEY §1.2): per-order sorted
    quantity arrays folded with aggregate(), filtered with a lambda,
    and reduced with array_max/min — all inside whole-stage codegen;
    DuckDB twins via list_sort/list_aggregate/list_filter."""
    l = (_t(spark, sf_dir, "lineitem")
         .where(F.col("l_orderkey") % 7 == 0)
         .select("l_orderkey", F.col("l_quantity").cast("long").alias("q")))
    arr = (l.groupBy("l_orderkey")
           .agg(F.sort_array(F.collect_list("q")).alias("qs")))
    return arr.select(
        "l_orderkey",
        F.size("qs").alias("n_items"),
        F.aggregate("qs", F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("qty_sum"),
        F.size(F.filter("qs", lambda x: x > 25)).alias("n_big"),
        (F.array_max("qs") - F.array_min("qs")).cast("long")
        .alias("spread"))


def q_image_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 4x4 thumbnails through the REAL PNG decode
    path, with the re-encode roundtrip asserted in-kernel; one row
    per thumbnail pixel, value-checked against the fixture's closed
    pixel law (functions/multimodal.py:image_thumbnails)."""
    from adopt_spark.functions.multimodal import (
        image_thumbnails, synthetic_png_media)

    return image_thumbnails(
        synthetic_png_media(_media_keys(spark, sf_dir)), size=4)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE train -> encode roundtrip: every document tokenized with
    the 8 learned merges — per-doc word/char/BPE-token counts, one
    pure JVM projection (the merge table becomes a replace chain).
    The oracle RE-DERIVES the tokenizer from the same corpus rather
    than trusting the engine's merges (functions/bpe.py)."""
    from adopt_spark.functions.bpe import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    return bpe_encode(docs, bpe_train(docs, n_merges=8))


def q_bom_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilevel bill-of-materials explosion: total quantity + path
    count per (root, transitive part) over the deterministic acyclic
    BOM fixture — the weighted-transitive-closure DP where each level
    is one pair-aggregated equi-join, never a path materialization
    (functions/bom.py:bom_explode)."""
    from adopt_spark.functions.bom import bom_explode, synthetic_bom

    return bom_explode(synthetic_bom(_t(spark, sf_dir, "part")),
                       max_levels=16)


def q_onion_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onion decomposition (core-periphery): per-vertex (core, layer)
    where each simultaneous peel batch of the k-core cascade is one
    layer (algos/kcore.py:onion_layers — same incremental-peel plan
    as core_numbers, plus the batch counter). Oracle = the unrolled
    peel with removed-per-round EXCEPTs and a dense_rank over
    non-empty batches (oracle_gen.onion_layers_sql)."""
    from adopt_spark.algos.kcore import onion_layers

    return onion_layers(spark, derived_edges_sparse(spark, sf_dir))


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov over event values (click vs
    purchase) — the distribution-drift gate; exact integer-lattice
    sup statistic (functions/stats.py:ks_2sample)."""
    from adopt_spark.functions.stats import ks_2sample

    return ks_2sample(_t(spark, sf_dir, "events"),
                      "event_type", "value", "click", "purchase")


def q_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank test (view vs signup event values) with
    average-rank ties and tie-corrected z."""
    from adopt_spark.functions.stats import mann_whitney_u

    return mann_whitney_u(_t(spark, sf_dir, "events"),
                          "event_type", "value", "view", "signup")


def q_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t test on mean event value, click vs
    error — the A/B-lift significance primitive."""
    from adopt_spark.functions.stats import welch_ttest

    return welch_ttest(_t(spark, sf_dir, "events"),
                       "event_type", "value", "click", "error")


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-style CUSUM drawup over the daily mean event value — the
    change-point drift monitor (6 dp lattice before every cumulative
    pass)."""
    from adopt_spark.functions.stats import cusum_drift

    ev = _t(spark, sf_dir, "events")
    return cusum_drift(ev, F.date_format("ts", "yyyy-MM-dd"), "value")


def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-user activity (event
    count) and per-user mean value (6 dp-quantized before ranking so
    tie blocks agree across engines)."""
    from adopt_spark.functions.stats import spearman_corr

    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("double").alias("x"),
             F.round(F.avg("value"), 6).alias("y")))
    return spearman_corr(per_user, "x", "y")


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over user activity spans: duration =
    days between a user's first and last event; a user whose last
    event predates the corpus end by at least a day is an observed
    churn, the rest are right-censored at the corpus boundary.
    Product-limit curve at death times, 6 dp
    (functions/stats.py:km_survival)."""
    from adopt_spark.functions.stats import km_survival

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"))
    span = ev.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1"))
    gmax = ev.agg(F.max("d").alias("dmax"))
    spans = (span.crossJoin(F.broadcast(gmax))
             .select(F.datediff("d1", "d0").alias("duration"),
                     F.when(F.col("d1") <= F.date_sub("dmax", 1), 1)
                      .otherwise(0).alias("observed")))
    return km_survival(spans)


_CORR_PAIRS = [("l_quantity", "l_extendedprice"),
               ("l_quantity", "l_discount"),
               ("l_extendedprice", "l_discount")]


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem numeric columns from
    exact moment sums (n·Σxy − ΣxΣy over the root of the variance
    products) — one scan builds every pair's moments, 6 dp."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    cols = sorted({c for p in _CORR_PAIRS for c in p})
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for x, y in _CORR_PAIRS:
        aggs.append(F.sum(F.col(x) * F.col(y)).alias(f"sp_{x}_{y}"))
    m = li.agg(*aggs)
    # one row -> three rows via explode, so the single scan/aggregate
    # is shared (a union of selects would recompute it per branch)
    structs = []
    for x, y in _CORR_PAIRS:
        n, sx, sy = F.col("n"), F.col(f"s_{x}"), F.col(f"s_{y}")
        sxx, syy = F.col(f"ss_{x}"), F.col(f"ss_{y}")
        sxy = F.col(f"sp_{x}_{y}")
        structs.append(F.struct(
            F.lit(x).alias("x_col"), F.lit(y).alias("y_col"),
            F.round((n * sxy - sx * sy)
                    / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                    6).alias("corr")))
    return (m.select("n", F.explode(F.array(*structs)).alias("p"))
            .select("p.x_col", "p.y_col", "n", "p.corr"))


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary of the orders table: per column —
    rows, nulls, distincts, numeric min/max (6 dp) and string/date
    min/max (ISO) in typed columns; one scan, one aggregate."""
    o = _t(spark, sf_dir, "orders")
    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols + str_cols + ["o_orderdate"]:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nul_{c}"),
            F.countDistinct(F.col(c)).alias(f"dst_{c}"),
        ]
    for c in num_cols:
        aggs += [F.round(F.min(c), 6).alias(f"mn_{c}"),
                 F.round(F.max(c), 6).alias(f"mx_{c}")]
    for c in str_cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    aggs += [F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("mn_dt"),
             F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("mx_dt")]
    m = o.agg(*aggs)
    # one row -> one row per column via explode (shared single scan)
    structs = []
    for c in num_cols:
        structs.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"nul_{c}").alias("n_null"),
            F.col(f"dst_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").cast("double").alias("min_num"),
            F.col(f"mx_{c}").cast("double").alias("max_num"),
            F.lit(None).cast("string").alias("min_str"),
            F.lit(None).cast("string").alias("max_str")))
    for c in str_cols:
        structs.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"nul_{c}").alias("n_null"),
            F.col(f"dst_{c}").alias("n_distinct"),
            F.lit(None).cast("double").alias("min_num"),
            F.lit(None).cast("double").alias("max_num"),
            F.col(f"mn_{c}").alias("min_str"),
            F.col(f"mx_{c}").alias("max_str")))
    structs.append(F.struct(
        F.lit("o_orderdate").alias("col_name"),
        F.col("nul_o_orderdate").alias("n_null"),
        F.col("dst_o_orderdate").alias("n_distinct"),
        F.lit(None).cast("double").alias("min_num"),
        F.lit(None).cast("double").alias("max_num"),
        F.col("mn_dt").alias("min_str"), F.col("mx_dt").alias("max_str")))
    return (m.select("n_rows", F.explode(F.array(*structs)).alias("p"))
            .select("p.col_name", "n_rows", "p.n_null", "p.n_distinct",
                    "p.min_num", "p.max_num", "p.min_str", "p.max_str"))


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets (A-priori shape shared
    with q_frequent_triples): frequent part pairs (support ≥ 3) emit
    both directed rules with confidence = supp(AB)/supp(A) and
    lift = N·supp(AB)/(supp(A)·supp(B)), 6 dp."""
    li = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("b"),
                  F.col("l_partkey").alias("i")).distinct())
    n_baskets = li.select("b").distinct().count()
    item_n = li.groupBy("i").agg(F.count(F.lit(1)).alias("ni"))
    freq1 = item_n.where(F.col("ni") >= 3).select("i")
    lif = li.join(freq1, "i", "left_semi")
    a, b = lif.alias("a"), lif.alias("b")
    pairs = (a.join(b, (F.col("a.b") == F.col("b.b"))
                    & (F.col("a.i") < F.col("b.i")))
             .groupBy(F.col("a.i").alias("i1"), F.col("b.i").alias("i2"))
             .agg(F.count(F.lit(1)).alias("support"))
             .where(F.col("support") >= 3))
    both = pairs.select("i1", "i2", "support").unionAll(
        pairs.select(F.col("i2").alias("i1"), F.col("i1").alias("i2"),
                     "support"))
    scored = (both
              .join(item_n.select(F.col("i").alias("i1"),
                                  F.col("ni").alias("n1")), "i1")
              .join(item_n.select(F.col("i").alias("i2"),
                                  F.col("ni").alias("n2")), "i2"))
    return scored.select(
        F.col("i1").alias("antecedent"), F.col("i2").alias("consequent"),
        "support",
        F.round(F.col("support") / F.col("n1"), 6).alias("confidence"),
        F.round(F.col("support") * F.lit(n_baskets)
                / (F.col("n1") * F.col("n2")), 6).alias("lift"))


def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information of the (returnflag × linestatus) contingency
    table — the entropy-based twin of q_chi_square: exact integer
    cells/margins, MI = Σ (o/n)·ln(o·n/(rn·cn)), one 6 dp statistic."""
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("l_returnflag").agg(F.sum("o").alias("rn"))
    cols = cells.groupBy("l_linestatus").agg(F.sum("o").alias("cn"))
    tot = cells.agg(F.sum("o").alias("n"))
    ex = (cells.join(rows, "l_returnflag").join(cols, "l_linestatus")
          .crossJoin(F.broadcast(tot)))
    return ex.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("n").alias("n_rows"),
        F.round(F.sum((F.col("o") / F.col("n"))
                      * F.log(F.col("o") * F.col("n")
                              / (F.col("rn") * F.col("cn")).cast("double"))),
                6).alias("mi_nats"))


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user total event value (engagement
    inequality): 6 dp-quantized totals, deterministic rank ties via
    (x, user_id), G = 2·Σ i·x_i / (n·Σx) − (n+1)/n, 6 dp. The rank
    window runs over the per-user frame (|users| rows — the same
    documented collapsed-frame bound as the ECDF statistics)."""
    per_user = (_t(spark, sf_dir, "events")
                .groupBy("user_id")
                .agg(F.round(F.sum("value"), 6).alias("x")))
    w = Window.orderBy("x", "user_id")
    ranked = per_user.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(2 * F.sum(F.col("i") * F.col("x"))
                / (F.count(F.lit(1)) * F.sum("x"))
                - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)),
                6).alias("gini"))


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked sorted-neighborhood candidate generation + exact
    word-set Jaccard scoring (functions/dedup.py:
    sorted_neighborhood_pairs) — the third blocking strategy in the
    dedup ladder next to prefix filtering and minhash LSH."""
    from adopt_spark.functions.dedup import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(_t(spark, sf_dir, "documents"))


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surprisal under the add-one-smoothed corpus
    bigram LM (functions/text.py:bigram_logprob) — the
    sequential-context quality score beside t_unigram_logprob."""
    from adopt_spark.functions.text import bigram_logprob

    return bigram_logprob(_t(spark, sf_dir, "documents"))


def q_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance of the LPA communities on the
    sparse planted graph: cut edges over min(volume, total−volume) on
    the undirected edge set — the community-quality metric beside
    a_lpa_modularity; oracle composes the unrolled LPA label SQL.
    (The dense derived graph LPA-collapses to one community — no
    conductance to measure — so this runs on the sparse fixture.)"""
    from adopt_spark.queries.oracle_gen import LPA_ITERS

    e = derived_edges_sparse(spark, sf_dir)
    labels, _ = label_propagation(spark, e, max_iter=LPA_ITERS)
    und = (e.select(F.least("sid", "tid").alias("u"),
                    F.greatest("sid", "tid").alias("v"))
           .where(F.col("u") != F.col("v")).distinct())
    lu = labels.select(F.col("v").alias("u"), F.col("label").alias("la"))
    lv = labels.select(F.col("v").alias("v"), F.col("label").alias("lb"))
    ej = und.join(lu, "u").join(lv, "v")
    tot = und.agg((2 * F.count(F.lit(1))).alias("tot"))
    vol = (ej.select(F.col("la").alias("label"))
           .unionAll(ej.select(F.col("lb").alias("label")))
           .groupBy("label").agg(F.count(F.lit(1)).alias("vol")))
    cut = (ej.where(F.col("la") != F.col("lb"))
           .select(F.col("la").alias("label"))
           .unionAll(ej.where(F.col("la") != F.col("lb"))
                     .select(F.col("lb").alias("label")))
           .groupBy("label").agg(F.count(F.lit(1)).alias("cut")))
    out = (vol.join(cut, "label", "left")
           .crossJoin(F.broadcast(tot))
           .select("label", "vol",
                   F.coalesce(F.col("cut"), F.lit(0)).alias("cut"),
                   F.round(F.coalesce(F.col("cut"), F.lit(0))
                           / F.least(F.col("vol"),
                                     F.col("tot") - F.col("vol"))
                           .cast("double"), 6).alias("conductance")))
    return out.where(F.least(F.col("vol"),
                             F.col("tot") - F.col("vol")) > 0)


def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous power-law MLE over the degree distribution (Clauset
    et al. 2009, eq. 3.1): α = 1 + n / Σ ln(d/dmin) with dmin = 1 —
    the principled tail-exponent estimate beside the Zipf OLS fit.
    Exact integer degrees; one 6 dp statistic."""
    e = derived_edges_sparse(spark, sf_dir)
    sym = (e.select(F.col("sid").alias("v"), F.col("tid").alias("w"))
           .unionAll(e.select(F.col("tid").alias("v"),
                              F.col("sid").alias("w")))
           .where(F.col("v") != F.col("w")).distinct())
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    return deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.max("d").alias("max_degree"),
        F.round(1.0 + F.count(F.lit(1))
                / F.sum(F.log(F.col("d").cast("double"))), 6).alias("alpha"))


def q_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event 3-step sequences: two leads over each user's
    time-ordered stream, one (e1,e2,e3) aggregate — the sequence-mining
    extension of e_transitions. Ties excluded by the exact (ts,
    event_id) ordering; top 20 with deterministic tie-break."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"), "event_id")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    tri = (ev.withColumn("e2", F.lead("event_type", 1).over(w))
           .withColumn("e3", F.lead("event_type", 2).over(w))
           .where(F.col("e3").isNotNull()))
    agg = tri.groupBy(F.col("event_type").alias("e1"), "e2", "e3").agg(
        F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.desc("n"), "e1", "e2", "e3")
    return (agg.withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= 20)
            .select("rank", "e1", "e2", "e3", "n"))


def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of event value: per-dow mean,
    its ratio to the grand mean (the multiplicative seasonal index),
    and the count — the STL-lite diagnostic for telemetry feeds."""
    ev = _t(spark, sf_dir, "events").select(
        F.dayofweek(F.col("ts").cast("timestamp")).alias("dow"), "value")
    per = ev.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("dow_mean"))
    grand = per.agg(
        (F.sum(F.col("dow_mean") * F.col("n")) / F.sum("n")).alias("gm"))
    return (per.crossJoin(F.broadcast(grand))
            .select("dow", "n", "dow_mean",
                    F.round(F.col("dow_mean") / F.col("gm"), 6)
                     .alias("seasonal_index")))


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch purchase attribution: for every
    purchase, credit the event type of the user's first and of the
    most recent preceding event (exact (ts, event_id) ordering);
    output the credit matrix — the marketing-analytics staple over
    the events stream."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"), "event_id")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = (ev.withColumn("first_touch", F.first("event_type").over(w))
           .withColumn("prev", F.lag("event_type", 1).over(w)))
    pur = (seq.where(F.col("event_type") == "purchase")
           .where(F.col("prev").isNotNull()))
    return pur.groupBy(
        F.col("first_touch"), F.col("prev").alias("last_touch")).agg(
        F.count(F.lit(1)).alias("n_purchases"))


def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join with watermark-driven
    timeout emission (streaming/enrich.py:
    stream_stream_click_purchase_outer); oracle = batch interval join
    plus the deterministic final-watermark expiry rule."""
    from adopt_spark.streaming.enrich import stream_stream_click_purchase_outer

    return stream_stream_click_purchase_outer(spark, sf_dir)


# Deterministic split hash: same LCG-mod-Mersenne-prime family as the
# KMV/weighted-sample twins (portable integer arithmetic, identical in
# any engine — the reason these oracles never need xxhash).
SPLIT_A, SPLIT_B, SPLIT_M = 2654435761, 104729, 2147483647


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10 by hash bucket of
    doc_id) + the split-integrity report every training pipeline
    needs: per (split, lang) doc counts and token sums. Reproducible
    at any parallelism — the split is a pure function of the id."""
    d = _t(spark, sf_dir, "documents")
    bucket = ((F.lit(SPLIT_A) * F.col("doc_id") + F.lit(SPLIT_B))
              % F.lit(SPLIT_M)) % 100
    toks = F.when(F.length(F.trim(F.col("text"))) == 0, 0).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+")))
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))
    return (d.select(split.alias("split"), "lang", toks.alias("t"))
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("t").alias("n_tokens")))


def q_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: for every event, the count of the same
    user's events in the preceding hour (inclusive), histogrammed —
    the interval-frame window feature (ROWS frames are exercised by
    r_window_analytics; this is the RANGE-with-time-bound shape)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t"))
    w = (Window.partitionBy("user_id").orderBy("t")
         .rangeBetween(-3_600_000_000, 0))
    per_event = ev.withColumn("n_1h", F.count(F.lit(1)).over(w))
    return (per_event.groupBy("n_1h")
            .agg(F.count(F.lit(1)).alias("n_events")))


def q_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outliers per event type: exact interpolated
    quartiles, fences q1 − 1.5·IQR / q3 + 1.5·IQR on the 6 dp
    lattice, round-then-compare at the fence boundary — the
    rank-based sibling of e_anomaly_zscore."""
    ev = _t(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("q3"))
    fenced = q.select(
        "event_type", "q1", "q3",
        F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 6)
         .alias("lo"),
        F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 6)
         .alias("hi"))
    joined = ev.select("event_type", F.round("value", 6).alias("v")) \
        .join(fenced, "event_type")
    return joined.groupBy("event_type", "q1", "q3").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("v") < F.col("lo"))
                     | (F.col("v") > F.col("hi")), 1).otherwise(0))
         .alias("n_outliers"))


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface readability metrics per language: mean word length,
    mean sentence length (words), and a Flesch-style linear proxy on
    those two — pure Column arithmetic over exact token/sentence
    counts, 6 dp after the per-language means."""
    d = _t(spark, sf_dir, "documents")
    txt = F.trim(F.col("text"))
    words = F.when(F.length(txt) == 0, 0).otherwise(
        F.size(F.split(txt, r"\s+")))
    # sentences = terminator runs; at least 1 for non-empty text
    sents = F.greatest(
        F.size(F.split(txt, r"[.!?]+")) - 1, F.lit(1))
    chars = F.length(F.regexp_replace(txt, r"\s+", ""))
    per_doc = (d.where(F.length(txt) > 0)
               .select("lang", words.alias("w"), sents.alias("s"),
                       chars.alias("c")))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("c") / F.sum("w").cast("double"), 6)
         .alias("mean_word_len"),
        F.round(F.sum("w") / F.sum("s").cast("double"), 6)
         .alias("mean_sentence_len"),
        F.round(206.835
                - 1.015 * (F.sum("w") / F.sum("s").cast("double"))
                - 84.6 * (F.sum("c") / F.sum("w").cast("double") / 3.0),
                6).alias("flesch_proxy"))


def q_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user concentration: share of all events generated by the
    top 1% / 10% most active users (ceil of user count), plus the
    totals — the skew companion of e_gini, computed from one user
    aggregate + one rank window over |users| rows."""
    per = (_t(spark, sf_dir, "events").groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("c")))
    w = Window.orderBy(F.desc("c"), "user_id")
    ranked = per.withColumn("rn", F.row_number().over(w))
    tot = per.agg(F.sum("c").alias("n_events"),
                  F.count(F.lit(1)).alias("n_users"))
    j = ranked.crossJoin(F.broadcast(tot))
    return j.agg(
        F.max("n_users").alias("n_users"),
        F.max("n_events").alias("n_events"),
        F.round(F.sum(F.when(
            F.col("rn") <= F.ceil(F.col("n_users") / 100.0), F.col("c"))
            .otherwise(0)) / F.max("n_events").cast("double"), 6)
         .alias("top1pct_share"),
        F.round(F.sum(F.when(
            F.col("rn") <= F.ceil(F.col("n_users") / 10.0), F.col("c"))
            .otherwise(0)) / F.max("n_events").cast("double"), 6)
         .alias("top10pct_share"))


def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: rank parts by
    exact DECIMAL revenue, classify by cumulative share (A < 0.5,
    B < 0.8, C rest — share computed on the 6 dp lattice), report
    class sizes and revenue totals. Window runs over |parts| rows."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
              .cast("decimal(18,4)")).alias("rev"))
    tot = rev.agg(F.sum("rev").alias("tot"))
    w = Window.orderBy(F.desc("rev"), "l_partkey") \
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = (rev.crossJoin(F.broadcast(tot))
           .withColumn("cum_share",
                       F.round((F.sum("rev").over(w) / F.col("tot"))
                               .cast("double"), 6)))
    cls = cum.withColumn(
        "abc_class",
        F.when(F.col("cum_share") <= 0.5, "A")
         .when(F.col("cum_share") <= 0.8, "B").otherwise("C"))
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev").cast("decimal(18,4)").alias("class_revenue"))


def q_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per priority: exact day lags
    from the order/lineitem date join, count/mean/p50/p95, 6 dp —
    the fulfillment-SLA profile (join + one percentile aggregate)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd"))
    lag = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .select("o_orderpriority",
                   F.datediff("sd", "od").cast("double").alias("lag")))
    return lag.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("lag"), 6).alias("mean_days"),
        F.round(F.percentile("lag", F.lit(0.5)), 6).alias("p50_days"),
        F.round(F.percentile("lag", F.lit(0.95)), 6).alias("p95_days"))


def q_rank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement between two centrality rankings — top-50 fixed-step
    PageRank vs top-50 in-degree: intersection size and Jaccard. Both
    top sets select on the 6 dp-rounded score with id tie-breaks, so
    the sets are engine-deterministic (a_pagerank_fixed proves the
    6 dp rank lattice agrees everywhere)."""
    from adopt_spark.queries.oracle_gen import PR_ITERS

    e = derived_edges(spark, sf_dir)
    ranks, _ = pagerank(spark, e, tol=0.0, max_iter=PR_ITERS)
    top_pr = (ranks.select("v", F.round("rank", 6).alias("r"))
              .orderBy(F.desc("r"), F.asc("v")).limit(50).select("v"))
    top_deg = (e.groupBy(F.col("tid").alias("v"))
               .agg(F.count(F.lit(1)).alias("c"))
               .orderBy(F.desc("c"), F.asc("v")).limit(50).select("v"))
    inter = top_pr.join(top_deg, "v").count()
    return spark.createDataFrame(
        [(50, int(inter), round(inter / (100 - inter), 6))],
        "k int, n_common long, jaccard double")


def q_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 reconstruction-error report over the embedding corpus:
    per-value MSE, max |error|, and the value count — the QA entry
    for the compression rung s_knn_sq8 searches with. Fully
    distributed: the per-dimension (lo, hi) stats stay a DataFrame
    joined back on dimension (never collected), codes use the exact
    s_knn_sq8 arithmetic."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "i", F.col("x").cast("double").alias("x"))
    st = ex.groupBy("i").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    j = ex.join(st, "i")
    code = F.when(F.col("hi") > F.col("lo"), F.greatest(
        F.lit(0.0), F.least(F.lit(255.0), F.floor(
            (F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo"))
            * 255.0 + 0.5).cast("double")))).otherwise(F.lit(0.0))
    dq = F.col("lo") + code / 255.0 * (F.col("hi") - F.col("lo"))
    err = j.select((F.col("x") - dq).alias("e"))
    return err.agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.avg(F.col("e") * F.col("e")) * 1e6, 6)
         .alias("mse_x1e6"),
        F.round(F.max(F.abs("e")), 6).alias("max_abs_err"))


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of users: recency (days since last event at
    the corpus horizon), frequency (event count), monetary (6 dp
    value sum) → quintile scores via ntile with id tie-breaks →
    segment histogram over the 125 (r,f,m) cells that have users."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "value")
    horizon = ev.agg(F.max("d").alias("h"))
    rfm = (ev.groupBy("user_id")
           .agg(F.max("d").alias("last_d"),
                F.count(F.lit(1)).alias("f"),
                F.round(F.sum("value"), 6).alias("m"))
           .crossJoin(F.broadcast(horizon))
           .select("user_id", F.datediff("h", "last_d").alias("r"),
                   "f", "m"))
    # quintiles: LOW recency days = best, HIGH freq/monetary = best
    wr = Window.orderBy(F.asc("r"), "user_id")
    wf = Window.orderBy(F.desc("f"), "user_id")
    wm = Window.orderBy(F.desc("m"), "user_id")
    scored = (rfm.withColumn("r_score", F.ntile(5).over(wr))
              .withColumn("f_score", F.ntile(5).over(wf))
              .withColumn("m_score", F.ntile(5).over(wm)))
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"))


def q_twohop_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-hop neighborhood size per vertex on the sparse graph
    (self excluded), histogrammed — the exact-k companion of the ANF
    sketch curve: one symmetric self-join + distinct + two counts."""
    e = derived_edges_sparse(spark, sf_dir)
    sym = (e.select(F.col("sid").alias("u"), F.col("tid").alias("v"))
           .unionAll(e.select(F.col("tid").alias("u"),
                              F.col("sid").alias("v")))
           .where(F.col("u") != F.col("v")).distinct())
    two = (sym.alias("a")
           .join(sym.alias("b"), F.col("a.v") == F.col("b.u"))
           .select(F.col("a.u").alias("u"), F.col("b.v").alias("w"))
           .where(F.col("u") != F.col("w")))
    reach = sym.select("u", F.col("v").alias("w")).unionAll(two).distinct()
    sizes = reach.groupBy("u").agg(F.count(F.lit(1)).alias("n2"))
    return sizes.groupBy("n2").agg(F.count(F.lit(1)).alias("n_vertices"))


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Originality score per document: the fraction of its distinct
    word 3-grams that occur in NO other document (corpus df = 1) —
    high = novel text, low = boilerplate; the inverse view of the
    dup-block mass report. Exact counts, 6 dp ratio."""
    d = _t(spark, sf_dir, "documents")
    t = F.split(F.trim(F.col("text")), r"\s+")
    pos = d.select(F.col("doc_id").alias("doc"),
                   F.posexplode(t).alias("i", "w")) \
        .where(F.col("w") != "")
    nxt1 = pos.select(F.col("doc"), (F.col("i") - 1).alias("i"),
                      F.col("w").alias("w2"))
    nxt2 = pos.select(F.col("doc"), (F.col("i") - 2).alias("i"),
                      F.col("w").alias("w3"))
    sh = (pos.join(nxt1, ["doc", "i"]).join(nxt2, ["doc", "i"])
          .select("doc", F.concat_ws(" ", "w", "w2", "w3").alias("s"))
          .distinct())
    df_ = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    j = sh.join(df_, "s")
    return (j.groupBy("doc")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                  .alias("n_unique"),
                 F.round(F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                         / F.count(F.lit(1)).cast("double"), 6)
                  .alias("novelty")))


def q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex eigenvector centrality (10 power-iteration
    supersteps, per-step L2 normalization) on the sparse graph —
    full vector vs the unrolled oracle recurrence, the strongest
    possible check (every vertex, every value)."""
    from adopt_spark.algos.eigen import EIGEN_ITERS, eigenvector_centrality

    e = derived_edges_sparse(spark, sf_dir)
    scores, _ = eigenvector_centrality(spark, e, max_iter=EIGEN_ITERS)
    return scores


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain (20
    power-iteration steps over the exact transition ratios; chain
    restricted to source states and row-renormalized so it is
    strictly stochastic) — the long-run behavioral profile on top of
    e_transitions; oracle = oracle_gen.markov_stationary_sql."""
    from adopt_spark.queries.oracle_gen import MARKOV_ITERS

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select(F.col("event_type").alias("src"),
                       F.lead("event_type").over(w).alias("dst"))
             .where(F.col("dst").isNotNull())
             .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n")))
    states = pairs.select(F.col("src").alias("state")).distinct()
    rp = pairs.join(states.withColumnRenamed("state", "dst"), "dst",
                    "left_semi")
    tot = rp.groupBy("src").agg(F.sum("n").alias("tot"))
    trans = (rp.join(tot, "src")
             .select("src", "dst", F.col("n").cast("double").alias("n"),
                     F.col("tot").cast("double").alias("tot"))
             .localCheckpoint(eager=True))
    k = states.count()
    pi = states.select("state", F.lit(1.0 / k).alias("pi"))
    for _ in range(MARKOV_ITERS):
        pi = (trans.join(pi, trans["src"] == pi["state"])
              .groupBy(F.col("dst").alias("_s"))
              .agg(F.sum(F.col("pi") * F.col("n") / F.col("tot"))
                   .alias("pi"))
              .withColumnRenamed("_s", "state"))
    return pi.select("state", F.round("pi", 6).alias("pi"))


SCD2_ASOF_DATE = "1995-06-15"


def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) read over the SCD2 dimension: the
    rows valid exactly at SCD2_ASOF_DATE — the query every
    slowly-changing dimension exists to answer; composes r_scd2_merge
    and filters its ISO-string validity window (string comparison is
    date order for ISO dates)."""
    d = F.lit(SCD2_ASOF_DATE)
    out = q_scd2(spark, sf_dir)
    return out.where((F.col("valid_from") <= d)
                     & (F.col("valid_to").isNull()
                        | (F.col("valid_to") > d)))


def q_component_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-connected-component internal density on the sparse graph:
    n vertices, m undirected edges, density = m / (n·(n−1)/2), 6 dp —
    the planted K25 clique stands out at density 1.0; composes the
    CC kernel with an edge-count join (oracle = the recursive-CTE
    reachability labels a_cc_sizes uses, extended with edge joins)."""
    e = derived_edges_sparse(spark, sf_dir)
    comp, _ = connected_components(spark, e)   # [v, component]
    und = (e.select(F.least("sid", "tid").alias("u"),
                    F.greatest("sid", "tid").alias("v"))
           .where(F.col("u") != F.col("v")).distinct())
    cu = comp.select(F.col("v").alias("u"), F.col("component").alias("cu"))
    cv = comp.select(F.col("v").alias("v"), F.col("component").alias("cv"))
    m = (und.join(cu, "u").join(cv, "v")
         .groupBy(F.col("cu").alias("component"))
         .agg(F.count(F.lit(1)).alias("m")))
    n = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    out = (n.join(m, "component", "left")
           .select("component", "n",
                   F.coalesce(F.col("m"), F.lit(0)).alias("m"))
           .where(F.col("n") >= 2))
    return out.select(
        "component", "n", "m",
        F.round(F.col("m") / (F.col("n") * (F.col("n") - 1) / 2.0), 6)
         .alias("density"))


def q_crosslang_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language 5-gram contamination: for each ordered language
    pair, how many distinct word 5-grams appear in BOTH languages'
    documents — the corpus-QA signal for template/boilerplate leakage
    across language splits (same shingle machinery as
    decontamination)."""
    d = _t(spark, sf_dir, "documents")
    t = F.split(F.trim(F.col("text")), r"\s+")
    pos = d.select(F.col("lang"), F.col("doc_id"),
                   F.posexplode(t).alias("i", "w")).where(F.col("w") != "")
    parts = [pos]
    for off in range(1, 5):
        parts.append(pos.select(
            "lang", "doc_id", (F.col("i") - off).alias("i"),
            F.col("w").alias(f"w{off}")))
    sh = parts[0]
    for p in parts[1:]:
        sh = sh.join(p, ["lang", "doc_id", "i"])
    grams = (sh.select(
        "lang", F.concat_ws(" ", "w", "w1", "w2", "w3", "w4").alias("s"))
        .distinct())
    a = grams.select(F.col("lang").alias("lang_a"), "s")
    b = grams.select(F.col("lang").alias("lang_b"), "s")
    return (a.join(b, "s")
            .where(F.col("lang_a") < F.col("lang_b"))
            .groupBy("lang_a", "lang_b")
            .agg(F.count(F.lit(1)).alias("n_shared")))


def q_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-burst profile per event type: the maximum events in any
    single minute, the minute it happened (earliest on ties), and the
    mean per-active-minute rate 6 dp — the rate-anomaly companion of
    the cadence stats."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm")
         .alias("minute"))
    per_min = ev.groupBy("event_type", "minute").agg(
        F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy(F.desc("c"), "minute")
    return (per_min.withColumn("rn", F.row_number().over(w))
            .groupBy("event_type")
            .agg(F.max("c").alias("peak_per_min"),
                 F.max(F.when(F.col("rn") == 1, F.col("minute")))
                  .alias("peak_minute"),
                 F.count(F.lit(1)).alias("active_minutes"),
                 F.round(F.sum("c") / F.count(F.lit(1)).cast("double"), 6)
                  .alias("mean_per_active_min")))


RECALL_KS = (1, 3, 5)


def q_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k curve (k = 1, 3, 5) of banded-LSH ANN vs brute-force
    ground truth — s_ann_recall's single point widened to the curve
    every ANN tuning loop actually reads; computed from the two
    oracle-checked top-5 rank lists."""
    emb = _t(spark, sf_dir, "embeddings")
    q = _queries_from_embeddings(emb)
    a = lsh_topk(emb, q, k=5, bits=12, bands=4) \
        .select("q_id", "vec_id", F.col("rank").alias("ra"))
    e = brute_force_topk(emb, q, k=5) \
        .select("q_id", "vec_id", F.col("rank").alias("re"))
    j = a.join(e, ["q_id", "vec_id"])
    rows = []
    for k in RECALL_KS:
        rows.append(j.agg(
            F.lit(k).cast("int").alias("k"),
            F.sum(F.when((F.col("ra") <= k) & (F.col("re") <= k), 1)
                  .otherwise(0)).alias("hits"),
            F.round(F.sum(F.when((F.col("ra") <= k) & (F.col("re") <= k),
                                 1).otherwise(0)) / (3.0 * k), 6)
             .alias("recall")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------- oracle SQL ------------------------------------------------

_TOKENS_SQL = ("CASE WHEN length(trim(text)) = 0 THEN 0 "
               "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END")

_QUALITY_SQL = f"""
CAST(round(
  0.4 * least(CAST({_TOKENS_SQL} AS DOUBLE) / 200.0, 1.0)
  + 0.3 * (1.0 - (CASE WHEN length(text) > 0
      THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
           / CAST(length(text) AS DOUBLE)
      ELSE 0.0 END))
  + 0.3 * ((CASE WHEN regexp_matches(lower(text), '\\bthe\\b') THEN 1.0 ELSE 0.0 END
          + CASE WHEN regexp_matches(lower(text), '\\ba\\b') THEN 1.0 ELSE 0.0 END
          + CASE WHEN regexp_matches(lower(text), '\\band\\b') THEN 1.0 ELSE 0.0 END
          + CASE WHEN regexp_matches(lower(text), '\\bof\\b') THEN 1.0 ELSE 0.0 END
          + CASE WHEN regexp_matches(lower(text), '\\bto\\b') THEN 1.0 ELSE 0.0 END) / 5.0)
, 4) AS DOUBLE)
""".strip()

ORACLES: dict[str, str] = {
    # graph motifs over the derived edge CTE
    "g_triangle_count": f"{_EDGE_CTE}\n{clique_sql(3)}",
    "g_4clique": f"{_EDGE_CTE}\n{clique_sql(4)}",
    "g_4cycle": f"{_EDGE_CTE}\n{cycle_sql(4)}",
    "g_5cycle": f"{_EDGE_CTE}\n{cycle_sql(5)}",
    "g_5clique": f"{_EDGE_CTE}\n{clique_sql(5)}",
    "g_6cycle": f"{_EDGE_CTE}\n{cycle_sql(6)}",
    "g_range_3clique": f"{_EDGE_CTE}\n{clique_sql(3, range_preds=_RANGE_PREDS)}",
    "g_range_4clique": f"{_EDGE_CTE}\n{clique_sql(4, range_preds=_RANGE_PREDS_4)}",
    "g_6clique": f"{_SPARSE_CTE}\n{clique_sql(6, edge_view='edge_sparse')}",
    "g_7clique": f"{_SPARSE_CTE}\n{clique_sql(7, edge_view='edge_sparse')}",
    "g_7cycle": f"{_SPARSE_CTE}\n{cycle_sql(7, edge_view='edge_sparse')}",
    "g_csr_triangles": f"{_EDGE_CTE}\nSELECT CAST(n AS BIGINT) AS n_triangles "
                       f"FROM ({clique_sql(3)})",
    "g_csr_4clique": f"{_EDGE_CTE}\nSELECT CAST(n AS BIGINT) AS n_cliques "
                     f"FROM ({clique_sql(4)})",
    "g_cogroup_triangles": f"{_EDGE_CTE}\nSELECT CAST(n AS BIGINT) AS n_triangles "
                           f"FROM ({clique_sql(3)})",
    "g_cogroup_5clique": f"{_SPARSE_CTE}\nSELECT CAST(n AS BIGINT) AS n_cliques "
                         f"FROM ({clique_sql(5, edge_view='edge_sparse')})",
    "g_auto_triangles": f"{_EDGE_CTE}\nSELECT CAST(n AS BIGINT) AS n_triangles "
                        f"FROM ({clique_sql(3)})",
    "g_cogroup_4cycle": f"{_EDGE_CTE}\nSELECT CAST(n AS BIGINT) AS n_cycles "
                        f"FROM ({cycle_sql(4)})",
    "g_degree_hist": f"{_EDGE_CTE}\nSELECT sid AS v, count(*) AS outdeg "
                     "FROM edge GROUP BY sid",
    "g_top_indegree": f"{_EDGE_CTE}\nSELECT tid AS v, count(*) AS indeg FROM edge "
                      "GROUP BY tid ORDER BY indeg DESC, v LIMIT 20",
    "g_edge_count": f"{_EDGE_CTE}\nSELECT count(*) AS n FROM edge",
    # relational
    "r_q1_pricing": """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(l_quantity), 4) AS DOUBLE) AS sum_qty,
               CAST(round(sum(l_extendedprice), 4) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS sum_disc_price,
               CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
               CAST(round(avg(l_discount), 4) AS DOUBLE) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    "r_filter_project": """
        SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        WHERE l_quantity >= 10 AND l_quantity <= 20 AND l_discount > 0.05""",
    "r_q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority""",
    "r_q12_shipmode": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag""",
    "r_q14_promo": """
        SELECT CAST(round(100.0
                   * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE)
                   AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""",
    "r_topk_orders": """
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice, 2) AS DOUBLE) AS price
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "r_group_having": """
        SELECT c_nationkey, count(*) AS n_cust FROM customer
        GROUP BY c_nationkey HAVING count(*) > 50""",
    "r_join_q3": """
        SELECT o_orderkey,
               CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND o_orderkey = l_orderkey
        GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "r_join_q5ish": """
        SELECT n_name,
               CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS revenue
        FROM region, nation, customer, orders, lineitem, supplier
        WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
          AND c_nationkey = n_nationkey AND o_custkey = c_custkey
          AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
          AND s_nationkey = c_nationkey
        GROUP BY n_name""",
    "r_semi_join": """
        SELECT c_custkey, c_nationkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "r_anti_join": """
        SELECT c_custkey, c_nationkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "r_outer_join": """
        SELECT n_name, count(c_custkey) AS n_cust
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name""",
    "r_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "r_case_expr": """
        SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS bucket, count(*) AS n
        FROM orders GROUP BY 1""",
    "r_like_filter": """
        SELECT p_brand, count(*) AS n FROM part
        WHERE p_name LIKE '%green%' OR p_type LIKE 'PROMO%'
        GROUP BY p_brand""",
    "r_date_extract": """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n_orders,
               CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
        FROM orders GROUP BY 1""",
    "r_window_rank": """
        SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 2""",
    "r_window_analytics": """
        SELECT o_custkey, o_orderkey, prev_price, next_price,
               CAST(running_cents AS BIGINT) AS running_cents,
               CAST(quartile AS INTEGER) AS quartile, cume
        FROM (
          SELECT o_custkey, o_orderkey,
                 lag(o_totalprice, 1) OVER w AS prev_price,
                 lead(o_totalprice, 1) OVER w AS next_price,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS running_cents,
                 ntile(4) OVER w AS quartile,
                 CAST(round(cume_dist() OVER w, 9) AS DOUBLE) AS cume
          FROM orders WHERE o_custkey % 100 = 0
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey))""",
    "r_union": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000""",
    "r_intersect": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000""",
    "r_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(round(sum(l_quantity), 4) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "r_cube": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "r_scalar_subquery": """
        SELECT o_orderstatus, count(*) AS n FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus""",
    "r_in_subquery": """
        SELECT c_custkey FROM customer WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey IN (
            SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))""",
    "r_agg_minmax": """
        SELECT c_nationkey,
               CAST(round(min(c_acctbal), 4) AS DOUBLE) AS min_bal,
               CAST(round(max(c_acctbal), 4) AS DOUBLE) AS max_bal,
               CAST(round(avg(c_acctbal), 4) AS DOUBLE) AS avg_bal,
               count(*) AS n
        FROM customer GROUP BY c_nationkey""",
    # events
    "e_event_agg": """
        SELECT event_type, count(*) AS n,
               CAST(round(sum(value), 4) AS DOUBLE) AS total_value,
               CAST(round(avg(value), 4) AS DOUBLE) AS avg_value
        FROM events GROUP BY event_type""",
    "e_event_hourly": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               count(*) AS n
        FROM events GROUP BY 1""",
    "e_stream_hourly": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n,
               CAST(round(sum(value), 4) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2""",
    "t_pii_scrub": r"""
        WITH aug AS (
            SELECT doc_id,
                   CASE WHEN doc_id < 20
                        THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.com see https://site'
                             || CAST(doc_id AS VARCHAR)
                             || '.example.org/page now'
                        ELSE text END AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                    AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, 'https?://[^\s]+'))
                    AS BIGINT) AS n_urls,
               CAST(length(regexp_replace(regexp_replace(t,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                    '<EMAIL>', 'g'), 'https?://[^\s]+', '<URL>', 'g'))
                    AS BIGINT) AS len_redacted
        FROM aug""",
    "r_lateral_top_order": """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) t ON true
        WHERE c.c_custkey < 200""",
    "r_unpivot_lineitem": """
        WITH wide AS (
            SELECT l_returnflag,
                   CAST(round(sum(l_quantity), 4) AS DOUBLE) AS sum_qty,
                   CAST(round(sum(l_extendedprice), 4) AS DOUBLE) AS sum_price,
                   CAST(round(avg(l_discount), 6) AS DOUBLE) AS avg_disc
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM wide
        UNION ALL
        SELECT l_returnflag, 'avg_disc', avg_disc FROM wide""",
    "r_grouping_sets": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(round(sum(l_extendedprice), 4) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_linestatus), ())""",
    "r_value_histogram": """
        SELECT CASE WHEN value < 0.0 THEN 0
                    WHEN value >= 500.0 THEN 26
                    ELSE CAST(floor(value / 20.0) AS BIGINT) + 1
               END AS bucket, count(*) AS n
        FROM events GROUP BY 1""",
    "t_zipf_fit": """
        WITH toks AS (
            SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
            FROM documents
        ), freq AS (
            SELECT term, count(*) AS freq FROM toks
            WHERE term <> '' GROUP BY term
        ), ranked AS (
            SELECT round(ln(CAST(row_number() OVER
                       (ORDER BY freq DESC, term ASC) AS DOUBLE)), 6) AS lr,
                   round(ln(CAST(freq AS DOUBLE)), 6) AS lf
            FROM freq
        )
        SELECT count(*) AS n_terms,
               CAST(round(regr_slope(lf, lr), 6) AS DOUBLE) AS slope,
               CAST(round(regr_intercept(lf, lr), 6) AS DOUBLE) AS intercept
        FROM ranked""",
    "e_stream_dedup": """
        SELECT event_type, count(*) AS n FROM events GROUP BY 1""",
    "e_stream_stream_join": """
        WITH pairs AS (
            SELECT c.user_id,
                   epoch_us(p.ts) // 1000000
                   - epoch_us(c.ts) // 1000000 AS lag_s
            FROM events c JOIN events p
              ON p.user_id = c.user_id
             AND c.event_type = 'click' AND p.event_type = 'purchase'
             AND p.ts >= c.ts
             AND p.ts <= c.ts + INTERVAL 60 MINUTE
        )
        SELECT user_id, count(*) AS n_pairs,
               min(lag_s) AS min_lag_s, max(lag_s) AS max_lag_s
        FROM pairs GROUP BY user_id""",
    "r_skyline": """
        SELECT p_partkey, p_size, p_retailprice
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice
                   OR q.p_size > p.p_size))
        ORDER BY p_partkey""",
    "g_assortativity": f"""{_EDGE_CTE},
        sym AS (
            SELECT sid AS v, tid AS nbr FROM edge
            UNION
            SELECT tid, sid FROM edge
        ), deg AS (
            SELECT v, count(*) AS deg FROM sym GROUP BY v
        ), mom AS (
            SELECT count(*) AS m,
                   CAST(sum(du.deg) AS BIGINT) AS sx,
                   CAST(sum(du.deg * du.deg) AS BIGINT) AS sxx,
                   CAST(sum(du.deg * dv.deg) AS BIGINT) AS sxy
            FROM sym s
            JOIN deg du ON du.v = s.v
            JOIN deg dv ON dv.v = s.nbr
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
               CAST(m / 2 AS BIGINT) AS n_edges,
               CAST(round((m * sxy - sx * sx)
                          / CAST(m * sxx - sx * sx AS DOUBLE), 6)
                    AS DOUBLE) AS assortativity
        FROM mom""",
    "g_avg_nbr_degree": f"""{_EDGE_CTE},
        sym AS (
            SELECT sid AS v, tid AS nbr FROM edge
            UNION
            SELECT tid, sid FROM edge
        ), deg AS (
            SELECT v, count(*) AS deg FROM sym GROUP BY v
        )
        SELECT s.v, any_value(d.deg) AS deg,
               CAST(round(avg(CAST(nd.deg AS DOUBLE)), 6) AS DOUBLE)
                   AS avg_nbr_deg
        FROM sym s
        JOIN deg d ON d.v = s.v
        JOIN deg nd ON nd.v = s.nbr
        GROUP BY s.v""",
    "g_rich_club": f"""{_EDGE_CTE},
        und AS (
            SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
            FROM edge WHERE sid <> tid
        ), deg AS (
            SELECT v, count(*) AS deg FROM (
                SELECT a AS v FROM und UNION ALL SELECT b FROM und
            ) GROUP BY v
        ), ks(k) AS (VALUES (1), (2), (4), (8), (16), (32), (64)),
        rich AS (
            SELECT ks.k, count(*) AS n_rich
            FROM ks JOIN deg ON deg.deg > ks.k GROUP BY ks.k
        ), ed AS (
            SELECT u.a, u.b, da.deg AS da, db.deg AS db
            FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b
        ), erich AS (
            SELECT ks.k, count(*) AS e_rich
            FROM ks JOIN ed ON ed.da > ks.k AND ed.db > ks.k GROUP BY ks.k
        )
        SELECT CAST(ks.k AS BIGINT) AS k,
               coalesce(rich.n_rich, 0) AS n_rich,
               coalesce(erich.e_rich, 0) AS e_rich,
               CASE WHEN coalesce(rich.n_rich, 0) >= 2
                    THEN CAST(round(coalesce(erich.e_rich, 0) * 2.0
                              / (rich.n_rich * (rich.n_rich - 1)), 6)
                              AS DOUBLE)
               END AS phi
        FROM ks LEFT JOIN rich ON rich.k = ks.k
        LEFT JOIN erich ON erich.k = ks.k""",
    "r_pivot_segment": """
        SELECT c_mktsegment,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment""",
    "e_stream_session_window": """
        WITH x AS (
          SELECT event_type, ts,
                 lag(ts) OVER (PARTITION BY event_type ORDER BY ts) AS prev
          FROM events
        ), y AS (
          SELECT event_type, ts,
                 CASE WHEN prev IS NULL
                           OR epoch_us(ts) - epoch_us(prev) > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM x
        ), z AS (
          SELECT event_type, ts,
                 sum(brk) OVER (PARTITION BY event_type ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM y
        )
        SELECT event_type,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts) + INTERVAL 30 MINUTE,
                        '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n
        FROM z GROUP BY event_type, sid""",
    "e_stream_sliding": """
        SELECT strftime(date_trunc('hour', ts) - o * INTERVAL 1 HOUR,
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n,
               CAST(round(sum(value), 4) AS DOUBLE) AS total_value
        FROM events CROSS JOIN (VALUES (0), (1)) offs(o)
        GROUP BY 1, 2""",
    "e_stream_enrich": """
        SELECT c_mktsegment, event_type, count(*) AS n,
               CAST(round(sum(value), 4) AS DOUBLE) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2""",
    "e_stream_sessionize": """
        WITH x AS (
          SELECT event_type, ts,
                 lag(ts) OVER (PARTITION BY event_type ORDER BY ts) AS prev
          FROM events
        ), y AS (
          SELECT event_type, ts,
                 CASE WHEN prev IS NULL
                           OR epoch_us(ts) - epoch_us(prev) > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM x
        ), z AS (
          SELECT event_type, ts,
                 sum(brk) OVER (PARTITION BY event_type ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM y
        )
        SELECT event_type, CAST(sid AS BIGINT) AS session_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events
        FROM z GROUP BY 1, 2""",
    # documents / text
    "t_token_count": f"SELECT doc_id, CAST({_TOKENS_SQL} AS BIGINT) AS n_tokens "
                     "FROM documents",
    "t_bpe_tokens": f"""
        SELECT doc_id,
               CAST({_TOKENS_SQL}
                    + (length(text)
                       - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                    AS BIGINT) AS n_bpe_tokens
        FROM documents""",
    "t_exact_dedup": """
        SELECT min(doc_id) AS doc_id, sha256(text) AS text_sha,
               count(*) AS n_copies
        FROM documents GROUP BY sha256(text)""",
    "t_quality": f"SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents",
    "t_doc_stats_by_lang": f"""
        SELECT lang, count(*) AS n_docs,
               CAST(sum({_TOKENS_SQL}) AS BIGINT) AS total_tokens,
               CAST(round(avg(length(text)), 4) AS DOUBLE) AS avg_chars
        FROM documents GROUP BY lang""",
    # embeddings: exact knn via unnest dot product
    "s_knn_bruteforce": """
        WITH ex AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings
        ), norms AS (
          SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id
        ), dots AS (
          SELECT q.vec_id AS q_id, e.vec_id AS vec_id, sum(q.x * e.x) AS dot
          FROM ex q JOIN ex e USING (i)
          WHERE q.vec_id < 3
          GROUP BY q.vec_id, e.vec_id
        ), scored AS (
          SELECT d.q_id, d.vec_id,
                 d.dot / (nq.nrm * ne.nrm) AS cos_raw
          FROM dots d
          JOIN norms nq ON nq.vec_id = d.q_id
          JOIN norms ne ON ne.vec_id = d.vec_id
        )
        SELECT q_id, vec_id, CAST(round(cos_raw, 6) AS DOUBLE) AS cos,
               CAST(rnk AS INTEGER) AS rank
        FROM (SELECT q_id, vec_id, cos_raw,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos_raw DESC, vec_id) AS rnk
              FROM scored)
        WHERE rnk <= 5""",
}

# Full-probe IVF degenerates to exact search, so it shares the
# brute-force oracle — a value-level check, not rows-only.
ORACLES["s_knn_ivf"] = ORACLES["s_knn_bruteforce"]

# ---- round-2 additions: cycle kernels, selectivity families, CC, jaccard
ORACLES.update({
    "g_cogroup_5cycle": f"{_EDGE_CTE}\nSELECT CAST(n AS BIGINT) AS n_cycles "
                        f"FROM ({cycle_sql(5)})",
    "g_cogroup_6cycle": f"{_SPARSE_CTE}\nSELECT CAST(n AS BIGINT) AS n_cycles "
                        f"FROM ({cycle_sql(6, edge_view='edge_sparse')})",
    "g_cogroup_7cycle": f"{_SPARSE_CTE}\nSELECT CAST(n AS BIGINT) AS n_cycles "
                        f"FROM ({cycle_sql(7, edge_view='edge_sparse')})",
    "g_auto_cycle4": f"{_EDGE_CTE}\nSELECT CAST(n AS BIGINT) AS n_cycles "
                     f"FROM ({cycle_sql(4)})",
    "g_range_4cycle": f"{_EDGE_CTE}\n{cycle_sql(4, range_preds=_RANGE_PREDS_C4)}",
    "g_range_5cycle": f"{_EDGE_CTE}\n{cycle_sql(5, range_preds=_RANGE_PREDS_C5)}",
    "g_sel_3clique": f"{_EDGE_CTE}\n{selectivity_clique_sql(3, bounds=_SEL_3CLIQUE)}",
    "g_sel_4cycle": f"{_EDGE_CTE}\n{selectivity_cycle_sql(4, bounds=_SEL_4CYCLE)}",
    "g_sel_5cycle": f"{_EDGE_CTE}\n{selectivity_cycle_sql(5, bounds=_SEL_5CYCLE)}",
    "g_sel_6clique": f"{_SPARSE_CTE}\n"
                     f"{selectivity_clique_sql(6, bounds=_SEL_6CLIQUE_SPARSE, edge_view='edge_sparse')}",
    "g_sel_4clique": f"{_EDGE_CTE}\n{selectivity_clique_sql(4, bounds=_SEL_4CLIQUE)}",
    "g_sel_5clique": f"{_SPARSE_CTE}\n"
                     f"{selectivity_clique_sql(5, bounds=_SEL_5CLIQUE_SPARSE, edge_view='edge_sparse')}",
    # connected components: min-reachable-id labels via recursive CTE
    # over the symmetrized edge set — sizes per component. (RECURSIVE
    # must head the whole WITH clause, so the edge CTE is inlined.)
    "a_cc_sizes": f"""WITH RECURSIVE edge AS (
{DERIVED_EDGE_SQL}
        ), sym AS (SELECT sid AS u, tid AS v FROM edge
                   UNION SELECT tid, sid FROM edge)
        , reach(v, r) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM sym)
            UNION
            SELECT s.v, w.r FROM reach w JOIN sym s ON s.u = w.v
        )
        SELECT comp AS component, count(*) AS size FROM (
            SELECT v, min(r) AS comp FROM reach GROUP BY v
        ) GROUP BY comp""",
    "t_ngram_jaccard": """
        WITH toks AS (
            SELECT doc_id AS d,
                   regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
            WHERE doc_id < 40 AND len(regexp_split_to_array(trim(text), '\\s+')) >= 3
        ), pos AS (
            SELECT d, generate_subscripts(t, 1) AS i, t FROM toks
        ), sh AS (
            SELECT DISTINCT d, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
            FROM pos WHERE i + 2 <= len(t)
        ), sizes AS (
            SELECT d, count(*) AS n FROM sh GROUP BY d
        ), inter AS (
            SELECT x.d AS a, y.d AS b, count(*) AS i
            FROM sh x JOIN sh y ON x.s = y.s AND x.d < y.d
            GROUP BY 1, 2
        )
        SELECT p.a, p.b,
               CAST(round(CAST(COALESCE(i.i, 0) AS DOUBLE)
                          / (p.na + p.nb - COALESCE(i.i, 0)), 4) AS DOUBLE)
                   AS jaccard
        FROM (SELECT sa.d AS a, sb.d AS b, sa.n AS na, sb.n AS nb
              FROM sizes sa JOIN sizes sb ON sa.d < sb.d) p
        LEFT JOIN inter i ON i.a = p.a AND i.b = p.b""",
    "t_prefix_jaccard": """
        WITH tok AS (
            SELECT DISTINCT doc_id AS d, w
            FROM documents,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS u(w)
            WHERE w <> ''
        ), sizes AS (
            SELECT d, count(*) AS n FROM tok GROUP BY d
        ), inter AS (
            SELECT x.d AS a, y.d AS b, count(*) AS i
            FROM tok x JOIN tok y ON x.w = y.w AND x.d < y.d
            GROUP BY 1, 2
        )
        SELECT i.a, i.b,
               CAST(round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6)
                    AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.d = i.a
        JOIN sizes sb ON sb.d = i.b
        WHERE round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) >= 0.95
        ORDER BY i.a, i.b""",
    "e_asof_join": """
        WITH clicks AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ), views AS (
            SELECT user_id, ts, max(event_id) AS view_id
            FROM events WHERE event_type = 'view' GROUP BY 1, 2
        )
        SELECT c.event_id, c.user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
               v.view_id AS prev_view_id
        FROM clicks c ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND v.ts <= c.ts""",
    "r_band_join": """
        WITH o AS (SELECT o_orderkey, o_totalprice FROM orders
                   WHERE o_orderkey < 200)
        SELECT a.o_orderkey AS a, b.o_orderkey AS b,
               CAST(round(abs(a.o_totalprice - b.o_totalprice), 4) AS DOUBLE)
                   AS diff
        FROM o a, o b
        WHERE a.o_orderkey < b.o_orderkey
          AND abs(a.o_totalprice - b.o_totalprice) <= 2000.0""",
    "m_frame_sample": """
        WITH m AS (
            SELECT o_orderkey AS media_id,
                   CAST(o_orderkey % 97 + 3 AS INTEGER) AS n_frames
            FROM orders WHERE o_orderkey % 100 < 5
        )
        SELECT media_id,
               CAST(unnest(generate_series(0, n_frames - 1, 10)) AS INTEGER)
                   AS frame_idx
        FROM m""",
})

# ---- round-3 additions: every formerly rows-only entry gets a
# value-level oracle (generated in oracle_gen.py — fixed-iteration
# unrolling, bounded-depth peeling, shared-hash replication,
# closed-form codec payloads).
from adopt_spark.queries import oracle_gen as _og
from adopt_spark.functions import editdist as _edj
from adopt_spark.functions import transitions as _trn
from adopt_spark.functions import text as _txt
from adopt_spark.functions import zorder as _zo
from adopt_spark.functions import scd as _scd
from adopt_spark.functions import entity as _ent
from adopt_spark.functions import dedup as _dd

ORACLES.update({
    "t_near_dup_clusters": _og.NEAR_DUP_CLUSTERS_SQL,
    "r_q6_forecast": """
        SELECT CAST(round(sum(l_extendedprice * l_discount), 4) AS DOUBLE)
               AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
    "r_q10_returns": """
        SELECT c_custkey, c_name, c_nationkey,
               CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY c_custkey, c_name, c_nationkey
        ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "r_q13_order_dist": """
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1-%'
            GROUP BY c_custkey)
        GROUP BY c_count""",
    "r_q16_supplier_cnt": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_type NOT LIKE 'PROMO%' AND p_size < 15
        GROUP BY p_brand, p_type, p_size""",
    "r_q18_large_orders": """
        WITH big AS (
            SELECT l_orderkey,
                   CAST(round(sum(l_quantity), 4) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 150)
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice, 2) AS DOUBLE) AS price, sum_qty
        FROM orders JOIN big ON o_orderkey = l_orderkey""",
    "r_q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""",
    "r_q8_market_share": """
        SELECT year(o_orderdate) AS o_year,
               CAST(round(
                   sum(CASE WHEN n1.n_name = 'NATION_3'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE)
                   AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        GROUP BY year(o_orderdate)""",
    "r_q17_small_qty_revenue": """
        WITH per_part AS (
            SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
            FROM lineitem GROUP BY l_partkey)
        SELECT CAST(round(sum(l_extendedprice) / 7.0, 2) AS DOUBLE)
                   AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN per_part ON lineitem.l_partkey = per_part.l_partkey
        WHERE p_brand = 'Brand#12' AND l_quantity < qty_cut""",
    "r_q19_disjunctive": """
        SELECT CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 30)""",
    "r_q22_idle_customers": """
        WITH cut AS (
            SELECT avg(c_acctbal) AS cut FROM customer WHERE c_acctbal > 0.0)
        SELECT c_mktsegment, count(*) AS numcust,
               CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS totacctbal
        FROM customer, cut
        WHERE c_acctbal > cut
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_mktsegment""",
    "r_q2_min_cost_supp": """
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey),
        eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE')
        SELECT CAST(round(s_acctbal, 2) AS DOUBLE) AS s_acctbal, s_name,
               n_name, p_partkey, p_name,
               CAST(round(unit_cost, 4) AS DOUBLE) AS cost
        FROM supply
        JOIN eu ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        WHERE p_size = 2 AND p_type = 'LARGE'
          AND unit_cost = (
              SELECT min(s2.unit_cost) FROM supply s2
              JOIN eu e2 ON s2.l_suppkey = e2.s_suppkey
              WHERE s2.l_partkey = supply.l_partkey)""",
    "r_q9_profit": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(round(sum(l_extendedprice * (1 - l_discount)
                              - 0.1 * p_retailprice * l_quantity), 2) AS DOUBLE)
                   AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY n_name, year(o_orderdate)""",
    "r_q11_important_parts": """
        WITH nat_li AS (
            SELECT l_partkey,
                   CAST(l_extendedprice * l_quantity AS DECIMAL(18,4)) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_5', 'NATION_9'))
        SELECT l_partkey, CAST(round(CAST(sum(val) AS DOUBLE), 4) AS DOUBLE)
                   AS value
        FROM nat_li
        GROUP BY l_partkey
        HAVING sum(val) > (SELECT sum(val) * CAST(0.0012 AS DECIMAL(8,4))
                           FROM nat_li)""",
    "r_q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               CAST(round(CAST(total_revenue AS DOUBLE), 4) AS DOUBLE)
                   AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""",
    "r_q20_part_promotion": """
        SELECT s_name, CAST(round(s_acctbal, 2) AS DOUBLE) AS s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2'
          AND s_suppkey IN (
              SELECT l_suppkey FROM lineitem
              JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'red%'
              GROUP BY l_suppkey
              HAVING sum(l_quantity) > 50.0)""",
    "r_percentiles": """
        SELECT l_returnflag,
               CAST(round(quantile_cont(l_quantity, 0.5), 6) AS DOUBLE) AS p50_qty,
               CAST(round(quantile_cont(l_quantity, 0.9), 6) AS DOUBLE) AS p90_qty,
               CAST(round(quantile_cont(l_extendedprice, 0.99), 4) AS DOUBLE)
                   AS p99_price
        FROM lineitem GROUP BY l_returnflag""",
    "r_q21_waiting_supplier": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND n_name IN ('NATION_1', 'NATION_4')
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name""",
    "a_pagerank_top": _og.pagerank_fixed_sql(DERIVED_EDGE_SQL, top=20),
    "a_mis_luby": _og.mis_fixed_sql(DERIVED_EDGE_SQL),
    "a_matching": _og.matching_fixed_sql(DERIVED_EDGE_SQL),
    "a_mst_forest": _og.boruvka_sql(DERIVED_EDGE_SQL),
    "a_densest": _og.densest_fixed_sql(SPARSE_EDGE_SQL),
    "t_edit_join": _edj.edit_join_oracle_sql("SELECT * FROM part", "p_name", 2),
    "e_transitions": _trn.transitions_oracle_sql(),
    "r_scd2_merge": f"""SELECT c_custkey, seg,
       strftime(valid_from, '%Y-%m-%d') AS valid_from,
       strftime(valid_to, '%Y-%m-%d') AS valid_to
FROM ({_scd.scd2_merge_sql(
    '''SELECT c_custkey, c_mktsegment AS seg,
              DATE '1992-01-01' AS valid_from,
              CAST(NULL AS DATE) AS valid_to
       FROM customer''',
    '''WITH agg AS (
           SELECT o_custkey AS c_custkey,
                  max(o_orderdate) AS eff_date,
                  max(o_orderpriority) AS pri,
                  count(*) AS n
           FROM orders GROUP BY o_custkey
       ), upd0 AS (
           SELECT a.c_custkey,
                  CASE WHEN a.n % 3 = 0 THEN c.c_mktsegment
                       ELSE a.pri END AS seg,
                  a.eff_date
           FROM agg a JOIN customer c USING (c_custkey)
       )
       SELECT * FROM upd0
       UNION ALL
       SELECT c_custkey + 10000000, 'NEWSEG', eff_date
       FROM upd0 WHERE c_custkey < 10''',
    'c_custkey', 'seg')})""",
    "t_unigram_logprob": _txt.UNIGRAM_LOGPROB_SQL,
    "e_anomaly_zscore": """WITH stats AS (
    SELECT user_id, avg(value) AS m, stddev_samp(value) AS s
    FROM events GROUP BY user_id
), z AS (
    SELECT e.event_id, e.user_id, e.value,
           round((e.value - st.m) / st.s, 6) AS z
    FROM events e JOIN stats st USING (user_id)
    WHERE st.s IS NOT NULL AND st.s > 0
)
SELECT event_id, user_id, value, z FROM z WHERE abs(z) > 3""",
    "r_robust_stats": """WITH med AS (
    SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med,
           count(*) AS n
    FROM events GROUP BY event_type
)
SELECT e.event_type, CAST(any_value(m.n) AS BIGINT) AS n,
       any_value(m.med) AS med,
       round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
FROM events e JOIN med m USING (event_type)
GROUP BY e.event_type""",
    "r_zorder_code": f"""SELECT p_partkey,
       {_zo.morton_sql('(p_partkey % 1024)', '(p_size % 1024)', bits=10)} AS z
FROM part""",
    "a_anf_diameter": _og.anf_sql(DERIVED_EDGE_SQL),
    "g_motif_census4": _og.census_sql(SPARSE_EDGE_SQL),
    "s_knn_pq": _og.knn_pq_sql(),
    # full-probe IVF-PQ ≡ PQ (see q_knn_ivfpq): same ADC oracle
    "s_knn_ivfpq": _og.knn_pq_sql(),
    "t_export_shards": _export_shard_plan_sql(16),
    "t_chunk_docs": _chunk_documents_sql(32, 24),
    "m_audio_silence": _og.audio_silence_sql(16, 64),
    "a_pagerank_fixed": _og.pagerank_fixed_sql(DERIVED_EDGE_SQL),
    "a_lpa_communities": _og.lpa_fixed_sql(DERIVED_EDGE_SQL),
    "a_core_numbers": _og.core_numbers_sql(SPARSE_EDGE_SQL),
    "a_onion_layers": _og.onion_layers_sql(SPARSE_EDGE_SQL),
    "r_bom_explode": _bom_explode_sql(16),
    "t_bpe_merges": _bpe_train_sql(8),
    "t_bpe_encode": _bpe_encode_sql(8),
    "t_reshard_plan": _reshard_plan_sql(16, 24),
    "g_negative_samples": _negative_samples_sql(SPARSE_EDGE_SQL, 3, 8),
    "g_lp_eval": _lp_eval_sql(SPARSE_EDGE_SQL),
    "g_triangle_null": f"""WITH edge AS MATERIALIZED (
{SPARSE_EDGE_SQL}
), lt AS MATERIALIZED (
    SELECT DISTINCT sid, tid FROM edge WHERE sid < tid
), tri AS (
    SELECT count(*) AS t
    FROM lt e1 JOIN lt e2 ON e2.sid = e1.sid AND e1.tid < e2.tid
    JOIN lt e3 ON e3.sid = e1.tid AND e3.tid = e2.tid
), deg AS (
    SELECT v, count(*) AS d
    FROM (SELECT sid AS v FROM lt UNION ALL SELECT tid FROM lt)
    GROUP BY v
), mom AS (
    SELECT CAST(sum(d) AS DOUBLE) AS s1,
           CAST(sum(d * (d - 1)) AS DOUBLE) AS s2
    FROM deg
)
SELECT CAST(t AS BIGINT) AS n_triangles,
       CAST(round((s2 / s1) * (s2 / s1) * (s2 / s1) / 6.0, 6)
            AS DOUBLE) AS expected_null,
       CAST(round(t / ((s2 / s1) * (s2 / s1) * (s2 / s1) / 6.0), 6)
            AS DOUBLE) AS ratio
FROM tri, mom""",
    "g_orbit3": f"""WITH edge AS MATERIALIZED (
{SPARSE_EDGE_SQL}
), lt AS MATERIALIZED (
    SELECT DISTINCT sid, tid FROM edge WHERE sid < tid
), sym AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM lt UNION ALL SELECT tid, sid FROM lt
), deg AS MATERIALIZED (
    SELECT v, count(*) AS deg FROM sym GROUP BY v
), tris AS (
    SELECT e1.sid AS a, e1.tid AS b, e2.tid AS c
    FROM lt e1 JOIN lt e2 ON e2.sid = e1.sid AND e1.tid < e2.tid
    JOIN lt e3 ON e3.sid = e1.tid AND e3.tid = e2.tid
), vt AS (
    SELECT v, count(*) AS tri FROM (
        SELECT a AS v FROM tris UNION ALL
        SELECT b FROM tris UNION ALL
        SELECT c FROM tris) GROUP BY v
), nds AS (
    SELECT s.v, sum(d.deg) AS nds
    FROM sym s JOIN deg d ON d.v = s.nbr GROUP BY s.v
)
SELECT deg.v,
       CAST(deg.deg AS BIGINT) AS o0,
       CAST(coalesce(nds.nds, 0) - deg.deg
            - 2 * coalesce(vt.tri, 0) AS BIGINT) AS o1,
       CAST(deg.deg * (deg.deg - 1) // 2
            - coalesce(vt.tri, 0) AS BIGINT) AS o2,
       CAST(coalesce(vt.tri, 0) AS BIGINT) AS o3
FROM deg LEFT JOIN nds USING (v) LEFT JOIN vt USING (v)""",
    "s_maxsim_topk": """
WITH ex AS MATERIALIZED (
  SELECT vec_id, (generate_subscripts(embedding, 1) - 1) // 8 AS s,
         (generate_subscripts(embedding, 1) - 1) % 8 AS o,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), subnorms AS MATERIALIZED (
  SELECT vec_id, s, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY vec_id, s
), dots AS MATERIALIZED (
  SELECT q.vec_id AS q_id, q.s AS qs, e.vec_id AS vec_id, e.s AS ds,
         sum(q.x * e.x) AS dot
  FROM ex q JOIN ex e ON q.o = e.o
  WHERE q.vec_id < 3
  GROUP BY q.vec_id, q.s, e.vec_id, e.s
), percos AS (
  SELECT d.q_id, d.qs, d.vec_id,
         d.dot / (nq.nrm * ne.nrm) AS cos
  FROM dots d
  JOIN subnorms nq ON nq.vec_id = d.q_id AND nq.s = d.qs
  JOIN subnorms ne ON ne.vec_id = d.vec_id AND ne.s = d.ds
), best AS (
  SELECT q_id, vec_id, qs, max(cos) AS m
  FROM percos GROUP BY q_id, vec_id, qs
), sc AS (
  SELECT q_id, vec_id, sum(m) AS score_raw FROM best GROUP BY q_id, vec_id
)
SELECT q_id, vec_id, CAST(round(score_raw, 6) AS DOUBLE) AS score,
       CAST(rnk AS INTEGER) AS rank
FROM (SELECT q_id, vec_id, score_raw,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score_raw DESC, vec_id) AS rnk
      FROM sc)
WHERE rnk <= 5
""".strip(),
    "r_nested_hof": """
WITH a AS (
    SELECT l_orderkey,
           list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
    FROM lineitem WHERE l_orderkey % 7 = 0
    GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(qs) AS INTEGER) AS n_items,
       CAST(list_aggregate(qs, 'sum') AS BIGINT) AS qty_sum,
       CAST(len(list_filter(qs, x -> x > 25)) AS INTEGER) AS n_big,
       CAST(list_aggregate(qs, 'max') - list_aggregate(qs, 'min')
            AS BIGINT) AS spread
FROM a
""".strip(),
    "m_image_thumbs": """
WITH m AS (
    SELECT o_orderkey AS media_id,
           CAST(o_orderkey % 23 + 8 AS BIGINT) AS w,
           CAST(o_orderkey % 17 + 8 AS BIGINT) AS h
    FROM orders WHERE o_orderkey % 100 < 2
)
SELECT media_id, CAST(r AS INTEGER) AS r, CAST(c AS INTEGER) AS c,
       CAST((media_id * 31 + ((r * h // 4) * w + (c * w // 4)) * 7) % 256
            AS BIGINT) AS px
FROM m, unnest(generate_series(0, 3)) AS tr(r),
        unnest(generate_series(0, 3)) AS tc(c)
""".strip(),
    "t_lang_id": _og.lang_id_sql(),
    "t_fingerprint": _og.FINGERPRINT_GROUPS_SQL,
    "t_minhash_near_dup": _og.MINHASH_ASCII_JACCARD_SQL,
    "t_simhash_pairs": _og.SIMHASH_MD5_PAIRS_SQL,
    "s_knn_lsh": _og.knn_lsh_sql(),
    "s_embedding_near_dup": _og.embedding_near_dup_sql(),
    "m_media_features": _og.MEDIA_FEATURES_SQL,
    "m_jpeg_features": _og.JPEG_FEATURES_SQL,
    "m_audio_features": _og.AUDIO_FEATURES_SQL,
    # same law, WAV-container-encoded fixture: the real wav_codec path
    # must reproduce the identical closed form
    "m_wav_features": _og.AUDIO_FEATURES_SQL,
})
