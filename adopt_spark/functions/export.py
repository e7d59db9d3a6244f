"""Training-data export sharding — the last step of the LLM-corpus
pipeline (dedup → quality-gate → split → SHARD → write).

A trainer consumes the corpus as N shard files whose assignment and
within-shard order must be (a) deterministic at any parallelism so a
re-run produces byte-identical shards, (b) pseudo-random so no shard
is biased by ingestion order, source, or language, and (c) balanced so
data-parallel readers finish together. ``shard_plan`` computes the
assignment + per-shard manifest; ``sharded_docs`` returns the assigned
rows themselves, ordered, ready for a partitioned write
(``df.repartition(n, "shard")`` then ``sortWithinPartitions``).

Determinism: the order key is a multiplicative-LCG permutation of the
doc id, ``okey = (A*doc_id + B) mod M`` with M prime — a pure function
of the id, exactly reproducible in ANSI SQL by the DuckDB oracle (the
same device the dataset-split operator uses; Spark's xxhash64 cannot
be replayed on the oracle side). In production the key can be swapped
for ``F.xxhash64`` without touching the plan shape.

Scale shape: one projection + one 32-way (n_shards-way) hash
aggregation for the manifest — a single shuffle of manifest-width
rows, map-side combined. The integrity checksum is an
order-independent SUM of per-doc key values in decimal(38,0)
(distributive — no sorted fold, no collect_list of the shard), so a
1000-executor run aggregates it map-side like any other sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Same prime-modulus LCG family as the dataset-split operator; distinct
# constants so shard assignment and split assignment are independent.
SHARD_A, SHARD_B, SHARD_M = 2654435789, 94906249, 2147483647


def _order_key(id_col: str):
    # decimal(38,0) intermediate: A*id overflows int64 once ids pass
    # ~2^33 (ANSI mode throws, it doesn't wrap) — the oracle side uses
    # HUGEINT for the same reason
    a = F.lit(SHARD_A).cast("decimal(38,0)")
    return (a * F.col(id_col) + F.lit(SHARD_B)) % F.lit(SHARD_M)


def sharded_docs(docs: DataFrame, n_shards: int = 16,
                 id_col: str = "doc_id") -> DataFrame:
    """Rows + (shard, okey): shard = okey mod n_shards; within-shard
    order = okey ascending (ties impossible: the LCG is a bijection on
    [0, M) and ids are unique upstream of export)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    okey = _order_key(id_col)
    return (docs.withColumn("okey", okey.cast("long"))
            .withColumn("shard", (F.col("okey") % n_shards).cast("int")))


def shard_plan(docs: DataFrame, n_shards: int = 16, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-shard export manifest:

    [shard, n_docs, n_tokens, n_bytes, min_okey, max_okey, key_checksum]

    n_tokens is the whitespace token count (the split operator's
    convention), n_bytes the text length; min/max okey bound the
    shard's order-key range and key_checksum = SUM(okey) as
    decimal(38,0) — an order-independent, distributive integrity
    digest a consumer can recompute shard-by-shard.
    """
    toks = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    return (sharded_docs(docs, n_shards, id_col)
            .select("shard", "okey", toks.alias("t"),
                    F.length(text_col).alias("b"))
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("t").alias("n_tokens"),
                 F.sum("b").alias("n_bytes"),
                 F.min("okey").alias("min_okey"),
                 F.max("okey").alias("max_okey"),
                 F.sum(F.col("okey").cast("decimal(38,0)"))
                  .cast("decimal(38,0)").alias("key_checksum")))


def shard_plan_sql(n_shards: int = 16) -> str:
    """DuckDB replica of shard_plan over the ``documents`` view."""
    return f"""
WITH s AS (
    SELECT ({SHARD_A}::HUGEINT * doc_id + {SHARD_B}) % {SHARD_M} AS okey,
           CAST((({SHARD_A}::HUGEINT * doc_id + {SHARD_B}) % {SHARD_M})
                % {n_shards} AS INTEGER) AS shard,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS t,
           length(text) AS b
    FROM documents
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS n_tokens,
       CAST(sum(b) AS BIGINT) AS n_bytes,
       CAST(min(okey) AS BIGINT) AS min_okey,
       CAST(max(okey) AS BIGINT) AS max_okey,
       CAST(sum(okey) AS HUGEINT) AS key_checksum
FROM s GROUP BY shard
""".strip()


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    stride: int = 48, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Fixed-length token-window chunking with overlap — the standard
    LLM-pretraining prep that turns variable-length documents into
    training sequences of at most ``chunk_tokens`` whitespace tokens,
    sliding by ``stride`` (stride < chunk_tokens => overlapping
    context windows; stride == chunk_tokens => disjoint).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``;
    ``n_chunks = 1`` when ``n <= chunk_tokens`` else
    ``ceil((n - chunk_tokens) / stride) + 1`` — every token lands in
    at least one chunk, no empty trailing chunk is emitted, and blank
    documents contribute no rows. Output: (id, chunk_idx, n_tokens,
    chunk_text).

    Plan shape: one projection (split + size), one ``sequence``
    explode (fan-out = chunks per doc, bounded by max doc length /
    stride), one slice + concat per row — all JVM codegen, zero
    Python, no shuffle at all (chunking is row-local). At 100 TB the
    operator is a pure map stage; the follow-on shard/pack step
    (shard_plan) owns the one shuffle.
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError(
            f"chunk_tokens and stride must be >= 1, got "
            f"{chunk_tokens}/{stride}")
    t = F.trim(F.col(text_col))
    toks = F.split(t, r"\s+")
    n = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(toks))
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1
    ).cast("int")
    base = (docs
            .select(F.col(id_col), toks.alias("_toks"), n.alias("_n"),
                    n_chunks.alias("_nc"))
            .where(F.col("_n") > 0))
    idx = F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias(
        "chunk_idx")
    out = base.select(id_col, "_toks", "_n", idx)
    piece = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1,
                    chunk_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"))


def chunk_documents_sql(chunk_tokens: int = 64, stride: int = 48,
                        source: str = "documents") -> str:
    """DuckDB replica of chunk_documents over ``source`` (a view name
    or parenthesized subquery with doc_id/text; same whitespace
    tokenizer as the token_count twin; DuckDB lists are 1-indexed,
    list_slice bounds are inclusive)."""
    return f"""
WITH base AS (
    SELECT doc_id,
           regexp_split_to_array(trim(text), '\\s+') AS toks,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+'))
           END AS n
    FROM {source}
), sized AS (
    SELECT doc_id, toks, n,
           CASE WHEN n <= {chunk_tokens} THEN 1
                ELSE CAST(ceil((n - {chunk_tokens}) * 1.0 / {stride})
                          AS BIGINT) + 1 END AS nc
    FROM base WHERE n > 0
), exploded AS (
    SELECT doc_id, toks, n, unnest(generate_series(0, nc - 1)) AS ci
    FROM sized
)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, ci * {stride} + 1,
                           least(ci * {stride} + {chunk_tokens}, n)))
            AS BIGINT) AS n_tokens,
       list_aggregate(list_slice(toks, ci * {stride} + 1,
                                 least(ci * {stride} + {chunk_tokens}, n)),
                      'string_agg', ' ') AS chunk_text
FROM exploded
""".strip()


def reshard_plan(docs: DataFrame, n_old: int = 16, n_new: int = 24,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Data-migration planner for growing/shrinking the export shard
    count: per (old_shard, new_shard) cell, how many documents and
    tokens MOVE under the deterministic LCG assignment — the copy
    matrix an orchestrator sizes its transfer jobs from (modulo
    resharding moves most keys; the matrix quantifies exactly which
    lanes carry what). One projection + one (old, new) hash aggregate
    with map-side combine; ``moved`` = the shard id changed."""
    if n_old < 1 or n_new < 1:
        raise ValueError(
            f"shard counts must be >= 1, got {n_old}/{n_new}")
    okey = _order_key(id_col).cast("long")
    toks = F.when(F.length(F.trim(F.col(text_col))) == 0, 0).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    return (docs.select((okey % n_old).cast("int").alias("old_shard"),
                        (okey % n_new).cast("int").alias("new_shard"),
                        toks.alias("t"))
            .groupBy("old_shard", "new_shard")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("t").cast("long").alias("n_tokens"))
            .withColumn("moved", F.col("old_shard") != F.col("new_shard")))


def reshard_plan_sql(n_old: int = 16, n_new: int = 24) -> str:
    """DuckDB replica of reshard_plan over the ``documents`` view."""
    okey = f"(({SHARD_A}::HUGEINT * doc_id + {SHARD_B}) % {SHARD_M})"
    return f"""
WITH s AS (
    SELECT CAST({okey} % {n_old} AS INTEGER) AS old_shard,
           CAST({okey} % {n_new} AS INTEGER) AS new_shard,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+'))
           END AS t
    FROM documents
)
SELECT old_shard, new_shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS n_tokens,
       old_shard <> new_shard AS moved
FROM s GROUP BY old_shard, new_shard
""".strip()
