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
