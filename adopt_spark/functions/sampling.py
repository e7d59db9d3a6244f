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

from pyspark.sql import Column, DataFrame, functions as F

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
