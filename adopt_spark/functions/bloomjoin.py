"""Bloom-filter-accelerated semi join (pre-shuffle row pruning).

At 100 TB the dominant cost of ``fact SEMI JOIN dim-subset`` is
shuffling fact rows that can never match. The classic fix — the one
Spark itself applies as "runtime row-level filtering" when statistics
allow — is to build a Bloom filter over the build side's keys, ship
the (kilobytes-sized) bitset to every probe task, and drop
non-members BEFORE the join shuffle. This module implements it as
pure DataFrame algebra so the plan is inspectable and the pruning is
testable:

  * build: each build key sets ``N_PROBES`` bits chosen by the repo's
    shared exact multiplicative hashes (functions/sketch.py family —
    BIGINT-exact, engine-replicable). The bitset materializes as ONE
    row holding an ``array<long>`` of ``m_bits/64`` words: bits are
    OR-combined by a hash aggregation on word index (map-side partial
    agg → at most m/64 rows per partition cross the wire), densified
    against ``spark.range`` and assembled with
    ``sort_array(collect_list(struct(...)))`` — never a driver
    collect, never a Python loop.
  * probe: ``crossJoin(broadcast(bitset_row))`` + JVM-side
    ``element_at / bitwiseAND`` membership tests. Rows failing any
    probe are discarded in the scan stage, inside WholeStageCodegen.
  * verify: Bloom filters admit false positives, so the survivors
    still flow through the exact ``left_semi`` join — the result is
    BIT-IDENTICAL to the plain semi join (oracle = plain SQL semi
    join); only the shuffle volume changes. No false negatives by
    construction (tested).

Default sizing: m_bits = 2^16, 2 probes. For ~10^4 build keys that
is ~2.4 bits set per 6.5 bits — false-positive rate ≈ 2-4%, i.e. the
pre-shuffle filter removes ≥96% of non-matching fact rows while the
bitset itself is 8 KiB. At a real 100-TB scale you would size
``m_bits`` to ~10 bits/key (still MBs for 10^7 keys — broadcastable).

Reference parity: ADOPT's LFTJ avoids this problem class by total
in-memory indexing; on a shuffle-based engine the Bloom pre-filter is
the equivalent "never touch rows that cannot join" move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Two independent exact multiplicative hashes (same family and
# overflow envelope as functions/sketch.py: A*key + B < 2^63 for
# keys < ~4e9; both moduli are primes < 2^31 so the products of the
# second stage stay exact too).
_PROBES = (
    (2_654_435_761, 104_729, 2_147_483_647),
    (1_779_033_703, 2_246_822_519, 2_147_483_629),
)
N_PROBES = len(_PROBES)


def _bit_index(key: Column, probe: int, m_bits: int) -> Column:
    a, b, m = _PROBES[probe]
    return F.pmod(F.pmod(F.lit(a) * key.cast("long") + F.lit(b), F.lit(m)),
                  F.lit(int(m_bits)))


def bloom_bitset(keys: DataFrame, key_col: str,
                 m_bits: int = 1 << 16) -> DataFrame:
    """One-row DataFrame[bits: array<long>] — the dense Bloom bitset.

    Fully distributed: per-probe bit positions explode from the key
    set, OR-combine per 64-bit word in one hash agg, densify against
    ``spark.range(m_bits/64)`` so ``element_at`` indexing works, and
    assemble in word order via sort_array(collect_list(struct)).
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    k = F.col(key_col)
    idx = [_bit_index(k, p, m_bits) for p in range(N_PROBES)]
    per_probe = [
        keys.select((i / 64).cast("long").alias("word"),
                    F.pmod(i, F.lit(64)).cast("int").alias("bit"))
        for i in idx
    ]
    bits = per_probe[0]
    for extra in per_probe[1:]:
        bits = bits.unionAll(extra)
    words = bits.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("w"))
    spark = keys.sparkSession
    dense = (spark.range(n_words).withColumnRenamed("id", "word")
             .join(words, "word", "left")
             .select("word", F.coalesce("w", F.lit(0).cast("long"))
                     .alias("w")))
    return dense.agg(
        F.transform(F.sort_array(F.collect_list(F.struct("word", "w"))),
                    lambda s: s["w"]).alias("bits"))


def bloom_prune(df: DataFrame, key_col: str, bitset: DataFrame,
                m_bits: int = 1 << 16) -> DataFrame:
    """Keep only rows whose key passes every Bloom probe.

    May keep false positives; never drops a true member.
    """
    k = F.col(key_col)
    pruned = df.crossJoin(F.broadcast(bitset))
    cond = F.lit(True)
    for p in range(N_PROBES):
        pruned = pruned.withColumn(f"__i{p}", _bit_index(k, p, m_bits))
        cond = cond & F.expr(
            f"(element_at(bits, CAST(__i{p} / 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT),"
            f"             CAST(pmod(__i{p}, 64) AS INT))) != 0")
    drop = ["bits"] + [f"__i{p}" for p in range(N_PROBES)]
    return pruned.where(cond).drop(*drop)


def bloom_semi_join(big: DataFrame, big_key: str,
                    small: DataFrame, small_key: str,
                    m_bits: int = 1 << 16) -> DataFrame:
    """``big LEFT SEMI JOIN small`` with a Bloom pre-filter.

    Result is exactly the plain semi join (the Bloom stage only
    prunes rows before the shuffle; survivors are re-verified by the
    exact join).
    """
    bitset = bloom_bitset(small.select(small_key), small_key, m_bits)
    pruned = bloom_prune(big, big_key, bitset, m_bits)
    keys = small.select(F.col(small_key).alias("__bk")).distinct()
    return (pruned.join(keys, pruned[big_key] == F.col("__bk"),
                        "left_semi"))
