"""Distributed heavy hitters: Misra-Gries candidates + exact verify.

Finds every word whose corpus frequency is at least p/q of all tokens
— the φ-heavy-hitters problem — WITHOUT a full-cardinality groupBy.

Two stages, the mergeable-summary shape (Misra-Gries '82; merged
summaries per Agarwal et al., "Mergeable Summaries", PODS'12):

1. CANDIDATES: each partition runs a k-counter Misra-Gries sketch
   over its tokens in one Arrow-batched pass (`mapInPandas`, numpy
   value_counts per batch folded into a dict capped at k). MG
   guarantees any item with partition count > n_p/k survives that
   partition, so by pigeonhole any item with GLOBAL count > N/k
   survives in at least one partition — the union of per-partition
   survivor sets is a superset of the true heavy hitters whenever
   the report threshold p/q ≥ 1/k. The shuffle carries at most
   k rows per partition regardless of input size.
2. VERIFY: exact counts for the candidate set only, via a broadcast
   semi-join of the token stream against the (≤ k·partitions)-row
   candidate list, then an integer-exact filter cnt * q >= N * p
   (no float threshold, so Spark and the SQL oracle agree bitwise).

The same candidates-then-exact-verify pattern the minhash near-dup
pipeline uses (functions/dedup.py): the sketch bounds the work, the
verify stage makes the OUTPUT exact — which is what lets a plain SQL
GROUP-BY/HAVING oracle check it value-for-value.

Tokenization matches functions/text.py: lowercase, split on runs of
whitespace, drop empties — replicated in the DuckDB oracle
(registry._ARR_CTE).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _mg_partition(k: int):
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in it:
            for w, c in pdf["w"].value_counts().items():
                c = int(c)
                if w in counters:
                    counters[w] += c
                elif len(counters) < k:
                    counters[w] = c
                else:
                    # decrement-by-min generalizes MG's decrement-all
                    # to batched arrivals: subtract min(c, current
                    # minimum) from everyone, evicting zeros, until
                    # either c is absorbed or a slot frees up.
                    while c > 0:
                        m = min(counters.values())
                        d = min(c, m)
                        counters = {x: n - d for x, n in counters.items()
                                    if n - d > 0}
                        c -= d
                        if len(counters) < k:
                            if c > 0:
                                counters[w] = c
                            break
        yield pd.DataFrame({"w": list(counters.keys())})
    return run


def heavy_hitters(docs: DataFrame, p: int = 1, q: int = 30,
                  text_col: str = "text", k: int = 64) -> DataFrame:
    """Words with count * q >= N_tokens * p, with exact counts.

    Returns DataFrame[w string, cnt bigint], exact. Requires
    p/q >= 1/k for the MG superset guarantee (enforced).
    """
    if p * k < q:
        raise ValueError(f"threshold {p}/{q} below sketch guarantee 1/{k}")
    toks = (docs.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        .alias("w")).where(F.col("w") != ""))
    cand = (toks.mapInPandas(_mg_partition(k), "w string")
            .distinct())
    exact = (toks.join(F.broadcast(cand), "w", "left_semi")
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (exact.crossJoin(F.broadcast(total))
            .where(F.col("cnt") * q >= F.col("n") * p)
            .select("w", "cnt"))
