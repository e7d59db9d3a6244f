"""Exact edit-distance (Levenshtein) self-join via PassJoin blocking.

Dedup-suite member for SHORT strings (names, titles, identifiers):
find every pair of distinct strings within edit distance <= d without
an all-pairs comparison. Candidate generation is the PassJoin scheme
(Li, Deng, Feng, ICDE 2011): split every indexed string into d+1
contiguous segments; if ed(r, s) <= d then s must contain at least one
segment of r verbatim, starting within +-d of that segment's position
(pigeonhole: d edits cannot disturb all d+1 segments, and each edit
shifts downstream offsets by at most one). The probe side therefore
emits, per (indexed length, segment index), every substring of the
segment's length starting inside the shift window, and candidates meet
on the exact (length, segment index, substring) key — a bounded-key
equi-join, never a cartesian product. Survivors are verified with the
built-in JVM ``levenshtein`` (exact DP), so the output is EXACT; the
blocking only prunes.

Scale: the probe fan-out is O(d^2) rows per string and the index side
is the DISTINCT-string dictionary (vocabulary-sized, not
corpus-sized). Buckets are (substring, segment) keys — skew only if
one substring dominates a segment slot, which the verify step bounds
by its output size. Distance-0 pairs (exact duplicates) are excluded:
that is ``t_exact_dedup``'s job.

Reference parity: jxiw/ADOPT has no string-similarity surface; this
extends the dedup family (functions/dedup.py) like prefix-Jaccard did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def edit_distance_join(strings: DataFrame, col: str,
                       max_dist: int = 2) -> DataFrame:
    """All distinct-string pairs with 1 <= levenshtein <= max_dist.

    Returns DataFrame[na string, nb string, dist int] with na < nb,
    one row per unordered pair. ``strings`` may contain duplicates;
    the join runs over the distinct dictionary.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    d = max_dist
    nseg = d + 1
    dic = (strings.select(F.col(col).cast("string").alias("s"))
           .where(F.col("s").isNotNull())
           .distinct()
           .withColumn("len", F.length("s")))

    # index side: one row per segment — segment i of a length-L string
    # covers [i*L DIV nseg, (i+1)*L DIV nseg) (0-based; substring is
    # 1-based). Key = (own length, segment index, segment text).
    idx = (
        dic.select(F.col("s").alias("sa"), F.col("len").alias("la"),
                   F.explode(F.sequence(F.lit(0), F.lit(nseg - 1))).alias("i"))
        .withColumn("pos", F.expr(f"(i * la) DIV {nseg}"))
        .withColumn("seg_len", F.expr(f"((i + 1) * la) DIV {nseg}") - F.col("pos"))
        .where(F.col("seg_len") > 0)
        .select("sa", "la", "i",
                F.expr("substring(sa, pos + 1, seg_len)").alias("seg"))
    )

    # probe side: for every indexed length la within +-d of our own,
    # emit each window substring of segment i's length starting within
    # +-d of the segment's nominal position (the pigeonhole shift bound)
    probe = (
        dic.select(F.col("s").alias("sb"), F.col("len").alias("lb"))
        .select("sb", "lb",
                F.explode(F.sequence(F.col("lb") - d, F.col("lb") + d)).alias("la"))
        .where(F.col("la") >= 1)
        .select("sb", "lb", "la",
                F.explode(F.sequence(F.lit(0), F.lit(nseg - 1))).alias("i"))
        .withColumn("nom", F.expr(f"(i * la) DIV {nseg}"))
        .withColumn("seg_len", F.expr(f"((i + 1) * la) DIV {nseg}") - F.col("nom"))
        .where(F.col("seg_len") > 0)
        .select("sb", "lb", "la", "i", "nom", "seg_len",
                F.explode(F.sequence(F.lit(-d), F.lit(d))).alias("shift"))
        .withColumn("pos", F.col("nom") + F.col("shift"))
        .where((F.col("pos") >= 0)
               & (F.col("pos") + F.col("seg_len") <= F.col("lb")))
        .select("sb", "la", "i",
                F.expr("substring(sb, pos + 1, seg_len)").alias("seg"))
        .distinct()
    )

    cand = (idx.join(probe, ["la", "i", "seg"])
            .where(F.col("sa") < F.col("sb"))
            .select("sa", "sb").distinct())
    return (cand
            .withColumn("dist", F.levenshtein("sa", "sb"))
            .where((F.col("dist") >= 1) & (F.col("dist") <= d))
            .select(F.col("sa").alias("na"), F.col("sb").alias("nb"),
                    F.col("dist").cast("int").alias("dist")))


def edit_join_oracle_sql(table_sql: str, col: str,
                         max_dist: int = 2) -> str:
    """Brute-force exact twin for DuckDB (dictionary-sized input only)."""
    return f"""WITH d AS (
    SELECT DISTINCT CAST({col} AS VARCHAR) AS s FROM ({table_sql})
    WHERE {col} IS NOT NULL
)
SELECT a.s AS na, b.s AS nb,
       CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
FROM d a JOIN d b ON a.s < b.s
WHERE levenshtein(a.s, b.s) BETWEEN 1 AND {max_dist}"""
