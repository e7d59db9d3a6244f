"""ANF — approximate neighborhood function via Flajolet-Martin sketches.

The classic web/link-graph distance metric (Palmer-Gibbons-Faloutsos
ANF; HyperBall is the HLL refinement): for each round ``h`` estimate
N(h) = the number of (source, reachable-within-h-hops) pairs, summed
over all vertices, without ever materializing frontiers. The ratio
``anf(h) / anf(H)`` read per round is the standard effective-diameter
curve — the workload the reference's SNAP graphs (roadNet, Patents,
ego-Twitter in its BASELINE Table 2) are usually characterized by.

Each vertex carries K Flajolet-Martin bitmasks. Sketch k of vertex v
starts with single bit ``rho(v, k)`` set, where rho = trailing zeros
of a deterministic integer hash (same multiplier family as
algos/mis.py / algos/matching.py, so the DuckDB oracle replays it
bit-for-bit), capped at ANF_BITS-1. One round is

    M_h(v) = BIT_OR over u in N(v) ∪ {v} of M_{h-1}(u)

— a single equi-join plus a grouped ``bit_or`` aggregate per round
(map-side partial agg; the sketch fixed-width longs are the ONLY
state that moves, never vertex sets). The estimate after each round
is the FM formula 2^R / phi with R = mean index of the lowest unset
bit across the K sketches.

Scale shape: state is O(V * K * 8 bytes) regardless of reachability
set sizes (the whole point — exact frontiers explode on a 10^12-edge
graph, sketches don't); every round is one shuffle keyed by vertex;
rounds are O(diameter). All arithmetic is JVM-side Column code; the
contract oracle (queries/oracle_gen.anf_sql) unrolls the identical
rounds in DuckDB, so the "approximation" is still value-checked
exactly — both engines compute the same deterministic sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from adopt_spark.algos.matching import MATCH_EDGE_MIX
from adopt_spark.algos.mis import MIS_MULT, MIS_PRIME

ANF_K = 8        # sketches per vertex
ANF_ROUNDS = 4   # fixed contract rounds (>= derived-graph diameter)
ANF_BITS = 20    # bitmask width cap (2^20 >> fixture vertex count)
ANF_PHI = 0.77351  # Flajolet-Martin bias correction


def _init_mask_sql(j: int, v: str = "v") -> str:
    """Seed mask for sketch j: 1 << trailing_zeros(hash(v, j)), capped.

    Engine-portable SQL (Spark AND DuckDB parse it identically —
    oracle_gen.anf_sql embeds the same string): hash-AND-negate
    isolates the lowest set bit, bit_count of (that - 1) counts the
    trailing zeros; hash==0 degenerates to bit_count(-1)=64 which the
    cap folds to ANF_BITS-1 on both engines.
    """
    h = f"((({v} % {MIS_PRIME}) * {MIS_MULT} + {j + 1} * {MATCH_EDGE_MIX}) % {MIS_PRIME})"
    bit = f"least(bit_count(({h} & -{h}) - 1), {ANF_BITS - 1})"
    return f"cast(pow(2, cast({bit} as int)) as bigint)"


def _lsz_sql(col: str) -> str:
    """Index of the lowest UNSET bit of ``col`` (engine-portable)."""
    return f"bit_count(((~{col}) & ({col} + 1)) - 1)"


def anf_estimate_sql(k: int = ANF_K, mask: str = "m{j}") -> str:
    """FM estimate expression over K mask columns (engine-portable)."""
    total = " + ".join(_lsz_sql(mask.format(j=j)) for j in range(k))
    return f"sum(power(2.0, ({total}) / cast({k} as double))) / {ANF_PHI}"


def anf_neighborhood(edges: DataFrame, rounds: int = ANF_ROUNDS,
                     k: int = ANF_K) -> DataFrame:
    """Per-round ANF curve -> [h: int, anf: double, pct: double].

    ``pct`` = anf(h) / anf(rounds): the smallest h with pct >= 0.9 is
    the standard effective-diameter readout. Undirected reachability
    (edges symmetrized); self always reachable (h=1 row counts each
    vertex's closed 1-neighborhood).
    """
    spark = edges.sparkSession
    e = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
         .where(F.col("sid") != F.col("tid")))
    if e.isEmpty():
        return spark.createDataFrame([], "h int, anf double, pct double")
    # symmetrize + self-loops: the self mask folds into the SAME
    # bit_or aggregate, so a round is exactly one join + one groupBy
    sym = (e.select(F.col("sid").alias("v"), F.col("tid").alias("nbr"))
           .unionAll(e.select(F.col("tid").alias("v"),
                              F.col("sid").alias("nbr")))
           .unionAll(e.select(F.col("sid").alias("v"),
                              F.col("sid").alias("nbr")))
           .unionAll(e.select(F.col("tid").alias("v"),
                              F.col("tid").alias("nbr")))
           .distinct()
           .persist())
    cur = (sym.select("v").distinct()
           .select("v", *[F.expr(_init_mask_sql(j)).alias(f"m{j}")
                          for j in range(k)])
           .persist())

    est = F.expr(anf_estimate_sql(k)).alias("anf")
    per_round = []
    for h in range(1, rounds + 1):
        nxt = (sym.join(cur.withColumnRenamed("v", "nbr"), "nbr")
               .groupBy("v")
               .agg(*[F.bit_or(f"m{j}").alias(f"m{j}") for j in range(k)])
               .persist())
        nxt.count()          # materialize before dropping the parent
        cur.unpersist()
        cur = nxt
        per_round.append(cur.agg(est).select(F.lit(h).alias("h"), "anf"))

    curve = per_round[0]
    for df in per_round[1:]:
        curve = curve.unionAll(df)
    out = curve.select(
        "h", "anf",
        (F.col("anf") / F.max("anf").over(
            Window.partitionBy(F.lit(1)))).alias("pct"))
    rows = out.collect()     # rounds-many rows; frees the persisted masks
    sym.unpersist()
    cur.unpersist()
    return spark.createDataFrame(rows, "h int, anf double, pct double")
