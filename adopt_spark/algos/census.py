"""4-node connected-motif census — P4/claw/paw/C4/diamond/K4 counts.

The next rung above the reference's clique/cycle ladder
(graph_query/{4_clique,4_cycle}.sql): ALL six connected 4-vertex
undirected motifs, both non-induced and induced, in one pass. The
reference enumerates each motif with a dedicated multi-join SQL file;
here the whole census comes from ESCAPE-style combinatorial
identities (Pinar-Seshadhri-Vishal, WWW'17 — public literature) over
degree / codegree / per-edge-triangle aggregates, so the only
quadratic-ish intermediate is ONE wedge-shaped shuffle:

  claw     = sum_v  C(d(v), 3)
  p4_path  = sum_e  (d(u)-1)(d(v)-1) - 3*T        (T = triangles)
  paw      = sum_v  t(v) * (d(v)-2)               (t(v) = tris at v)
  c4_cycle = (1/2) * sum_{u<w} C(codeg(u,w), 2)
  diamond  = sum_e  C(t(e), 2)                    (t(e) = tris on e)
  k4       = algos.cliques.clique_count(..., 4)   (kernel reuse)

Induced counts follow by the standard inclusion-exclusion linear map
(each non-induced count is a fixed integer combination of induced
counts of its supergraphs; the matrix is inverted below).

Scale shape: degree and per-edge terms are single groupBy/join
aggregates on the edge table; codeg is the degree-oriented wedge
aggregate (the same W-bounded shuffle as triangle counting, with
map-side partial agg — counts move, never neighbor lists); K4 goes
through the adaptive clique kernel. Nothing enumerates a 4-vertex
tuple. The DuckDB contract oracle (queries/oracle_gen.census_sql)
deliberately takes the OPPOSITE approach — brute-force multi-join
enumeration of every motif, the reference's own idiom — so the two
sides share no formulation, only the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from adopt_spark.edges import degrees, undirected_canonical


def motif_census_4(edges: DataFrame) -> DataFrame:
    """Census of connected 4-vertex motifs over the undirected simple
    graph of ``edges`` -> [motif: string, n: long, n_induced: long],
    six rows sorted by motif name. ``n`` counts non-induced
    (subgraph) occurrences, ``n_induced`` induced ones.
    """
    spark = edges.sparkSession
    und = undirected_canonical(edges)   # one row per pair, u < v
    if und.isEmpty():
        return spark.createDataFrame(
            [], "motif string, n long, n_induced long")
    und = und.persist()
    deg = degrees(und).persist()

    # claw = sum C(d,3); per-row product is divisible by 6.
    claw = deg.agg((F.sum(F.col("deg") * (F.col("deg") - 1)
                          * (F.col("deg") - 2)) / 6)
                   .cast("long").alias("claw"))

    # codegree per unordered pair via the wedge aggregate: only
    # (pair -> count) rows shuffle, never adjacency lists.
    adj = und.select(F.col("sid").alias("mid"), F.col("tid").alias("x")) \
             .unionAll(und.select(F.col("tid").alias("mid"),
                                  F.col("sid").alias("x")))
    codeg = (adj.alias("l")
             .join(adj.alias("r"), "mid")
             .where(F.col("l.x") < F.col("r.x"))
             .groupBy(F.col("l.x").alias("a"), F.col("r.x").alias("b"))
             .agg(F.count(F.lit(1)).alias("c"))
             .persist())

    # 4-cycles: each cycle counted once per diagonal pair -> halve.
    c4 = codeg.agg((F.sum(F.col("c") * (F.col("c") - 1) / 2) / 2)
                   .cast("long").alias("c4"))

    # per-edge triangle counts t(e) = codeg restricted to edges
    etri = (und.join(codeg, (F.col("sid") == F.col("a"))
                     & (F.col("tid") == F.col("b")), "left")
            .select("sid", "tid",
                    F.coalesce(F.col("c"), F.lit(0)).alias("t"))
            .persist())

    # diamond = sum C(t(e),2); sum t(e) = 3T feeds the P4 correction
    dia_3t = etri.agg(
        (F.sum(F.col("t") * (F.col("t") - 1) / 2)).cast("long")
        .alias("diamond"),
        F.sum("t").cast("long").alias("three_t"))

    # P4 raw term: sum over edges of (d(u)-1)(d(v)-1)
    du = deg.withColumnRenamed("v", "sid").withColumnRenamed("deg", "du")
    dv = deg.withColumnRenamed("v", "tid").withColumnRenamed("deg", "dv")
    p4raw = (und.join(du, "sid").join(dv, "tid")
             .agg(F.sum((F.col("du") - 1) * (F.col("dv") - 1))
                  .cast("long").alias("p4raw")))

    # paw = sum_v t(v)*(d(v)-2); t(v) = half the incident edge-tris
    tv = (etri.select(F.col("sid").alias("v"), "t")
          .unionAll(etri.select(F.col("tid").alias("v"), "t"))
          .groupBy("v").agg((F.sum("t") / 2).cast("long").alias("tv")))
    paw = (tv.join(deg, "v")
           .agg(F.sum(F.col("tv") * (F.col("deg") - 2))
                .cast("long").alias("paw")))

    from adopt_spark.algos.cliques import clique_count
    k4 = clique_count(und, 4).withColumnRenamed("n_cliques", "k4")

    wide = (claw.crossJoin(c4).crossJoin(dia_3t).crossJoin(p4raw)
            .crossJoin(paw).crossJoin(k4)
            .withColumn("p4", F.col("p4raw") - F.col("three_t")))
    # induced counts: invert the fixed copies-per-supergraph matrix
    wide = wide.select(
        "p4", "claw", "paw", "c4", "diamond", "k4",
        (F.col("k4")).alias("i_k4"),
        (F.col("diamond") - 6 * F.col("k4")).alias("i_dia"),
        (F.col("c4") - F.col("diamond") + 3 * F.col("k4")).alias("i_c4"),
        (F.col("paw") - 4 * F.col("diamond") + 12 * F.col("k4"))
        .alias("i_paw"),
        # claw sits inside paw (its degree-3 vertex) as well as
        # diamond (x2) and K4 (x4): I = N - I_paw - 2 I_dia - 4 I_k4
        (F.col("claw") - F.col("paw") + 2 * F.col("diamond")
         - 4 * F.col("k4")).alias("i_claw"),
        (F.col("p4") - 2 * F.col("paw") - 4 * F.col("c4")
         + 6 * F.col("diamond") - 12 * F.col("k4")).alias("i_p4"),
    )
    out = wide.selectExpr(
        """stack(6,
           'c4_cycle', c4,      i_c4,
           'claw_star', claw,   i_claw,
           'diamond', diamond,  i_dia,
           'k4_clique', k4,     i_k4,
           'p4_path', p4,       i_p4,
           'paw_tailed_tri', paw, i_paw
        ) AS (motif, n, n_induced)""").orderBy("motif")
    rows = out.collect()
    for df in (und, deg, codeg, etri):
        df.unpersist()
    return spark.createDataFrame(rows,
                                 "motif string, n long, n_induced long")
