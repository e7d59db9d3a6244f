"""n-clique / n-cycle counting — the reference's full graph-query suite.

The reference ships ten count queries over ``edge(sid, tid)``
(graph_query/{3..7}_{clique,cycle}.sql) and executes them with its
adaptive WCOJ engine. We regenerate the *same query semantics*
programmatically as ANSI SQL — runnable identically by Spark SQL
(Catalyst plans the multi-join; AQE handles skew) and by the DuckDB
oracle — rather than hand-copying query text.

Encodings (verified against each reference file):
  * n-clique: one alias per vertex pair (i<j), every alias constrained
    ``sid < tid`` → counts id-ordered n-cliques of the lt-filtered
    edge set (3_clique.sql, 4_clique.sql, ...).
  * n-cycle: an increasing chain v1<v2<...<vn of n-1 lt-aliases plus a
    closing edge; the closing alias is the raw table (vn, v1) for
    n∈{4,5} (4_cycle.sql, 5_cycle.sql) and an lt alias (v1, vn) for
    n∈{6,7} (6_cycle.sql, 7_cycle.sql). 3_cycle.sql ≡ 3_clique.sql.

Scale: these are pure declarative plans — predicate pushdown puts the
lt-filter into the scan, and Catalyst chooses broadcast joins whenever
the (heavily filtered) edge table fits, exactly what you want on a
1000-executor cluster. For the quadratic blowup cases (5+ motifs on
dense graphs) the range-predicate variants (range_motif) mirror the
reference's graph_selectivity_query suite.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession


def _alias_conditions(alias_ends: list[tuple[str, int, int]]) -> list[str]:
    """Equality conjuncts tying alias endpoints to shared vertex vars.

    alias_ends: (alias, sid_var, tid_var). The first occurrence of each
    variable becomes its representative expression; later occurrences
    emit an equality against it (the same column-equivalence-class
    construction the reference does at analysis time,
    query/QueryInfo.java:346-373).
    """
    rep: dict[int, str] = {}
    conds: list[str] = []
    for alias, sv, tv in alias_ends:
        for var, col in ((sv, f"{alias}.sid"), (tv, f"{alias}.tid")):
            if var in rep:
                conds.append(f"{col} = {rep[var]}")
            else:
                rep[var] = col
    return conds


def clique_sql(n: int, edge_view: str = "edge",
               range_preds: dict[int, int] | None = None) -> str:
    """COUNT(*) SQL for id-ordered n-cliques.

    ``range_preds`` maps vertex index (1-based) → upper bound, giving
    the reference's selectivity variants
    (graph_selectivity_query/.../a0.25_b0.25_c0.25.sql adds
    ``e1.sid < K`` per variable).
    """
    if n < 3:
        raise ValueError("clique size must be >= 3")
    pairs = list(combinations(range(1, n + 1), 2))
    aliases = [(f"e{k + 1}", i, j) for k, (i, j) in enumerate(pairs)]
    froms = ", ".join(f"{edge_view} {a}" for a, _, _ in aliases)
    conds = _alias_conditions(aliases)
    conds += [f"{a}.sid < {a}.tid" for a, _, _ in aliases]
    if range_preds:
        rep: dict[int, str] = {}
        for a, sv, tv in aliases:
            rep.setdefault(sv, f"{a}.sid")
            rep.setdefault(tv, f"{a}.tid")
        for var, ub in sorted(range_preds.items()):
            conds.append(f"{rep[var]} < {ub}")
    return f"SELECT count(*) AS n FROM {froms} WHERE {' AND '.join(conds)}"


def cycle_sql(n: int, edge_view: str = "edge",
              range_preds: dict[int, int] | None = None) -> str:
    """COUNT(*) SQL for increasing n-cycles, reference encoding.

    ``range_preds`` maps vertex index (1-based) → upper bound —
    the ordered-encoding analogue of clique_sql's selectivity
    variants, applied once per variable via its representative
    column (chain variable v_i is e_i.sid for i < n, vn is
    e_{n-1}.tid).
    """
    if n < 3:
        raise ValueError("cycle size must be >= 3")
    if n == 3:
        return clique_sql(3, edge_view, range_preds=range_preds)
    # chain aliases e1..e(n-1): ei = (v_i, v_{i+1}), all sid < tid
    aliases = [(f"e{i}", i, i + 1) for i in range(1, n)]
    lt_aliases = [a for a, _, _ in aliases]
    # Closing-alias conventions copied per-file from the reference suite
    # (they are hand-written and inconsistent there):
    #   4_cycle.sql: e4 = (v4, v1), raw directed, no lt filter
    #   5_cycle.sql: e5 = (v1, v5), raw directed, no lt filter
    #   6/7_cycle.sql: e_n = (v1, vn) with an (implied-true) lt filter
    close = f"e{n}"
    if n == 4:
        aliases.append((close, n, 1))          # raw closing edge (vn, v1)
    elif n == 5:
        aliases.append((close, 1, n))          # raw closing edge (v1, vn)
    else:
        aliases.append((close, 1, n))          # lt closing edge (v1, vn)
        lt_aliases.append(close)
    froms = ", ".join(f"{edge_view} {a}" for a, _, _ in aliases)
    conds = _alias_conditions(aliases)
    conds += [f"{a}.sid < {a}.tid" for a in lt_aliases]
    if range_preds:
        rep: dict[int, str] = {}
        for a, sv, tv in aliases:
            rep.setdefault(sv, f"{a}.sid")
            rep.setdefault(tv, f"{a}.tid")
        for var, ub in sorted(range_preds.items()):
            conds.append(f"{rep[var]} < {ub}")
    return f"SELECT count(*) AS n FROM {froms} WHERE {' AND '.join(conds)}"


# ---------------------------------------------------------------------------
# graph_selectivity_query family — the reference's OTHER parameterized
# corpus (64 files x 6 families). Its encoding differs from graph_query:
# motifs are DIRECTED (no ``sid < tid`` anywhere — each vertex pair is
# constrained in exactly one direction, and vertices are not forced
# distinct), and each bounded join variable's upper bound is REPLICATED
# onto every alias occurrence of that variable so the single-table
# filter pushes into every scan (e.g.
# twitter_selectivity_3clique/sql/a0.25_b0.25_c0.25.sql:
# ``e1.sid < 17000000 AND e3.sid < 17000000 AND ...``). The shipped
# files bound {v1,v2,v3} for the 3-clique and {v1,v2,v4} for the
# 4/5/6-clique and 4/5-cycle families, at fractions
# {0.25, 0.5, 0.75, 1.0} of the vertex-id domain. Alias order here is
# canonical (chain pairs, then remaining pairs lexicographic); the
# hand-written files order chords inconsistently between n=4/5/6, which
# changes nothing semantically (verified by test against the files).


def _directed_sql(aliases: list[tuple[str, int, int]],
                  bounds: dict[int, int] | None,
                  edge_view: str) -> str:
    conds = _alias_conditions(aliases)
    if bounds:
        occ: dict[int, list[str]] = {}
        for a, sv, tv in aliases:
            occ.setdefault(sv, []).append(f"{a}.sid")
            occ.setdefault(tv, []).append(f"{a}.tid")
        for var, ub in sorted(bounds.items()):
            for col in occ[var]:
                conds.append(f"{col} < {ub}")
    froms = ", ".join(f"{edge_view} {a}" for a, _, _ in aliases)
    return f"SELECT count(*) AS n FROM {froms} WHERE {' AND '.join(conds)}"


def selectivity_clique_sql(n: int, bounds: dict[int, int] | None = None,
                           edge_view: str = "edge") -> str:
    """Directed n-clique with per-occurrence variable upper bounds —
    the twitter_selectivity_{n}clique encoding."""
    if n < 3:
        raise ValueError("clique size must be >= 3")
    chain = [(i, i + 1) for i in range(1, n)]
    chords = sorted(p for p in combinations(range(1, n + 1), 2)
                    if p not in set(chain))
    aliases = [(f"e{k + 1}", i, j) for k, (i, j) in enumerate(chain + chords)]
    return _directed_sql(aliases, bounds, edge_view)


def selectivity_cycle_sql(n: int, bounds: dict[int, int] | None = None,
                          edge_view: str = "edge") -> str:
    """Directed n-cycle v1→v2→…→vn plus closing chord v1→vn, with
    per-occurrence variable upper bounds — the
    twitter_selectivity_{n}cycle encoding."""
    if n < 3:
        raise ValueError("cycle size must be >= 3")
    pairs = [(i, i + 1) for i in range(1, n)] + [(1, n)]
    aliases = [(f"e{k + 1}", i, j) for k, (i, j) in enumerate(pairs)]
    return _directed_sql(aliases, bounds, edge_view)


# ---------------------------------------------------------------------------
# Generic conjunctive patterns — the reference engine is not a
# clique/cycle library but a WCOJ evaluator for ARBITRARY conjunctive
# queries over edge(sid, tid) (any .sql file a user drops into
# graph_query/ runs through the same QueryInfo → LFTJ path,
# query/QueryInfo.java:346-373 derives the join variables from whatever
# equalities the text contains). pattern_sql is that generality for
# this engine: any edge pattern, expressed as (sv, tv, lt) atoms,
# compiles to the same ANSI SQL Catalyst and the DuckDB oracle both
# run. Per-variable upper bounds are replicated onto every occurrence
# (the selectivity-suite encoding) so they push into every scan.

Pattern = list[tuple[int, int, bool]]

# Named patterns in the reference suite's id-ordered style (every lt
# atom constrains sid < tid on its occurrence):
#   diamond         = increasing 4-cycle + (v1, v3) chord
#   tailed triangle = id-ordered triangle + lt tail off its max vertex
#   house           = increasing 5-cycle (all-lt closing, the n>=6
#                     cycle-file convention) + (v2, v5) chord
DIAMOND: Pattern = [(1, 2, True), (2, 3, True), (3, 4, True),
                    (1, 4, True), (1, 3, True)]
TAILED_TRIANGLE: Pattern = [(1, 2, True), (1, 3, True), (2, 3, True),
                            (3, 4, True)]
HOUSE: Pattern = [(1, 2, True), (2, 3, True), (3, 4, True), (4, 5, True),
                  (1, 5, True), (2, 5, True)]


def _validate_pattern(atoms: Pattern) -> int:
    """Vars must be 1..n contiguous and the pattern graph connected
    (disconnected patterns are Cartesian products — reject them the
    way the reference's avoid-Cartesian heuristic never proposes
    them)."""
    if not atoms:
        raise ValueError("pattern needs at least one atom")
    vs = {v for sv, tv, _ in atoms for v in (sv, tv)}
    n = max(vs)
    if vs != set(range(1, n + 1)):
        raise ValueError(f"pattern variables must be 1..{n} contiguous, "
                         f"got {sorted(vs)}")
    for sv, tv, _ in atoms:
        if sv == tv:
            raise ValueError(f"self-loop atom ({sv},{tv}) not supported")
    seen = {atoms[0][0]}
    frontier = True
    while frontier:
        frontier = False
        for sv, tv, _ in atoms:
            if (sv in seen) != (tv in seen):
                seen.update((sv, tv))
                frontier = True
    if seen != vs:
        raise ValueError(f"pattern is disconnected: {sorted(vs - seen)} "
                         "unreachable (would be a Cartesian product)")
    return n


def pattern_sql(atoms: Pattern, bounds: dict[int, int] | None = None,
                edge_view: str = "edge") -> str:
    """COUNT(*) SQL for an arbitrary connected edge pattern.

    ``atoms``: one ``(sv, tv, lt)`` triple per edge-relation occurrence
    — variable ``sv`` at the sid endpoint, ``tv`` at tid, and ``lt``
    adding the per-alias ``sid < tid`` filter the reference's
    graph_query files use for symmetry breaking. ``bounds`` maps
    variable → exclusive upper bound, replicated per occurrence.
    """
    n = _validate_pattern(atoms)
    aliases = [(f"e{k + 1}", sv, tv) for k, (sv, tv, _) in enumerate(atoms)]
    conds = _alias_conditions(aliases)
    conds += [f"e{k + 1}.sid < e{k + 1}.tid"
              for k, (_, _, lt) in enumerate(atoms) if lt]
    if bounds:
        if not set(bounds) <= set(range(1, n + 1)):
            raise ValueError(f"bounds on unknown variables: "
                             f"{sorted(set(bounds) - set(range(1, n + 1)))}")
        occ: dict[int, list[str]] = {}
        for a, sv, tv in aliases:
            occ.setdefault(sv, []).append(f"{a}.sid")
            occ.setdefault(tv, []).append(f"{a}.tid")
        for var, ub in sorted(bounds.items()):
            for col in occ[var]:
                conds.append(f"{col} < {ub}")
    froms = ", ".join(f"{edge_view} {a}" for a, _, _ in aliases)
    return f"SELECT count(*) AS n FROM {froms} WHERE {' AND '.join(conds)}"


def count_pattern(spark: SparkSession, edges: DataFrame, atoms: Pattern,
                  bounds: dict[int, int] | None = None) -> DataFrame:
    return run_motif(spark, edges, pattern_sql(atoms, bounds=bounds))


def selectivity_bounds(fracs: dict[int, float], id_domain: int) -> dict[int, int]:
    """Linear frac-of-domain → integer upper bound (synthetic grids)."""
    return {var: int(frac * id_domain) for var, frac in fracs.items()}


# The shipped files map each selectivity fraction to ONE fixed constant
# (same for every variable): the frac-quantile of ego-Twitter's
# vertex-id distribution, not a linear fraction of the id domain
# (grep '< [0-9]*' over twitter_selectivity_3clique/sql/a{f}_... gives
# exactly these four values).
TWITTER_SELECTIVITY_BOUNDS = {
    0.25: 17_000_000, 0.5: 37_000_000, 0.75: 145_000_000, 1.0: 570_000_000,
}


def selectivity_bounds_from_graph(edges: DataFrame,
                                  fracs: dict[int, float]) -> dict[int, int]:
    """Data-driven bounds: frac-quantile of the graph's vertex-id
    distribution per variable — the generalization of the reference's
    fixed ego-Twitter constants to any input graph. Exact percentile
    (deterministic at any parallelism), one aggregate."""
    from pyspark.sql import functions as F

    ids = edges.select(F.col("sid").alias("v")).unionAll(
        edges.select(F.col("tid").alias("v")))
    probs = sorted({f for f in fracs.values()})
    row = ids.agg(*[F.percentile("v", F.lit(p)).alias(f"q{i}")
                    for i, p in enumerate(probs)]).collect()[0]
    q_of = {p: int(row[f"q{i}"]) + 1 for i, p in enumerate(probs)}
    return {var: q_of[frac] for var, frac in fracs.items()}


def run_motif(spark: SparkSession, edges: DataFrame, sql: str) -> DataFrame:
    """Run a generated motif query over an edge DataFrame."""
    edges.createOrReplaceTempView("edge")
    return spark.sql(sql)


def count_clique(spark: SparkSession, edges: DataFrame, n: int,
                 range_preds: dict[int, int] | None = None) -> DataFrame:
    return run_motif(spark, edges, clique_sql(n, range_preds=range_preds))


def count_cycle(spark: SparkSession, edges: DataFrame, n: int) -> DataFrame:
    return run_motif(spark, edges, cycle_sql(n))


def order_cardinalities(edges, pattern: Pattern,
                        orders: dict[str, list[int]]):
    """Join-order INTROSPECTION — the reason the reference exists, in
    exact numbers: for each named atom order, the cardinality of
    every prefix join (the intermediate-result sizes a static
    optimizer commits to and ADOPT's UCT learns to avoid). Returns
    DataFrame[ord_name, step, n_rows] with one row per (order,
    prefix); counts are exact aggregates (the prefixes are COUNTED,
    never materialized wide), so the report is deterministic and
    value-checkable — unlike a timing-based comparison.

    Each order must visit atoms connectedly (same rule as the
    pattern validator); the atom list indexes into ``pattern``.
    """
    from pyspark.sql import functions as F

    n = _validate_pattern(pattern)
    spark = edges.sparkSession
    lt = (edges.select(F.col("sid").cast("long"), F.col("tid").cast("long"))
          .where(F.col("sid") < F.col("tid"))
          .dropDuplicates(["sid", "tid"])
          .localCheckpoint(eager=True))
    rows = []
    for name, idxs in orders.items():
        if sorted(idxs) != list(range(len(pattern))):
            raise ValueError(f"order {name!r} must permute all "
                             f"{len(pattern)} atoms, got {idxs}")
        seen_vars: set[int] = set()
        cur = None
        for step, ai in enumerate(idxs, 1):
            sv, tv, _ = pattern[ai]
            atom = lt.select(F.col("sid").alias(f"v{sv}"),
                             F.col("tid").alias(f"v{tv}"))
            if cur is None:
                cur = atom
                seen_vars = {sv, tv}
            else:
                shared = [f"v{x}" for x in ({sv, tv} & seen_vars)]
                if not shared:
                    raise ValueError(
                        f"order {name!r} disconnects at step {step}")
                cur = cur.join(atom, shared)
                seen_vars |= {sv, tv}
            rows.append((name, step, cur.count()))
    return spark.createDataFrame(rows, "ord_name string, step int, "
                                       "n_rows long")


def order_cardinalities_sql(edge_sql: str, pattern: Pattern,
                            orders: dict[str, list[int]]) -> str:
    """DuckDB twin of :func:`order_cardinalities`: one count-star
    prefix join per (order, step), unioned."""
    selects = []
    for name, idxs in orders.items():
        for k in range(1, len(idxs) + 1):
            tables = []
            conds = []
            var_owner: dict[int, str] = {}
            for j, ai in enumerate(idxs[:k]):
                sv, tv, _ = pattern[ai]
                t = f"t{j}"
                tables.append(f"lt {t}")
                for var, col in ((sv, "sid"), (tv, "tid")):
                    if var in var_owner:
                        conds.append(f"{t}.{col} = {var_owner[var]}")
                    else:
                        var_owner[var] = f"{t}.{col}"
            where = (" WHERE " + " AND ".join(conds)) if conds else ""
            selects.append(
                f"SELECT '{name}' AS ord_name, CAST({k} AS INTEGER) "
                f"AS step, CAST(count(*) AS BIGINT) AS n_rows "
                f"FROM {', '.join(tables)}{where}")
    union = "\nUNION ALL\n".join(selects)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), lt AS MATERIALIZED (
    SELECT DISTINCT sid, tid FROM edge WHERE sid < tid
)
{union}"""
