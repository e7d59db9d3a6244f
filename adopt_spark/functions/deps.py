"""Semver dependency resolution: manifest ranges -> pinned versions.

The graft's payload is source code, and the north star's edge table is
"(repo -> repo) import/dependency links". Raw manifests don't carry
edges — they carry VERSION RANGES (``^1.2.3``, ``~0.4.0``, ``1.x``),
and the edge a build actually follows is the range resolved against
the dependency's published releases (npm/cargo "highest satisfying
version" rule). This module is that resolution step as a relational
operator: it turns (repo, dep, spec) + (dep, released versions) into
the pinned (repo, dep, resolved) lockfile table that feeds
``edges.py`` / PageRank / the motif suite.

Reference parity note: jxiw/ADOPT has no manifest surface — this
extends the engine for the code-payload mandate, like functions/code.py.

Supported range grammar (the npm core subset, documented + tested):

=============  ====================================================
``*``          any version
``M.N.P``      exactly M.N.P
``M.x`` / ``M``        any version with major M (``N.x`` likewise)
``M.N.x`` / ``M.N``    any version with major M, minor N
``^M.N.P``     npm caret: [M.N.P, (M+1).0.0) when M>0;
               [0.N.P, 0.(N+1).0) when M=0, N>0;
               exactly 0.0.P when M=N=0
``~M.N.P``     npm tilde: [M.N.P, M.(N+1).0)
``>=M.N.P``    at least M.N.P
=============  ====================================================

Scale shape (100 TB of manifests):
- Every version is encoded as one sortable int64
  (``maj*1e6 + min*1e3 + patch``); every spec parses to a single
  half-open interval [lo, hi) via pure Column ops (regexp + CASE, JVM
  codegen, zero Python).
- Resolution is ONE equi-join on ``dep`` with the interval predicate
  as a join filter, then a map-side-combinable ``max``/``count``
  aggregate. The join fan-out per requirement is bounded by
  versions-per-dep (thousands at worst — npm's biggest packages ship
  ~10^3 releases), NOT by the dependents of a hub package, so a
  lodash-scale hub costs |dependents| * |releases| intermediate rows
  that partial-agg collapses before the shuffle. No driver state, no
  broadcast requirement (Catalyst/AQE may still broadcast a small
  release table on its own).
- Unresolvable ranges are kept (LEFT join) with NULL ``resolved`` —
  the dangling-edge report a registry crawl needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INF = 4_000_000_000  # > any vkey (majors are < 4000 by encoding)
_OPS_RE = r"^(\^|~|>=)"


def version_key(maj: Column, minor: Column, patch: Column) -> Column:
    """maj.minor.patch -> one sortable int64 (components < 1000)."""
    return (maj.cast("long") * 1_000_000
            + minor.cast("long") * 1_000 + patch.cast("long"))


def _num(part: Column) -> Column:
    """Numeric component or NULL for 'x'/'*'/missing (ANSI-safe: the
    cast only runs on digit strings, so Spark 4's strict CAST never
    throws on a wildcard)."""
    return F.when(part.rlike("^[0-9]+$"), part.cast("long"))


def spec_bounds(spec: Column) -> tuple[Column, Column]:
    """Parse one range spec into a half-open [lo, hi) on the int64
    version key. Pure Column ops — regexp + CASE, no Python."""
    op = F.regexp_extract(spec, _OPS_RE, 1)
    rest = F.regexp_replace(spec, _OPS_RE, "")
    parts = F.split(rest, r"\.")
    maj = _num(F.get(parts, 0))
    minor = _num(F.get(parts, 1))
    patch = _num(F.get(parts, 2))
    key = (maj * 1_000_000 + F.coalesce(minor, F.lit(0)) * 1_000
           + F.coalesce(patch, F.lit(0)))
    star = rest == "*"
    lo = F.when(star, F.lit(0)).otherwise(key)
    hi = (
        F.when(star, F.lit(_INF))
        .when(op == ">=", F.lit(_INF))
        .when(op == "^",
              F.when(maj > 0, (maj + 1) * 1_000_000)
              .when(F.coalesce(minor, F.lit(0)) > 0,
                    (minor + 1) * 1_000)
              .otherwise(key + 1))
        .when(op == "~",
              maj * 1_000_000 + (F.coalesce(minor, F.lit(0)) + 1) * 1_000)
        # plain: wildcard level decides the interval width
        .when(minor.isNull(), (maj + 1) * 1_000_000)
        .when(patch.isNull(), maj * 1_000_000 + (minor + 1) * 1_000)
        .otherwise(key + 1)
    )
    return lo, hi


def semver_resolve(requirements: DataFrame,
                   releases: DataFrame) -> DataFrame:
    """Resolve each (repo, dep, spec) against releases
    (dep, maj, minor, patch) -> (repo, dep, spec, resolved,
    n_candidates): ``resolved`` = the HIGHEST released version
    satisfying the range (NULL when none), ``n_candidates`` = how many
    satisfy. One dep equi-join (interval predicate as join filter) +
    one partial-aggregated max/count — see module docstring for the
    100-TB cost argument."""
    lo, hi = spec_bounds(F.col("spec"))
    reqs = requirements.select("repo", "dep", "spec",
                               lo.alias("_lo"), hi.alias("_hi"))
    rel = releases.select(
        F.col("dep").alias("_rdep"),
        version_key(F.col("maj"), F.col("minor"),
                    F.col("patch")).alias("_vkey"))
    joined = reqs.join(
        rel,
        (reqs["dep"] == rel["_rdep"])
        & (rel["_vkey"] >= reqs["_lo"]) & (rel["_vkey"] < reqs["_hi"]),
        "left")
    best = F.max("_vkey")
    return (joined.groupBy("repo", "dep", "spec")
            .agg(best.alias("_best"),
                 F.count("_vkey").cast("long").alias("n_candidates"))
            .select(
                "repo", "dep", "spec",
                F.when(
                    F.col("_best").isNotNull(),
                    F.concat_ws(
                        ".",
                        F.expr("_best div 1000000").cast("string"),
                        F.expr("(_best div 1000) % 1000").cast("string"),
                        (F.col("_best") % 1_000).cast("string")),
                ).alias("resolved"),
                "n_candidates"))


# ----------------------------------------------- synthetic fixtures

def synthetic_releases(part: DataFrame) -> DataFrame:
    """Deterministic release table from the ``part`` fixture:
    97 packages x ~20 versions, components from coprime divisions of
    p_partkey. The expression IS the fixture contract —
    :func:`_synthetic_releases_sql` is its DuckDB twin."""
    k = F.col("p_partkey")
    return part.select(
        F.concat(F.lit("lib"), (k % 97).cast("string")).alias("dep"),
        (F.expr("p_partkey div 97") % 4).alias("maj"),
        (F.expr("p_partkey div 7") % 8).alias("minor"),
        (k % 5).alias("patch"),
    ).distinct()


def synthetic_requirements(orders: DataFrame,
                           thin: int = 1) -> DataFrame:
    """Deterministic manifest table from the ``orders`` fixture: one
    requirement per order, spec form cycling through the full
    supported grammar, components from coprime divisions of
    o_orderkey. DuckDB twin: :func:`_synthetic_requirements_sql`.

    ``thin`` keeps only orders with ``o_orderkey % thin == 0`` — the
    graph-shaped operators (dep_impact / dep_conflicts) use a sparse
    manifest (thin=13, ~5 deps/repo) so the repo graph has real hop
    structure instead of saturating at 1 hop; thin=1 (default) is the
    dense resolve fixture."""
    if thin > 1:
        orders = orders.where(F.col("o_orderkey") % thin == 0)
    k = F.col("o_orderkey")
    m = (F.expr("o_orderkey div 7") % 4).cast("string")
    n = (F.expr("o_orderkey div 11") % 8).cast("string")
    p = (F.expr("o_orderkey div 13") % 5).cast("string")
    mnp = F.concat_ws(".", m, n, p)
    spec = (F.when(k % 6 == 0, F.lit("*"))
            .when(k % 6 == 1, mnp)
            .when(k % 6 == 2, F.concat(F.lit("^"), mnp))
            .when(k % 6 == 3, F.concat(F.lit("~"), mnp))
            .when(k % 6 == 4, F.concat(F.lit(">="), mnp))
            .otherwise(F.concat(m, F.lit(".x"))))
    return orders.select(
        F.concat(F.lit("repo"), (F.col("o_custkey") % 211).cast("string"))
        .alias("repo"),
        F.concat(F.lit("lib"), (k % 97).cast("string")).alias("dep"),
        spec.alias("spec"),
    ).distinct()


def _synthetic_releases_sql() -> str:
    return """
    SELECT DISTINCT
           'lib' || CAST(p_partkey % 97 AS VARCHAR) AS dep,
           (p_partkey // 97) % 4 AS maj,
           (p_partkey // 7) % 8 AS minor,
           p_partkey % 5 AS patch
    FROM part
""".strip()


def _synthetic_requirements_sql(thin: int = 1) -> str:
    mnp = ("CAST((o_orderkey // 7) % 4 AS VARCHAR) || '.' || "
           "CAST((o_orderkey // 11) % 8 AS VARCHAR) || '.' || "
           "CAST((o_orderkey // 13) % 5 AS VARCHAR)")
    where = (f"\n    WHERE o_orderkey % {thin} = 0" if thin > 1 else "")
    return f"""
    SELECT DISTINCT
           'repo' || CAST(o_custkey % 211 AS VARCHAR) AS repo,
           'lib' || CAST(o_orderkey % 97 AS VARCHAR) AS dep,
           CASE o_orderkey % 6
             WHEN 0 THEN '*'
             WHEN 1 THEN {mnp}
             WHEN 2 THEN '^' || {mnp}
             WHEN 3 THEN '~' || {mnp}
             WHEN 4 THEN '>=' || {mnp}
             ELSE CAST((o_orderkey // 7) % 4 AS VARCHAR) || '.x'
           END AS spec
    FROM orders{where}
""".strip()


def semver_resolve_sql(thin: int = 1) -> str:
    """DuckDB twin of :func:`semver_resolve` over the synthetic
    fixtures — identical grammar, identical interval arithmetic
    (DuckDB lists are 1-indexed and out-of-range indexing yields
    NULL, mirroring F.get)."""
    return f"""
WITH releases AS (
    {_synthetic_releases_sql()}
), requirements AS (
    {_synthetic_requirements_sql(thin)}
), parsed AS (
    SELECT repo, dep, spec,
           regexp_extract(spec, '^(\\^|~|>=)', 1) AS op,
           string_split(regexp_replace(spec, '^(\\^|~|>=)', ''), '.')
               AS parts,
           regexp_replace(spec, '^(\\^|~|>=)', '') AS rest
    FROM requirements
), comp AS (
    SELECT repo, dep, spec, op, rest,
           CASE WHEN regexp_matches(parts[1], '^[0-9]+$')
                THEN CAST(parts[1] AS BIGINT) END AS maj,
           CASE WHEN regexp_matches(parts[2], '^[0-9]+$')
                THEN CAST(parts[2] AS BIGINT) END AS minor,
           CASE WHEN regexp_matches(parts[3], '^[0-9]+$')
                THEN CAST(parts[3] AS BIGINT) END AS patch
    FROM parsed
), bounds AS (
    SELECT repo, dep, spec,
           CASE WHEN rest = '*' THEN 0
                ELSE maj * 1000000 + coalesce(minor, 0) * 1000
                     + coalesce(patch, 0) END AS lo,
           CASE
             WHEN rest = '*' THEN {_INF}
             WHEN op = '>=' THEN {_INF}
             WHEN op = '^' THEN
               CASE WHEN maj > 0 THEN (maj + 1) * 1000000
                    WHEN coalesce(minor, 0) > 0 THEN (minor + 1) * 1000
                    ELSE maj * 1000000 + coalesce(minor, 0) * 1000
                         + coalesce(patch, 0) + 1 END
             WHEN op = '~' THEN maj * 1000000
                                + (coalesce(minor, 0) + 1) * 1000
             WHEN minor IS NULL THEN (maj + 1) * 1000000
             WHEN patch IS NULL THEN maj * 1000000 + (minor + 1) * 1000
             ELSE maj * 1000000 + coalesce(minor, 0) * 1000
                  + coalesce(patch, 0) + 1
           END AS hi
    FROM comp
), vk AS (
    SELECT dep, maj * 1000000 + minor * 1000 + patch AS vkey
    FROM releases
), res AS (
    SELECT b.repo, b.dep, b.spec, max(v.vkey) AS best,
           CAST(count(v.vkey) AS BIGINT) AS n_candidates
    FROM bounds b
    LEFT JOIN vk v
      ON v.dep = b.dep AND v.vkey >= b.lo AND v.vkey < b.hi
    GROUP BY b.repo, b.dep, b.spec
)
SELECT repo, dep, spec,
       CASE WHEN best IS NOT NULL THEN
            CAST(best // 1000000 AS VARCHAR) || '.'
            || CAST((best // 1000) % 1000 AS VARCHAR) || '.'
            || CAST(best % 1000 AS VARCHAR) END AS resolved,
       n_candidates
FROM res
""".strip()


# --------------------------------------- dependency-graph analytics
#
# The lockfile table semver_resolve() pins is the raw material of the
# north star's (repo -> repo) link graph. The operators below are the
# registry-tooling layer a real dependency crawl needs on top of it:
# the composed repo graph, transitive impact (blast radius), version
# drift vs latest release, and diamond version conflicts. Reference
# parity note: jxiw/ADOPT has no manifest surface — these extend the
# engine for the code-payload mandate (like functions/code.py); their
# join/aggregate shapes reuse the engine's motif/reachability plans.

_OWNER_MOD = 211  # the synthetic repo universe (repo0..repo210)


def dep_owner(dep: Column) -> Column:
    """Deterministic package -> owning-repo map for the synthetic
    universe: ``libJ`` is published from ``repo((J*53+17) % 211)``.
    The affine map is coprime with 211 (prime), so distinct packages
    spread across the repo space. Pure Column ops; the DuckDB twins
    recompute it digit-for-digit."""
    j = F.regexp_extract(dep, r"([0-9]+)$", 1).cast("long")
    return F.concat(F.lit("repo"),
                    ((j * 53 + 17) % _OWNER_MOD).cast("string"))


def dep_edges(resolved: DataFrame) -> DataFrame:
    """Pinned lockfile rows -> the distinct repo->repo dependency
    edge table (src depends on dst). Unresolved rows (NULL
    ``resolved``) carry no edge; self-loops are dropped. One
    projection + one distinct — the edge-extraction step of the
    north-star pipeline in its manifest form."""
    return (resolved
            .where(F.col("resolved").isNotNull())
            .select(F.col("repo").alias("src"),
                    dep_owner(F.col("dep")).alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct())


def _khop_pairs(edges: DataFrame, max_hops: int) -> DataFrame:
    """Distinct (root, v) pairs with 1 <= hops <= max_hops and
    v != root (a cycle back to the root adds no new frontier — every
    continuation from (root, root) is already in the 1-hop set, so
    dropping those pairs early is exact).

    Plan shape: frontier-delta iteration — each round joins only the
    NEW pairs against the edge table, anti-joins the accumulated set,
    and early-stops when the frontier drains. Every step is a
    bounded-key equi-join + distinct; the accumulated frame is
    O(reachable pairs), never paths. At 100-TB graph scale the exact
    all-pairs closure is capped by ``max_hops`` (this operator's
    contract); the unbounded approximate path is algos/anf.py.
    """
    e = edges.select("src", "dst").distinct().persist()
    reach = (e.select(F.col("src").alias("root"),
                      F.col("dst").alias("v"))
             .distinct().persist())
    frontier = reach
    for _ in range(max_hops - 1):
        nxt = (frontier.join(e, frontier["v"] == e["src"])
               .select("root", F.col("dst").alias("v"))
               .where(F.col("root") != F.col("v"))
               .distinct()
               .join(reach, ["root", "v"], "left_anti")
               .persist())
        if not nxt.limit(1).count():
            nxt.unpersist()
            break
        old = reach
        reach = reach.union(nxt).persist()
        reach.count()
        old.unpersist()
        if frontier is not old:
            frontier.unpersist()
        frontier = nxt
    e.unpersist()
    return reach


def dep_impact(edges: DataFrame, max_hops: int = 4) -> DataFrame:
    """Per-repo transitive dependency footprint within ``max_hops``:
    ``n_deps`` = how many repos it (transitively) depends on, and
    ``n_dependents`` = how many repos (transitively) depend on it —
    the blast radius a bad release propagates to. Both aggregates
    read the SAME k-hop pair set (one closure, two group-bys)."""
    reach = _khop_pairs(edges, max_hops)
    verts = (edges.select(F.col("src").alias("repo"))
             .union(edges.select(F.col("dst").alias("repo")))
             .distinct())
    n_deps = reach.groupBy("root").agg(
        F.count("*").cast("long").alias("n_deps"))
    n_dependents = reach.groupBy("v").agg(
        F.count("*").cast("long").alias("n_dependents"))
    out = (verts
           .join(n_deps, verts["repo"] == n_deps["root"], "left")
           .join(n_dependents, verts["repo"] == n_dependents["v"], "left")
           .select("repo",
                   F.coalesce("n_deps", F.lit(0)).alias("n_deps"),
                   F.coalesce("n_dependents", F.lit(0))
                   .alias("n_dependents")))
    return out


def _resolved_vkey(col: Column) -> Column:
    """'M.N.P' -> the sortable int64 key (inverse of the resolve
    output formatting; components < 1000 by construction)."""
    p = F.split(col, r"\.")
    return (F.get(p, 0).cast("long") * 1_000_000
            + F.get(p, 1).cast("long") * 1_000
            + F.get(p, 2).cast("long"))


def dep_outdated(resolved: DataFrame, releases: DataFrame) -> DataFrame:
    """Per-repo version-drift report (the ``npm outdated`` summary):
    classify every requirement against its dep's LATEST release —
    ``current`` / ``patch_behind`` / ``minor_behind`` /
    ``major_behind`` / ``unresolved`` — and roll the counts up per
    repo. One max-per-dep aggregate + one dep equi-join + one
    conditional-aggregation pass (all partial-agg friendly)."""
    latest = (releases
              .select(F.col("dep"),
                      version_key(F.col("maj"), F.col("minor"),
                                  F.col("patch")).alias("_lk"))
              .groupBy("dep").agg(F.max("_lk").alias("_latest")))
    rk = _resolved_vkey(F.col("resolved"))
    cls = (F.when(F.col("resolved").isNull(), F.lit("unresolved"))
           .when(rk == F.col("_latest"), F.lit("current"))
           .when(F.expr("_rk div 1000000") < F.expr("_latest div 1000000"),
                 F.lit("major_behind"))
           .when(F.expr("_rk div 1000") < F.expr("_latest div 1000"),
                 F.lit("minor_behind"))
           .otherwise(F.lit("patch_behind")))
    tagged = (resolved.join(latest, "dep", "left")
              .withColumn("_rk", rk)
              .withColumn("_cls", cls))

    def n(tag: str) -> Column:
        return F.sum(F.when(F.col("_cls") == tag, 1).otherwise(0)) \
                .cast("long").alias(f"n_{tag}")

    return (tagged.groupBy("repo")
            .agg(F.count("*").cast("long").alias("n_reqs"),
                 n("current"), n("patch_behind"), n("minor_behind"),
                 n("major_behind"), n("unresolved")))


def dep_conflicts(resolved: DataFrame, max_hops: int = 4) -> DataFrame:
    """Diamond version conflicts: for each root repo, packages pinned
    to MORE THAN ONE version across the root's transitive dependency
    closure (root itself included) — the incompatibility npm's
    node_modules nesting papers over and flat resolvers (cargo,
    poetry) must solve. Output: (repo, dep, n_versions,
    lowest, highest) ordered nowhere (the gate sorts).

    Plan: the k-hop closure pair set + one member equi-join onto the
    pinned lockfile + one (root, dep) aggregate with count(DISTINCT)
    and min_by/max_by on the int64 version key (version strings do
    not compare lexicographically)."""
    pinned = (resolved
              .where(F.col("resolved").isNotNull())
              .select("repo", "dep", "resolved")
              .distinct()
              .withColumn("_rk", _resolved_vkey(F.col("resolved"))))
    edges = dep_edges(resolved)
    members = (pinned.select(F.col("repo").alias("root"),
                             F.col("repo").alias("v"))
               .union(_khop_pairs(edges, max_hops))
               .distinct())
    joined = members.join(pinned, members["v"] == pinned["repo"])
    return (joined.groupBy("root", "dep")
            .agg(F.countDistinct("resolved").cast("long")
                 .alias("n_versions"),
                 F.min_by("resolved", "_rk").alias("lowest"),
                 F.max_by("resolved", "_rk").alias("highest"))
            .where(F.col("n_versions") > 1)
            .select(F.col("root").alias("repo"), "dep",
                    "n_versions", "lowest", "highest"))


# ------------------------------------------------ DuckDB twins

def _resolved_cte(thin: int = 1) -> str:
    """The semver_resolve output as a subquery (the twins compose it
    the way the Spark operators compose semver_resolve())."""
    return "(" + semver_resolve_sql(thin) + ")"


def _dep_edges_sql(thin: int = 1) -> str:
    return f"""
    SELECT DISTINCT
           repo AS src,
           'repo' || CAST((CAST(regexp_extract(dep, '([0-9]+)$', 1)
                               AS BIGINT) * 53 + 17) % {_OWNER_MOD}
                          AS VARCHAR) AS dst
    FROM {_resolved_cte(thin)}
    WHERE resolved IS NOT NULL
      AND repo <> 'repo' || CAST((CAST(regexp_extract(dep,
              '([0-9]+)$', 1) AS BIGINT) * 53 + 17) % {_OWNER_MOD}
              AS VARCHAR)
""".strip()


def _khop_ctes(max_hops: int, thin: int = 1) -> str:
    """edges + r1..rk + reach CTE bodies shared by the twins (level
    frontiers deduped by UNION — same pair set as _khop_pairs)."""
    parts = [f"edges AS (\n{_dep_edges_sql(thin)}\n)",
             "r1 AS (SELECT DISTINCT src AS root, dst AS v FROM edges)"]
    for i in range(2, max_hops + 1):
        parts.append(
            f"r{i} AS (SELECT DISTINCT r.root, e.dst AS v\n"
            f"  FROM r{i - 1} r JOIN edges e ON e.src = r.v\n"
            f"  WHERE e.dst <> r.root)")
    union = "\nUNION\n".join(
        f"SELECT root, v FROM r{i}" for i in range(1, max_hops + 1))
    parts.append(f"reach AS (\n{union}\n)")
    return ",\n".join(parts)


def dep_impact_sql(max_hops: int = 4, thin: int = 1) -> str:
    return f"""
WITH {_khop_ctes(max_hops, thin)},
verts AS (
    SELECT src AS repo FROM edges UNION SELECT dst FROM edges
)
SELECT verts.repo,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_deps,
       CAST(coalesce(p.n, 0) AS BIGINT) AS n_dependents
FROM verts
LEFT JOIN (SELECT root, count(*) AS n FROM reach GROUP BY root) d
       ON d.root = verts.repo
LEFT JOIN (SELECT v, count(*) AS n FROM reach GROUP BY v) p
       ON p.v = verts.repo
""".strip()


def dep_outdated_sql() -> str:
    return f"""
WITH resolved AS (
    SELECT * FROM {_resolved_cte()}
), latest AS (
    SELECT dep,
           max(maj * 1000000 + minor * 1000 + patch) AS latest
    FROM ({_synthetic_releases_sql()})
    GROUP BY dep
), tagged AS (
    SELECT r.repo,
           CASE
             WHEN r.resolved IS NULL THEN 'unresolved'
             WHEN CAST(string_split(r.resolved, '.')[1] AS BIGINT) * 1000000
                + CAST(string_split(r.resolved, '.')[2] AS BIGINT) * 1000
                + CAST(string_split(r.resolved, '.')[3] AS BIGINT)
                = l.latest THEN 'current'
             WHEN CAST(string_split(r.resolved, '.')[1] AS BIGINT)
                < l.latest // 1000000 THEN 'major_behind'
             WHEN CAST(string_split(r.resolved, '.')[1] AS BIGINT) * 1000
                + CAST(string_split(r.resolved, '.')[2] AS BIGINT)
                < l.latest // 1000 THEN 'minor_behind'
             ELSE 'patch_behind'
           END AS cls
    FROM resolved r LEFT JOIN latest l ON l.dep = r.dep
)
SELECT repo,
       CAST(count(*) AS BIGINT) AS n_reqs,
       CAST(sum(CASE WHEN cls = 'current' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_current,
       CAST(sum(CASE WHEN cls = 'patch_behind' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_patch_behind,
       CAST(sum(CASE WHEN cls = 'minor_behind' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_minor_behind,
       CAST(sum(CASE WHEN cls = 'major_behind' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_major_behind,
       CAST(sum(CASE WHEN cls = 'unresolved' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unresolved
FROM tagged
GROUP BY repo
""".strip()


def dep_conflicts_sql(max_hops: int = 4, thin: int = 1) -> str:
    return f"""
WITH {_khop_ctes(max_hops, thin)},
pinned AS (
    SELECT DISTINCT repo, dep, resolved,
           CAST(string_split(resolved, '.')[1] AS BIGINT) * 1000000
         + CAST(string_split(resolved, '.')[2] AS BIGINT) * 1000
         + CAST(string_split(resolved, '.')[3] AS BIGINT) AS rk
    FROM {_resolved_cte(thin)}
    WHERE resolved IS NOT NULL
), members AS (
    SELECT repo AS root, repo AS v FROM pinned
    UNION
    SELECT root, v FROM reach
)
SELECT m.root AS repo, p.dep,
       CAST(count(DISTINCT p.resolved) AS BIGINT) AS n_versions,
       arg_min(p.resolved, p.rk) AS lowest,
       arg_max(p.resolved, p.rk) AS highest
FROM members m JOIN pinned p ON p.repo = m.v
GROUP BY m.root, p.dep
HAVING count(DISTINCT p.resolved) > 1
""".strip()


# ------------------------------------------------ license exposure

_LICENSES = ("Apache-2.0", "MIT", "GPL-3.0-only", "BSD-3-Clause",
             "Proprietary")
_RESTRICTIVE = ("GPL-3.0-only", "Proprietary")


def repo_license(repo: Column) -> Column:
    """Deterministic repo -> SPDX license for the synthetic universe:
    license(repoN) = LICENSES[(N*31 + 7) % 5]. An affine index map
    both engines replay digit-for-digit (the fixture-law pattern of
    dep_owner)."""
    n = F.regexp_extract(repo, r"([0-9]+)$", 1).cast("long")
    idx = (n * 31 + 7) % 5
    out = F.lit(_LICENSES[-1])
    for i in range(len(_LICENSES) - 2, -1, -1):
        out = F.when(idx == i, F.lit(_LICENSES[i])).otherwise(out)
    return out


def license_exposure(edges: DataFrame, max_hops: int = 4) -> DataFrame:
    """Transitive license compliance (the SBOM question): for every
    repo, the union of licenses across itself and every repo in its
    <= max_hops dependency closure -> [repo, n_repos, n_licenses,
    licenses (sorted ','-join), n_restrictive].

    A repo vendoring a GPL or proprietary dep ANYWHERE downstream is
    exposed — exactly the per-root set-union over the same
    frontier-delta closure dep_impact uses (licenses ride the closure
    pairs; the union is one distinct-agg per root, never per path).
    ``n_restrictive`` counts closure members carrying a restrictive
    license — 0 means the repo ships clean.
    """
    verts = (edges.select(F.col("src").alias("v"))
             .union(edges.select(F.col("dst").alias("v"))).distinct())
    members = (verts.select(F.col("v").alias("root"), "v")
               .union(_khop_pairs(edges, max_hops)
                      .select("root", "v")))
    lic = verts.select("v", repo_license(F.col("v")).alias("license"))
    restrictive = F.col("license").isin(*_RESTRICTIVE)
    return (members.join(lic, "v")
            .groupBy(F.col("root").alias("repo"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_repos"),
                 F.countDistinct("license").cast("long")
                 .alias("n_licenses"),
                 F.array_join(F.sort_array(F.collect_set("license")), ",")
                 .alias("licenses"),
                 F.sum(F.when(restrictive, 1).otherwise(0)).cast("long")
                 .alias("n_restrictive")))


def license_exposure_sql(max_hops: int = 4, thin: int = 1) -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{l}'" for i, l in enumerate(_LICENSES[:-1]))
    restrictive = ", ".join(f"'{l}'" for l in _RESTRICTIVE)
    return f"""
WITH {_khop_ctes(max_hops, thin)},
verts AS (
    SELECT src AS v FROM edges UNION SELECT dst FROM edges
), members AS (
    SELECT v AS root, v FROM verts
    UNION
    SELECT root, v FROM reach
), lic AS (
    SELECT v, CASE (CAST(regexp_extract(v, '([0-9]+)$', 1) AS BIGINT)
                    * 31 + 7) % 5
              {cases} ELSE '{_LICENSES[-1]}' END AS license
    FROM verts
)
SELECT m.root AS repo,
       CAST(count(*) AS BIGINT) AS n_repos,
       CAST(count(DISTINCT l.license) AS BIGINT) AS n_licenses,
       array_to_string(list_sort(list(DISTINCT l.license)), ',')
           AS licenses,
       CAST(sum(CASE WHEN l.license IN ({restrictive}) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_restrictive
FROM members m JOIN lic l ON l.v = m.v
GROUP BY m.root
""".strip()
