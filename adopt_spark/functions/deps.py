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


def synthetic_requirements(orders: DataFrame) -> DataFrame:
    """Deterministic manifest table from the ``orders`` fixture: one
    requirement per order, spec form cycling through the full
    supported grammar, components from coprime divisions of
    o_orderkey. DuckDB twin: :func:`_synthetic_requirements_sql`."""
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


def _synthetic_requirements_sql() -> str:
    mnp = ("CAST((o_orderkey // 7) % 4 AS VARCHAR) || '.' || "
           "CAST((o_orderkey // 11) % 8 AS VARCHAR) || '.' || "
           "CAST((o_orderkey // 13) % 5 AS VARCHAR)")
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
    FROM orders
""".strip()


def semver_resolve_sql() -> str:
    """DuckDB twin of :func:`semver_resolve` over the synthetic
    fixtures — identical grammar, identical interval arithmetic
    (DuckDB lists are 1-indexed and out-of-range indexing yields
    NULL, mirroring F.get)."""
    return f"""
WITH releases AS (
    {_synthetic_releases_sql()}
), requirements AS (
    {_synthetic_requirements_sql()}
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
