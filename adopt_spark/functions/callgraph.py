"""Symbol-level call-graph extraction from source text.

The import/dependency edges (extract.py) link repos at MODULE
granularity; a training-data / code-analytics pipeline also needs the
finer SYMBOL granularity: which documents *define* a function and
which *call* it, resolved through a shared symbol table. The
reference's data model has no notion of code symbols at all — this is
part of the code-corpus surface built beyond it (SURVEY.md §2 "beyond
reference" track, same family as winnowing/secret-scan in code.py).

Fixture contract (same pattern as code.py:synthetic_code_content):
``synthetic_symbol_content`` plants a deterministic definition/call
law into the document text as a pure Column expression with a
byte-identical DuckDB twin, so extraction is verified against known
positives. The EXTRACTOR itself is generic — it works on any text
containing ``def <sym>(`` / ``<sym>(`` call sites.

Plan shape (the part that matters at 10^12 files):
  one regexp projection per doc  →  two explodes (defs, calls)
  →  ONE equi-join on the symbol key  →  partial-aggregated rollup.
Hot symbols (utility functions imported everywhere) are ordinary
skewed join keys — AQE skew-join / salting applies unchanged; nothing
is driver-resident and no stage is quadratic in corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------ fixture law
#
# doc d defines  sym_{d % NSYM}
# doc d calls    sym_{(7*d + 13*j) % NSYM}  for j = 1 .. (d % 3 + 1)
#
# NSYM << n_docs, so every symbol has many definers and callers and
# the low-id symbols behave like hub utility functions.

NSYM = 97

_DEF_RE = r"def (sym_\d+)\("
_CALL_RE = r"call (sym_\d+)\("


def synthetic_symbol_content(doc_id: str = "doc_id",
                             text_col: str = "text") -> Column:
    """Document text + planted ``def sym_K(x):`` and 1..3
    ``call sym_J()`` sites per the law above."""
    did = F.col(doc_id)
    seg = [F.col(text_col),
           F.concat(F.lit("\ndef sym_"),
                    (did % NSYM).cast("string"), F.lit("(x):"))]
    for j in (1, 2, 3):
        line = F.concat(F.lit("\ncall sym_"),
                        ((did * 7 + 13 * j) % NSYM).cast("string"),
                        F.lit("()"))
        seg.append(F.when(did % 3 >= j - 1, line).otherwise(F.lit("")))
    return F.concat(*seg)


def _synthetic_symbol_content_sql(doc_id: str = "doc_id",
                                  text_col: str = "text") -> str:
    parts = [text_col,
             f"'\ndef sym_' || CAST({doc_id} % {NSYM} AS VARCHAR) || '(x):'"]
    for j in (1, 2, 3):
        parts.append(
            f"CASE WHEN {doc_id} % 3 >= {j - 1} THEN "
            f"'\ncall sym_' || CAST(({doc_id} * 7 + 13 * {j}) % {NSYM}"
            f" AS VARCHAR) || '()' ELSE '' END")
    return " || ".join(parts)


# ------------------------------------------------------ extraction


def symbol_defs(docs: DataFrame, content: Column | None = None) -> DataFrame:
    """(doc_id, symbol) — one row per definition site."""
    c = content if content is not None else synthetic_symbol_content()
    return (docs
            .select("doc_id",
                    F.explode(F.regexp_extract_all(c, F.lit(_DEF_RE),
                                                   F.lit(1)))
                    .alias("symbol")))


def symbol_calls(docs: DataFrame, content: Column | None = None) -> DataFrame:
    """(doc_id, symbol) — one row per call site."""
    c = content if content is not None else synthetic_symbol_content()
    return (docs
            .select("doc_id",
                    F.explode(F.regexp_extract_all(c, F.lit(_CALL_RE),
                                                   F.lit(1)))
                    .alias("symbol")))


def call_graph_report(docs: DataFrame,
                      content: Column | None = None) -> DataFrame:
    """Per-symbol resolution report over the corpus.

    Returns DataFrame[symbol, n_defs, n_call_sites, n_callers,
    n_cross_edges] where n_cross_edges counts DISTINCT resolved
    (caller_doc, definer_doc) pairs with caller != definer — the
    symbol's contribution to the doc-level call graph.

    Both sides reduce BEFORE the join where possible: call sites
    collapse to per-(doc, symbol) rows only in the distinct-pair
    branch; the raw site counts come from one map-side-combined
    aggregate that never joins at all.
    """
    defs = symbol_defs(docs, content)
    calls = symbol_calls(docs, content)

    per_sym_defs = defs.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_defs"))
    per_sym_calls = calls.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_call_sites"),
        F.countDistinct("doc_id").alias("n_callers"))

    # resolved cross edges: distinct caller x definer per symbol.
    # Distinct-reduce the call side to (doc, symbol) first — the join
    # fan-out is then |callers| x |definers| per symbol, the true
    # output size, not call-site multiplicity.
    caller_docs = calls.dropDuplicates(["doc_id", "symbol"])
    edges = (caller_docs.join(
                 defs.withColumnRenamed("doc_id", "def_doc"), "symbol")
             .where(F.col("doc_id") != F.col("def_doc"))
             .groupBy("symbol")
             .agg(F.countDistinct("doc_id", "def_doc")
                  .alias("n_cross_edges")))

    return (per_sym_defs
            .join(per_sym_calls, "symbol", "full_outer")
            .join(edges, "symbol", "left")
            .select("symbol",
                    F.coalesce("n_defs", F.lit(0)).alias("n_defs"),
                    F.coalesce("n_call_sites", F.lit(0))
                     .alias("n_call_sites"),
                    F.coalesce("n_callers", F.lit(0)).alias("n_callers"),
                    F.coalesce("n_cross_edges", F.lit(0))
                     .alias("n_cross_edges"))
            .orderBy("symbol"))


def call_graph_report_sql(docs_table: str = "documents") -> str:
    """DuckDB twin over the identical planted content."""
    content = _synthetic_symbol_content_sql()
    return f"""
WITH c AS (
    SELECT doc_id, {content} AS content FROM {docs_table}
), defs AS (
    SELECT doc_id,
           unnest(regexp_extract_all(content, '{_DEF_RE}', 1)) AS symbol
    FROM c
), calls AS (
    SELECT doc_id,
           unnest(regexp_extract_all(content, '{_CALL_RE}', 1)) AS symbol
    FROM c
), d AS (
    SELECT symbol, count(*) AS n_defs FROM defs GROUP BY symbol
), s AS (
    SELECT symbol, count(*) AS n_call_sites,
           count(DISTINCT doc_id) AS n_callers
    FROM calls GROUP BY symbol
), e AS (
    SELECT symbol, count(*) AS n_cross_edges FROM (
        SELECT DISTINCT ca.symbol, ca.doc_id, de.doc_id AS def_doc
        FROM (SELECT DISTINCT doc_id, symbol FROM calls) ca
        JOIN defs de USING (symbol)
        WHERE ca.doc_id <> de.doc_id
    ) GROUP BY symbol
)
SELECT symbol,
       coalesce(d.n_defs, 0) AS n_defs,
       coalesce(s.n_call_sites, 0) AS n_call_sites,
       coalesce(s.n_callers, 0) AS n_callers,
       coalesce(e.n_cross_edges, 0) AS n_cross_edges
FROM d
FULL OUTER JOIN s USING (symbol)
LEFT JOIN e USING (symbol)
ORDER BY symbol
""".strip()


# ------------------------------------------------ symbol health


def symbol_health(docs: DataFrame,
                  def_docs_below: int = 50,
                  call_docs_below: int = 30,
                  content: Column | None = None) -> DataFrame:
    """Cross-reference the definitions of one corpus slice against the
    call sites of another — the 'does the release branch still resolve
    against HEAD' check a code-corpus pipeline runs before training on
    paired (caller, definition) examples.

    Definitions are counted from docs with doc_id < ``def_docs_below``,
    call sites from docs with doc_id < ``call_docs_below`` (slices of
    the SAME corpus so the planted law stays oracle-replayable; in
    production the two frames are different snapshots). Per symbol:

      status = 'ok'          defined in the def slice AND called
               'dead'        defined, never called from the call slice
               'unresolved'  called, no definition in the def slice

    Returns DataFrame[symbol, n_defs, n_calls, status] ordered by
    symbol. Plan: two filtered extractions, two per-symbol aggregates,
    ONE full-outer equi-join on the symbol key.
    """
    d = symbol_defs(docs.where(F.col("doc_id") < def_docs_below), content)
    c = symbol_calls(docs.where(F.col("doc_id") < call_docs_below), content)
    nd = d.groupBy("symbol").agg(F.count(F.lit(1)).alias("n_defs"))
    nc = c.groupBy("symbol").agg(F.count(F.lit(1)).alias("n_calls"))
    return (nd.join(nc, "symbol", "full_outer")
            .select(
                "symbol",
                F.coalesce("n_defs", F.lit(0)).alias("n_defs"),
                F.coalesce("n_calls", F.lit(0)).alias("n_calls"),
                F.when(F.col("n_defs").isNull(), F.lit("unresolved"))
                 .when(F.col("n_calls").isNull(), F.lit("dead"))
                 .otherwise(F.lit("ok")).alias("status"))
            .orderBy("symbol"))


def symbol_health_sql(docs_table: str = "documents",
                      def_docs_below: int = 50,
                      call_docs_below: int = 30) -> str:
    """DuckDB twin over the identical planted content and slices."""
    content = _synthetic_symbol_content_sql()
    return f"""
WITH c AS (
    SELECT doc_id, {content} AS content FROM {docs_table}
), defs AS (
    SELECT doc_id,
           unnest(regexp_extract_all(content, '{_DEF_RE}', 1)) AS symbol
    FROM c WHERE doc_id < {def_docs_below}
), calls AS (
    SELECT doc_id,
           unnest(regexp_extract_all(content, '{_CALL_RE}', 1)) AS symbol
    FROM c WHERE doc_id < {call_docs_below}
), d AS (
    SELECT symbol, count(*) AS n_defs FROM defs GROUP BY symbol
), s AS (
    SELECT symbol, count(*) AS n_calls FROM calls GROUP BY symbol
)
SELECT symbol,
       coalesce(d.n_defs, 0) AS n_defs,
       coalesce(s.n_calls, 0) AS n_calls,
       CASE WHEN d.n_defs IS NULL THEN 'unresolved'
            WHEN s.n_calls IS NULL THEN 'dead'
            ELSE 'ok' END AS status
FROM d
FULL OUTER JOIN s USING (symbol)
ORDER BY symbol
""".strip()
