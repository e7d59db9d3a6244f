"""Distributed BPE tokenizer training — merge-rule learning as
relational supersteps.

The engine's text surface already COUNTS BPE-ish tokens
(text.word_token_count); this module LEARNS the merge table itself,
the way sentencepiece/HF trainers do, but over the vocabulary as a
DataFrame so a 100-TB corpus trains with bounded driver state:

1. One corpus pass builds the (word, freq) vocabulary — classic BPE
   never rescans the corpus, it iterates on the vocab weighted by
   frequency (Sennrich et al. 2016).
2. Each merge round is ONE pair-count aggregate over the symbol
   sequences (adjacent pairs via two array slices + arrays_zip — no
   window, no per-row Python), one deterministic argmax (count desc,
   then lexicographic), and one literal string replace applied to the
   vocab. Only the learned (lhs, rhs) pair crosses to the driver —
   the model IS the output, 1 row per round.

Merge-application convention (documented, shared with the SQL twin):
the pair pattern ``' a b '`` is replaced left-to-right,
non-overlapping, repeated ``passes`` times per round (default 3).
For runs of >= 4 IDENTICAL symbols inside one word this can differ
from strict leftmost greedy BPE ('aaaa' merges as 'aa a a' -> 'aa aa'
across passes rather than in one scan); both engines implement the
identical convention, so results stay exactly comparable — and on
natural-language vocabularies the two conventions coincide.

Only lowercase-alpha words enter the vocabulary (regex-safe, no
multi-byte '.' semantics divergence between Java regex and RE2).

Reference parity note: jxiw/ADOPT has no text surface; this extends
the engine for the LLM-training-data mandate like functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _vocab(docs: DataFrame, text_col: str) -> DataFrame:
    words = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
    return (words
            .where(F.col("word").rlike("^[a-z]+$"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
            .select(
                F.concat(F.lit(" "),
                         F.regexp_replace("word", "(.)", "$1 "))
                .alias("repr"),
                "freq"))


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text", passes: int = 3) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus. Output:
    DataFrame[rank int, lhs string, rhs string, merged string,
    pair_count long] — rank 1 is the first (highest-count) merge;
    ``pair_count`` is the frequency-weighted adjacent-pair count at
    the time the rule was learned. Stops early if the vocabulary
    runs out of adjacent pairs."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    vocab = _vocab(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("repr")), " ")
        n = F.size(syms)
        pair = F.explode(F.arrays_zip(
            F.slice(syms, 1, n - 1).alias("a"),
            F.slice(syms, 2, n - 1).alias("b"))).alias("p")
        top = (vocab.where(n >= 2)
               .select(pair, "freq")
               .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
               .agg(F.sum("freq").cast("long").alias("cnt"))
               .orderBy(F.desc("cnt"), "a", "b")
               .limit(1).collect())
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        merges.append((rank, a, b, a + b, cnt))
        # literal replace, `passes` times (the documented convention)
        expr = "repr"
        for _ in range(passes):
            expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
        vocab = (vocab.select(F.expr(expr).alias("repr"), "freq")
                 .localCheckpoint(eager=True))
    return spark.createDataFrame(
        merges,
        "rank int, lhs string, rhs string, merged string, "
        "pair_count long")


def bpe_train_sql(n_merges: int = 8, passes: int = 3) -> str:
    """DuckDB twin over the ``documents`` view: the same vocabulary,
    pair counting (lateral unnest of the symbol index), argmax
    tie-break, and repeated-replace merge convention, unrolled
    ``n_merges`` rounds. Every CTE is MATERIALIZED — inlined, the
    6 scalar m-subqueries per round would re-instantiate the whole
    upstream chain ~7^rounds times (observed as an fd blowup). Requires the fixture to have >= n_merges
    rounds of available pairs (the engine early-stops; empty rounds
    here would propagate NULL patterns)."""
    parts = ["""w AS MATERIALIZED (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
    FROM documents
), v0 AS MATERIALIZED (
    SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS repr,
           CAST(count(*) AS BIGINT) AS freq
    FROM w WHERE regexp_matches(word, '^[a-z]+$')
    GROUP BY word
)"""]
    for r in range(1, n_merges + 1):
        parts.append(f"""p{r} AS MATERIALIZED (
    SELECT l[i] AS a, l[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
    FROM (SELECT string_split(trim(repr), ' ') AS l, freq
          FROM v{r - 1}) s,
         unnest(generate_series(1, len(l) - 1)) AS t(i)
    GROUP BY 1, 2
), m{r} AS MATERIALIZED (
    SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
)""")
        expr = "repr"
        for _ in range(passes):
            expr = (f"replace({expr}, "
                    f"(SELECT ' ' || a || ' ' || b || ' ' FROM m{r}), "
                    f"(SELECT ' ' || a || b || ' ' FROM m{r}))")
        parts.append(f"""v{r} AS MATERIALIZED (
    SELECT {expr} AS repr, freq FROM v{r - 1}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, a AS lhs, b AS rhs, a || b AS merged, "
        f"cnt AS pair_count FROM m{r}"
        for r in range(1, n_merges + 1))
    return f"WITH {', '.join(parts)}\n{union}"


def bpe_encode(docs: DataFrame, merges: DataFrame,
               text_col: str = "text", passes: int = 3) -> DataFrame:
    """Tokenize every document with a learned merge table: per doc,
    the BPE token count under the merges vs the raw character count —
    the compression-ratio signal a tokenizer sweep optimizes.

    The merge table is tiny (one row per rule) and collected to the
    driver ONCE to build a single Column expression: char-spaced words
    -> the rank-ordered replace chain (same ``passes`` convention as
    training) -> symbol count. The per-doc transformation is one pure
    JVM projection — no join, no shuffle, no Python; at 100 TB this is
    a map stage exactly like chunk_documents.

    Output: (doc_id, n_words, n_chars, n_bpe_tokens) over the
    lowercase-alpha words of each doc (the trainer's vocabulary
    universe)."""
    rules = [(r.lhs, r.rhs) for r in
             merges.orderBy("rank").select("rank", "lhs", "rhs").collect()]
    word = F.col("w")
    spaced = F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))
    expr = spaced
    for a, b in rules:
        for _ in range(passes):
            expr = F.replace(expr, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"))
    alpha = words.where(F.col("w").rlike("^[a-z]+$"))
    per_word = alpha.select(
        "doc_id",
        F.length(word).alias("chars"),
        F.size(F.split(F.trim(expr), " ")).alias("toks"))
    return (docs.select("doc_id")
            .join(per_word.groupBy("doc_id")
                  .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                       F.sum("chars").cast("long").alias("n_chars"),
                       F.sum("toks").cast("long").alias("n_bpe_tokens")),
                  "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_words", F.lit(0)).alias("n_words"),
                    F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
                    F.coalesce("n_bpe_tokens", F.lit(0))
                    .alias("n_bpe_tokens")))


def bpe_encode_sql(n_merges: int = 8, passes: int = 3) -> str:
    """DuckDB twin: trains the same merges (bpe_train_sql's CTE chain)
    and applies the identical rank-ordered replace chain to every doc
    word — the m{r} scalar subqueries supply the learned rules, so the
    oracle re-derives the tokenizer rather than trusting the engine's."""
    train = bpe_train_sql(n_merges, passes)
    # reuse the training CTE chain: cut at the final union (its first
    # branch is "SELECT 1 AS rank"), keep the WITH body, and append
    # the encoding stage
    cte_end = train.index("\nSELECT 1 AS rank")
    ctes = train[:cte_end]  # "WITH w AS ... )"
    expr = "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')"
    for r in range(1, n_merges + 1):
        for _ in range(passes):
            expr = (f"replace({expr}, "
                    f"(SELECT ' ' || a || ' ' || b || ' ' FROM m{r}), "
                    f"(SELECT ' ' || a || b || ' ' FROM m{r}))")
    return f"""{ctes},
docw AS MATERIALIZED (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
    FROM documents
), alpha AS MATERIALIZED (
    SELECT doc_id, w FROM docw WHERE regexp_matches(w, '^[a-z]+$')
), perword AS MATERIALIZED (
    SELECT doc_id, length(w) AS chars,
           len(string_split(trim({expr}), ' ')) AS toks
    FROM alpha
)
SELECT d.doc_id,
       CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(p.n_chars, 0) AS BIGINT) AS n_chars,
       CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d
LEFT JOIN (SELECT doc_id, count(*) AS n_words, sum(chars) AS n_chars,
                  sum(toks) AS n_bpe_tokens
           FROM perword GROUP BY doc_id) p
       ON p.doc_id = d.doc_id
""".strip()
