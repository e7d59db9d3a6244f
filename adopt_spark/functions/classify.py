"""Multinomial Naive Bayes, trained and evaluated relationally.

The engine's first LEARNED classifier surface (the heuristic lang_id
UDF votes stopword lists; this TRAINS a model from labeled data):
multinomial NB with add-one smoothing, fitted on a deterministic
train split and scored on the held-out test split, reported as a
confusion matrix. NB's log-linear form is exactly a relational
pipeline — two hash aggregates to fit, one join + one aggregate to
score — so the whole train-and-eval loop stays inside Catalyst with
zero Python and has a digit-for-digit SQL twin.

Scoring identity (per test doc d, class L):

  score(L | d) = ln prior(L)
               + sum over tokens w of ln( (c_L(w)+1) / (N_L+V) )
             = ln prior(L) + [ sum over tokens of ln(c_L(w)+1) ]
               - n_d * ln(N_L + V)

The bracketed sum only needs (term, lang) rows where c_L(w) > 0, so
unseen tokens cost nothing (ln 1 = 0) and the score decomposes into
one sparse join-aggregate plus a dense doc x class frame of
constants — the trick that makes NB scoring shuffle only the token
stream, never a dense doc x vocab matrix.

Cross-engine determinism: counts, priors, vocab size are exact
integers; the argmax ranks on the 6 dp-ROUNDED score (summation-order
and libm last-ulp drift is ~1e-13, far below the quantum) with class
label as the tie-break.

Scale shape: fit = two map-side-partial hash aggs over the train
token stream; the (term, lang) model is vocabulary-sized and
broadcast onto the test token stream; scoring = one doc-keyed agg
per class row + one per-doc argmax window (doc-keyed, no global
sort). Classes are the small dimension (a handful of langs), so the
dense constants frame is |test docs| x |classes|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# deterministic split law shared with t_dataset_split / t_pipeline_e2e
SPLIT_A, SPLIT_B, SPLIT_M = 2654435761, 104729, 2147483647


def _toks(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id", "lang",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
         .alias("term"),
    ).where(F.col("term") != "")


def nb_lang_confusion(docs: DataFrame, train_pct: int = 80,
                      text_col: str = "text") -> DataFrame:
    """Train multinomial NB on the deterministic ``train_pct`` split,
    classify the held-out docs, return the confusion matrix
    [lang (true), pred, n] — diagonal mass = accuracy.

    Split: (A*doc_id + B) % M % 100 < train_pct (the engine's shared
    split law). Test docs with no tokens are classified by prior
    alone.
    """
    if not 0 < train_pct < 100:
        raise ValueError(f"train_pct must be in (0, 100), got {train_pct}")
    bucket = ((F.lit(SPLIT_A) * F.col("doc_id") + F.lit(SPLIT_B))
              % F.lit(SPLIT_M)) % 100
    tagged = docs.withColumn("is_train", bucket < train_pct)
    train = tagged.where("is_train")
    test = tagged.where("NOT is_train")

    tt = _toks(train, text_col)
    cf = tt.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    per_lang = cf.groupBy("lang").agg(F.sum("c").alias("n_l"))
    vocab = cf.select("term").distinct().agg(
        F.count(F.lit(1)).alias("v"))
    prior = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    classes = (per_lang.join(prior, "lang")
               .crossJoin(F.broadcast(vocab))
               .crossJoin(F.broadcast(n_train))
               .select(F.col("lang").alias("cls"), "n_l", "v",
                       "n_docs", "n_train"))

    te = _toks(test, text_col)
    # sparse part: sum of ln(c+1) over (token, class) hits
    sparse = (te.join(F.broadcast(cf.withColumnRenamed("lang", "cls")),
                      "term")
              .groupBy("doc_id", "cls")
              .agg(F.sum(F.log(F.col("c") + 1)).alias("s1")))
    n_d = te.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_d"))
    dense = (test.select("doc_id", "lang")
             .join(n_d, "doc_id", "left")
             .crossJoin(F.broadcast(classes)))
    scored = (dense.join(sparse, ["doc_id", "cls"], "left")
              .select(
                  "doc_id", "lang", "cls",
                  F.round(
                      F.log(F.col("n_docs") / F.col("n_train"))
                      + F.coalesce("s1", F.lit(0.0))
                      - F.coalesce("n_d", F.lit(0))
                      * F.log((F.col("n_l") + F.col("v")).cast("double")),
                      6).alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    pred = (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", "lang", F.col("cls").alias("pred")))
    return (pred.groupBy("lang", "pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


NB_CONFUSION_SQL = r"""
WITH tagged AS (
    SELECT *, ((2654435761 * doc_id + 104729) % 2147483647) % 100 < 80
               AS is_train
    FROM documents
), tr AS (
    SELECT * FROM tagged WHERE is_train
), te AS (
    SELECT * FROM tagged WHERE NOT is_train
), tr_toks AS (
    SELECT doc_id, lang, term FROM (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM tr
    ) WHERE term <> ''
), cf AS (
    SELECT lang, term, count(*) AS c FROM tr_toks GROUP BY 1, 2
), per_lang AS (
    SELECT lang, sum(c) AS n_l FROM cf GROUP BY 1
), vocab AS (
    SELECT count(DISTINCT term) AS v FROM cf
), prior AS (
    SELECT lang, count(*) AS n_docs FROM tr GROUP BY 1
), n_train AS (
    SELECT count(*) AS n_train FROM tr
), classes AS (
    SELECT p.lang AS cls, p.n_l, vocab.v, pr.n_docs, n_train.n_train
    FROM per_lang p JOIN prior pr USING (lang), vocab, n_train
), te_toks AS (
    SELECT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM te
    ) WHERE term <> ''
), sparse AS (
    SELECT t.doc_id, c.lang AS cls, sum(ln(c.c + 1)) AS s1
    FROM te_toks t JOIN cf c USING (term)
    GROUP BY 1, 2
), n_d AS (
    SELECT doc_id, count(*) AS n_d FROM te_toks GROUP BY 1
), scored AS (
    SELECT te.doc_id, te.lang, cl.cls,
           round(ln(cl.n_docs / CAST(cl.n_train AS DOUBLE))
                 + coalesce(sp.s1, 0.0)
                 - coalesce(nd.n_d, 0)
                   * ln(CAST(cl.n_l + cl.v AS DOUBLE)), 6) AS score
    FROM te
    CROSS JOIN classes cl
    LEFT JOIN n_d nd ON nd.doc_id = te.doc_id
    LEFT JOIN sparse sp ON sp.doc_id = te.doc_id AND sp.cls = cl.cls
), pred AS (
    SELECT doc_id, lang, cls AS pred FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cls ASC) AS rn
        FROM scored
    ) WHERE rn = 1
)
SELECT lang, pred, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
""".strip()
