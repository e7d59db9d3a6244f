"""Generated DuckDB oracle SQL for the iterative / LSH / codec operators.

Round 1-2 left 11 contract entries rows-only ("no SQL-expressible
oracle"). This module closes that gap: every generator below produces
a self-contained ANSI-SQL (DuckDB 1.0) string that reproduces the
engine's output VALUE-FOR-VALUE on the driver's parquet tables, using
four techniques:

  * **fixed-iteration unrolling** — PageRank / LPA run a fixed number
    of supersteps on both sides; each superstep is one MATERIALIZED
    CTE (the same trick the round-2 ``a_cc_sizes`` recursive oracle
    used, generalized to non-monotone recurrences that recursive CTEs
    cannot express).
  * **bounded-depth peeling** — the k-core decomposition unrolls the
    peel schedule with per-stage round budgets calibrated (with
    margin) to the fixture's cascade depths; an under-budget would
    surface as a value mismatch, never silently.
  * **shared-hash replication** — simhash (md5-derived token hashes)
    and hyperplane LSH (seeded-numpy plane literals embedded in the
    SQL) are recomputed bit-for-bit in DuckDB, so even the
    *approximate* candidate generation is compared exactly.
  * **closed-form payloads** — PNG/PCM media pixels follow an
    arithmetic law over (media_id, i), so the decoded statistics have
    an exact SQL twin; a wrong inflate/unfilter step cannot reproduce
    them.

All constants here are part of the engine-side contract queries in
registry.py — keep the two in sync.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- PageRank

PR_ITERS = 12
PR_DAMPING = 0.85


def pagerank_fixed_sql(edge_sql: str, k_iters: int = PR_ITERS,
                       damping: float = PR_DAMPING,
                       top: int | None = None,
                       weighted: bool = False,
                       weighted_inline: bool = False,
                       personalized: int | None = None) -> str:
    """Fixed-iteration PageRank over the derived edge table.

    Recurrence (identical to algos/pagerank.py with tol=0):
      r_{t+1}(v) = (1-d)*p(v) + d * (contrib_t(v) + dangling_t * p(v))
    with contrib from out-degree-normalized in-edges and dangling mass
    summed over vertices with no out-edges. p is uniform 1/N, or —
    when ``personalized=K`` — uniform over the K smallest vertex ids
    and zero elsewhere (personalized PageRank: teleport AND dangling
    redistribution both follow p, and r0 = p, exactly like
    algos/pagerank.py with reset_vertices). Output rounded to 6 dp;
    ``top`` adds ORDER BY rank DESC, v LIMIT top.
    """
    # per-link share: w/Σw when weighted, 1/outdeg otherwise — the
    # exact twin of algos/pagerank.py's inv_deg column.
    # ``weighted_inline`` means edge_sql ALREADY yields (sid, tid, w)
    # — e.g. a co-occurrence projection's pair counts — instead of the
    # synthetic contract weight being attached here.
    weighted = weighted or weighted_inline
    contrib = ("sum(pr.r * e.w / od.outdeg)" if weighted
               else "sum(pr.r / od.outdeg)")
    steps = []
    for i in range(1, k_iters + 1):
        prev = f"r{i-1}"
        steps.append(f"""dm{i} AS MATERIALIZED (
    SELECT coalesce(sum(r), 0.0) AS m FROM {prev}
    WHERE v NOT IN (SELECT sid FROM edge)
), r{i} AS MATERIALIZED (
    SELECT verts.v,
           (1 - {damping}) * p.p + {damping} * (coalesce(c.contrib, 0.0)
                                    + (SELECT m FROM dm{i}) * p.p) AS r
    FROM verts
    JOIN pp p ON p.v = verts.v
    LEFT JOIN (
        SELECT e.tid AS v, {contrib} AS contrib
        FROM edge e JOIN {prev} pr ON pr.v = e.sid
        JOIN outdeg od ON od.sid = e.sid
        GROUP BY e.tid
    ) c ON c.v = verts.v
)""")
    tail = f"\nORDER BY rank DESC, v LIMIT {top}" if top else ""
    if weighted_inline:
        edge_cols = edge_sql
    elif weighted:
        edge_cols = ("SELECT sid, tid, CAST(1 + (sid * 7 + tid * 13) % 10 "
                     "AS DOUBLE) AS w FROM (\n{0}\n)".format(edge_sql))
    else:
        edge_cols = edge_sql
    od = ("SELECT sid, sum(w) AS outdeg FROM edge GROUP BY sid" if weighted
          else "SELECT sid, count(*) AS outdeg FROM edge GROUP BY sid")
    if personalized:
        rset = f"""), rset AS MATERIALIZED (
    SELECT v FROM verts ORDER BY v LIMIT {personalized}"""
        pp = (f"SELECT verts.v, CASE WHEN verts.v IN (SELECT v FROM rset) "
              f"THEN 1.0 / {personalized} ELSE 0.0 END AS p FROM verts")
    else:
        rset = ""
        pp = "SELECT v, 1.0 / (SELECT count(*) FROM verts) AS p FROM verts"
    return f"""WITH edge AS MATERIALIZED (
{edge_cols}
), verts AS MATERIALIZED (
    SELECT sid AS v FROM edge UNION SELECT tid FROM edge{rset}
), outdeg AS MATERIALIZED (
    {od}
), pp AS MATERIALIZED (
    {pp}
), r0 AS MATERIALIZED (
    SELECT v, p AS r FROM pp
), {', '.join(steps)}
SELECT v, CAST(round(r, 6) AS DOUBLE) AS rank FROM r{k_iters}{tail}"""


# --------------------------------------------------------------------- LPA

LPA_ITERS = 10


def lpa_fixed_sql(edge_sql: str, k_iters: int = LPA_ITERS,
                  output: str = "histogram") -> str:
    """Fixed-iteration synchronous LPA: each step every vertex adopts
    its most frequent neighbor label, ties to the minimum label — the
    exact vote of algos/lpa.py. If the engine reaches fixpoint before
    ``k_iters``, the extra SQL steps are no-ops, so early stopping
    and full unrolling agree. Output: community-size histogram, or the
    raw (v, label) assignment when ``output="labels"`` (feeds derived
    metrics like modularity)."""
    steps = []
    for i in range(1, k_iters + 1):
        steps.append(f"""l{i} AS MATERIALIZED (
    SELECT v, label FROM (
        SELECT f.v, f.label,
               row_number() OVER (PARTITION BY f.v
                                  ORDER BY f.cnt DESC, f.label ASC) AS rn
        FROM (SELECT s.v, p.label, count(*) AS cnt
              FROM sym s JOIN l{i-1} p ON p.v = s.nbr
              GROUP BY s.v, p.label) f
    ) WHERE rn = 1
)""")
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM edge
    UNION
    SELECT tid, sid FROM edge
), l0 AS MATERIALIZED (
    SELECT DISTINCT v, v AS label FROM sym
), {', '.join(steps)}
{("SELECT v, label FROM l" + str(k_iters)) if output == "labels"
 else ("SELECT label, count(*) AS size FROM l" + str(k_iters)
       + " GROUP BY label")}"""


# ------------------------------------------------------------------ k-core

# Per-stage peel-round budgets, calibrated with ~2x margin over the
# cascade depths measured on the sf0.001/sf0.01 sparse fixture graphs
# (k=2 cascades 22 rounds at sf0.01; every other stage <= 3). An
# insufficient budget cannot pass silently: the oracle histogram would
# disagree with the engine's fully-converged peel.
#
# All unroll budgets are env-overridable (ORACLE_* below) so a gate
# running at a DIFFERENT scale factor can calibrate them from measured
# depth at that sf (scripts/sf01_gate.py does this for sf0.1) without
# touching the sf0.01 driver-contract defaults.
import json as _json
import os as _os


def _env_int(name: str, default: int) -> int:
    return int(_os.environ.get(name, default))


KCORE_ROUNDS = (_json.loads(_os.environ["ORACLE_KCORE_ROUNDS"])
                if "ORACLE_KCORE_ROUNDS" in _os.environ
                else {1: 8, 2: 45, 3: 12})
KCORE_ROUNDS = {int(k): int(v) for k, v in KCORE_ROUNDS.items()}
KCORE_DEFAULT_ROUNDS = _env_int("ORACLE_KCORE_DEFAULT_ROUNDS", 4)
KCORE_K_MAX = _env_int("ORACLE_KCORE_K_MAX", 25)


def core_numbers_sql(edge_sql: str, k_max: int = KCORE_K_MAX) -> str:
    """Bounded-depth k-core peel: stage k repeatedly deletes vertices
    with degree < k from the stage-(k-1) survivors; core(v) = the last
    stage v survives. Output: per-core vertex-count histogram."""
    parts = []
    prev = "a0"
    stage_final = []
    for k in range(1, k_max + 1):
        for r in range(1, KCORE_ROUNDS.get(k, KCORE_DEFAULT_ROUNDS) + 1):
            name = f"p{k}_{r}"
            parts.append(f"""{name} AS MATERIALIZED (
    SELECT v FROM (
        SELECT s.v, count(*) AS c FROM sym s
        JOIN {prev} a ON a.v = s.v
        JOIN {prev} b ON b.v = s.nbr
        GROUP BY s.v
    ) WHERE c >= {k}
)""")
            prev = name
        stage_final.append((k, prev))
    tagged = "\nUNION ALL\n".join(
        f"SELECT v, {k} AS k FROM {nm}" for k, nm in stage_final)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM edge
    UNION
    SELECT tid, sid FROM edge
), a0 AS MATERIALIZED (
    SELECT DISTINCT v FROM sym
), {', '.join(parts)}
SELECT CAST(core AS INTEGER) AS core, count(*) AS n_vertices FROM (
    SELECT v, max(k) AS core FROM ({tagged}) GROUP BY v
) GROUP BY core"""


def onion_layers_sql(edge_sql: str, k_max: int = KCORE_K_MAX,
                     rounds: dict | None = None,
                     default_rounds: int = KCORE_DEFAULT_ROUNDS) -> str:
    """Bounded-depth onion decomposition twin of core_numbers_sql:
    every unrolled peel round's REMOVED set (prev EXCEPT cur) is one
    batch; the layer index is a dense_rank over the non-empty batches
    in (k, round) order — exactly the engine's counter, which only
    advances on non-empty simultaneous removals. Output: per-vertex
    (v, core, layer)."""
    parts = []
    removed = []
    prev = "a0"
    for k in range(1, k_max + 1):
        budget = (rounds if rounds is not None
                  else KCORE_ROUNDS).get(k, default_rounds)
        for r in range(1, budget + 1):
            name = f"p{k}_{r}"
            parts.append(f"""{name} AS MATERIALIZED (
    SELECT v FROM (
        SELECT s.v, count(*) AS c FROM sym s
        JOIN {prev} a ON a.v = s.v
        JOIN {prev} b ON b.v = s.nbr
        GROUP BY s.v
    ) WHERE c >= {k}
)""")
            removed.append(
                f"SELECT v, {k} AS k, {r} AS r FROM "
                f"(SELECT v FROM {prev} EXCEPT SELECT v FROM {name})")
            prev = name
    removed_union = "\nUNION ALL\n".join(removed)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM edge
    UNION
    SELECT tid, sid FROM edge
), a0 AS MATERIALIZED (
    SELECT DISTINCT v FROM sym
), {', '.join(parts)},
removed AS MATERIALIZED (
{removed_union}
), batches AS (
    SELECT k, r,
           CAST(dense_rank() OVER (ORDER BY k, r) AS INTEGER) AS layer
    FROM (SELECT DISTINCT k, r FROM removed)
)
SELECT m.v, CAST(m.k - 1 AS INTEGER) AS core, b.layer
FROM removed m JOIN batches b ON b.k = m.k AND b.r = m.r"""


# ------------------------------------------------------- text fingerprint

FINGERPRINT_GROUPS_SQL = """
WITH aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, replace(text, ' ', '  ')
    FROM documents WHERE doc_id < 10
)
SELECT min(doc_id) AS doc_id, count(*) AS n_docs
FROM aug
GROUP BY regexp_replace(trim(coalesce(text, '')), '\\s+', ' ', 'g')
""".strip()


# ------------------------------------------------------------ language ID

# MUST mirror functions.text._STOPWORDS exactly.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "这", "他"],
}


def lang_id_sql() -> str:
    """Exact SQL twin of functions.text.lang_id: per-language stopword
    occurrence counts (word-boundary regex, plain substring for zh),
    argmax with first-in-dict-order tie-break, 'unk' on all-zero."""
    score_exprs = []
    for lg, words in _STOPWORDS.items():
        terms = []
        for w in words:
            pat = w if lg == "zh" else r"\b" + w + r"\b"
            terms.append(f"len(regexp_extract_all(low, '{pat}'))")
        score_exprs.append(f"({' + '.join(terms)}) AS s_{lg}")
    langs = list(_STOPWORDS)
    case = ("CASE WHEN greatest("
            + ", ".join(f"s_{l}" for l in langs) + ") = 0 THEN 'unk'")
    for i, lg in enumerate(langs):
        rest = [f"s_{l}" for l in langs[i + 1:]]
        cond = f"s_{lg} >= greatest({', '.join(rest)})" if rest else "TRUE"
        case += f" WHEN {cond} THEN '{lg}'"
    case += " END"
    return f"""
WITH low AS (SELECT doc_id, lower(coalesce(text, '')) AS low FROM documents),
scores AS (SELECT doc_id, {', '.join(score_exprs)} FROM low)
SELECT doc_id, {case} AS lang_pred FROM scores"""


# ------------------------------------------------------- minhash near-dup

MINHASH_ASCII_JACCARD_SQL = """
WITH ascii AS (
    SELECT doc_id AS d, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
    FROM documents
    WHERE regexp_matches(coalesce(text, ''), '^[\\x00-\\x7F]*$')
), padded AS (
    SELECT d, CASE WHEN length(s) < 5 THEN rpad(s, 5, ' ') ELSE s END AS s
    FROM ascii
), sh AS (
    SELECT DISTINCT d, substr(s, i, 5) AS g
    FROM (SELECT d, s, unnest(range(1, length(s) - 3)) AS i FROM padded)
), sizes AS (
    SELECT d, count(*) AS n FROM sh GROUP BY d
), inter AS (
    SELECT x.d AS a, y.d AS b, count(*) AS i
    FROM sh x JOIN sh y ON x.g = y.g AND x.d < y.d
    GROUP BY 1, 2
)
SELECT i.a, i.b,
       CAST(round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS DOUBLE)
           AS jaccard
FROM inter i JOIN sizes sa ON sa.d = i.a JOIN sizes sb ON sb.d = i.b
WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.8
""".strip()


NEAR_DUP_CLUSTERS_SQL = """
WITH RECURSIVE ascii AS (
    SELECT doc_id AS d, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
    FROM documents
    WHERE regexp_matches(coalesce(text, ''), '^[\\x00-\\x7F]*$')
), padded AS (
    SELECT d, CASE WHEN length(s) < 5 THEN rpad(s, 5, ' ') ELSE s END AS s
    FROM ascii
), sh AS (
    SELECT DISTINCT d, substr(s, i, 5) AS g
    FROM (SELECT d, s, unnest(range(1, length(s) - 3)) AS i FROM padded)
), sizes AS (
    SELECT d, count(*) AS n FROM sh GROUP BY d
), inter AS (
    SELECT x.d AS a, y.d AS b, count(*) AS i
    FROM sh x JOIN sh y ON x.g = y.g AND x.d < y.d
    GROUP BY 1, 2
), pairs AS (
    SELECT i.a, i.b
    FROM inter i JOIN sizes sa ON sa.d = i.a JOIN sizes sb ON sb.d = i.b
    WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.8
), sym AS (
    SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), reach(v, r) AS (
    SELECT u, u FROM (SELECT DISTINCT u FROM sym)
    UNION
    SELECT s.v, w.r FROM reach w JOIN sym s ON s.u = w.v
), lab AS (
    SELECT v, min(r) AS comp FROM reach GROUP BY v
)
SELECT a.d AS doc_id, coalesce(l.comp, a.d) AS cluster,
       coalesce(l.comp, a.d) = a.d AS is_canonical
FROM ascii a LEFT JOIN lab l ON l.v = a.d
""".strip()


# ----------------------------------------------------------- simhash (md5)

SIMHASH_MD5_PAIRS_SQL = """
WITH toks AS (
    SELECT doc_id AS d, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
    FROM documents WHERE length(trim(coalesce(text, ''))) > 0
), th AS (
    SELECT d, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM toks
), votes AS (
    SELECT d, j.j,
           sum(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM th, (SELECT unnest(range(0, 64)) AS j) j
    GROUP BY d, j.j
), sh AS (
    SELECT d, CAST(sum(CASE WHEN v > 0 AND j < 63 THEN (1::UBIGINT << j)::HUGEINT
                            WHEN v > 0 AND j = 63 THEN -9223372036854775808::HUGEINT
                            ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY d
), allsh AS (
    SELECT doc_id AS d, coalesce(s.simhash, 0) AS simhash
    FROM documents LEFT JOIN sh s ON s.d = documents.doc_id
)
SELECT a.d AS a, b.d AS b, bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM allsh a JOIN allsh b ON a.d < b.d
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""".strip()


# --------------------------------------------------------- hyperplane LSH

LSH_DIM, LSH_BITS, LSH_SEED = 64, 12, 42


def _planes_literals() -> list[str]:
    # Same seeded generator as functions.similarity._hyperplanes;
    # repr() round-trips each float64 exactly through DuckDB's parser.
    rng = np.random.default_rng(LSH_SEED)
    planes = rng.standard_normal((LSH_BITS, LSH_DIM))
    return ["[" + ", ".join(repr(float(x)) for x in h) + "]" for h in planes]


def _sig_expr(vcol: str) -> str:
    return "(" + " + ".join(
        f"(CASE WHEN list_inner_product({vcol}, {lit}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(_planes_literals())) + ")"


def knn_lsh_sql(k: int = 5, bands: int = 4) -> str:
    """Exact replica of similarity.lsh_topk(bits=12, bands=4, seed=42):
    sign-bit signatures from the same hyperplanes (embedded as float
    literals), band-key candidate union, exact cosine re-rank."""
    per_band = LSH_BITS // bands
    mask = (1 << per_band) - 1
    band_joins = "\nUNION ALL\n".join(
        f"SELECT q.vec_id AS q_id, e.vec_id AS vec_id "
        f"FROM sigs q JOIN sigs e "
        f"ON ((q.sig >> {b * per_band}) & {mask}) = ((e.sig >> {b * per_band}) & {mask}) "
        f"WHERE q.vec_id < 3" for b in range(bands))
    return f"""
WITH ex AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sigs AS MATERIALIZED (
    SELECT vec_id, v, {_sig_expr('v')} AS sig,
           sqrt(list_inner_product(v, v)) AS nrm
    FROM ex),
cand AS (SELECT DISTINCT q_id, vec_id FROM ({band_joins})),
scored AS (
    SELECT c.q_id, c.vec_id,
           list_inner_product(q.v, e.v) / (q.nrm * e.nrm) AS cos_raw
    FROM cand c JOIN sigs q ON q.vec_id = c.q_id
    JOIN sigs e ON e.vec_id = c.vec_id)
SELECT q_id, vec_id, CAST(round(cos_raw, 6) AS DOUBLE) AS cos,
       CAST(rnk AS INTEGER) AS rank
FROM (SELECT q_id, vec_id, cos_raw,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos_raw DESC, vec_id) AS rnk
      FROM scored)
WHERE rnk <= {k}"""


def embedding_near_dup_sql(threshold: float = 0.95, bands: int = 4) -> str:
    """Exact replica of the s_embedding_near_dup contract query,
    including the planted +100000-id near-duplicates (x * 1.0001 cast
    through FLOAT, reproduced with the same IEEE ops)."""
    per_band = LSH_BITS // bands
    mask = (1 << per_band) - 1
    band_joins = "\nUNION ALL\n".join(
        f"SELECT a.vec_id AS a, b.vec_id AS b "
        f"FROM sigs a JOIN sigs b "
        f"ON ((a.sig >> {b_ * per_band}) & {mask}) = ((b.sig >> {b_ * per_band}) & {mask}) "
        f"WHERE a.vec_id < b.vec_id" for b_ in range(bands))
    return f"""
WITH aug AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    UNION ALL
    SELECT vec_id + 100000,
           list_transform(embedding,
                          x -> CAST(CAST(x AS DOUBLE) * 1.0001 AS FLOAT))::DOUBLE[]
    FROM embeddings WHERE vec_id < 5),
sigs AS MATERIALIZED (
    SELECT vec_id, v, {_sig_expr('v')} AS sig,
           sqrt(list_inner_product(v, v)) AS nrm FROM aug),
cand AS (SELECT DISTINCT a, b FROM ({band_joins})),
scored AS (
    SELECT c.a, c.b, list_inner_product(x.v, y.v) / (x.nrm * y.nrm) AS cos_raw
    FROM cand c JOIN sigs x ON x.vec_id = c.a JOIN sigs y ON y.vec_id = c.b)
SELECT a, b, CAST(round(cos_raw, 4) AS DOUBLE) AS cos
FROM scored WHERE cos_raw >= {threshold}"""


# ------------------------------------------------------- media closed form

MEDIA_FEATURES_SQL = """
WITH m AS (
    SELECT o_orderkey AS media_id,
           CAST(o_orderkey % 23 + 8 AS BIGINT) AS w,
           CAST(o_orderkey % 17 + 8 AS BIGINT) AS h
    FROM orders WHERE o_orderkey % 100 < 2
), px AS (
    SELECT media_id, w, h, (media_id * 31 + i * 7) % 256 AS p
    FROM (SELECT media_id, w, h, unnest(range(0, w * h)) AS i FROM m)
), st AS (
    SELECT media_id, any_value(w) AS w, any_value(h) AS h,
           avg(p) AS mean_raw, stddev_pop(p) AS std_raw
    FROM px GROUP BY media_id
)
SELECT media_id,
       CAST(round(mean_raw, 4) AS DOUBLE) AS mean_px,
       CAST(round(std_raw, 4) AS DOUBLE) AS std_px,
       CAST((w + greatest(1, w // 8) - 1) // greatest(1, w // 8) AS INTEGER)
           AS thumb_w,
       CAST((h + greatest(1, h // 8) - 1) // greatest(1, h // 8) AS INTEGER)
           AS thumb_h
FROM st
""".strip()

JPEG_FEATURES_SQL = """
WITH m AS (
    SELECT o_orderkey AS media_id,
           CAST(((o_orderkey % 3) + 1) * 8 AS BIGINT) AS w,
           CAST(((o_orderkey % 2) + 1) * 8 AS BIGINT) AS h
    FROM orders WHERE o_orderkey % 100 < 2
), blk AS (
    -- one row per 8x8 block; raw constant value per the fixture law
    SELECT media_id, w, h, (media_id * 37 + j * 59) % 256 AS v
    FROM (SELECT media_id, w, h,
                 unnest(range(0, (w // 8) * (h // 8))) AS j FROM m)
), dec AS (
    -- the baseline-JPEG constant-block decode law at quality 50
    -- (q00 = 16): clip(floor((v-128)/2 + 0.5)*2 + 128, 0, 255);
    -- every pixel of the block decodes to this value, so per-pixel
    -- stats equal equal-weight per-block stats
    SELECT media_id, w, h,
           least(greatest(CAST(floor((v - 128) / 2.0 + 0.5) * 2 + 128
                               AS BIGINT), 0), 255) AS d
    FROM blk
), st AS (
    SELECT media_id, any_value(w) AS w, any_value(h) AS h,
           avg(d) AS mean_raw, stddev_pop(d) AS std_raw
    FROM dec GROUP BY media_id
)
SELECT media_id,
       CAST(round(mean_raw, 4) AS DOUBLE) AS mean_px,
       CAST(round(std_raw, 4) AS DOUBLE) AS std_px,
       CAST((w + greatest(1, w // 8) - 1) // greatest(1, w // 8) AS INTEGER)
           AS thumb_w,
       CAST((h + greatest(1, h // 8) - 1) // greatest(1, h // 8) AS INTEGER)
           AS thumb_h
FROM st
""".strip()


def audio_silence_sql(frame: int = 16, threshold: int = 64) -> str:
    """Replica of multimodal.audio_frame_energy + silence_report over
    the synthetic WAV law (same m/s CTEs as AUDIO_FEATURES_SQL):
    per-frame integer sum-of-squares, silent iff ss <= ns*threshold²,
    runs via gaps-and-islands. All-integer — no rounding discipline."""
    t2 = threshold * threshold
    return f"""
WITH m AS (
    SELECT o_orderkey AS media_id,
           CAST(o_orderkey % 512 + 256 AS BIGINT) AS n
    FROM orders WHERE o_orderkey % 100 < 2
), s AS (
    SELECT media_id, i, (media_id * 13 + i * 11) % 256 - 128 AS v
    FROM (SELECT media_id, n, unnest(range(0, n)) AS i FROM m)
), fr AS (
    SELECT media_id, i // {frame} AS frame_idx,
           count(*) AS ns, sum(v * v) AS ss
    FROM s GROUP BY 1, 2
), sil AS (
    SELECT media_id, frame_idx FROM fr WHERE ss <= ns * {t2}
), isl AS (
    SELECT media_id, frame_idx,
           frame_idx - row_number() OVER (PARTITION BY media_id
                                          ORDER BY frame_idx) AS g
    FROM sil
), runs AS (
    SELECT media_id, g, count(*) AS len,
           min(frame_idx) AS f0, max(frame_idx) AS f1
    FROM isl GROUP BY 1, 2
), tot AS (
    SELECT media_id, count(*) AS n_frames,
           sum(CASE WHEN ss <= ns * {t2} THEN 1 ELSE 0 END) AS n_silent
    FROM fr GROUP BY 1
), agg AS (
    SELECT r.media_id, count(*) AS n_runs, max(r.len) AS longest_run,
           max(CASE WHEN r.f0 = 0 THEN r.len ELSE 0 END) AS lead_silence,
           max(CASE WHEN r.f1 = t.n_frames - 1 THEN r.len ELSE 0 END)
               AS trail_silence
    FROM runs r JOIN tot t USING (media_id) GROUP BY 1
)
SELECT t.media_id,
       CAST(t.n_frames AS BIGINT) AS n_frames,
       CAST(t.n_silent AS BIGINT) AS n_silent,
       CAST(coalesce(a.n_runs, 0) AS BIGINT) AS n_runs,
       CAST(coalesce(a.longest_run, 0) AS BIGINT) AS longest_run,
       CAST(coalesce(a.lead_silence, 0) AS BIGINT) AS lead_silence,
       CAST(coalesce(a.trail_silence, 0) AS BIGINT) AS trail_silence
FROM tot t LEFT JOIN agg a USING (media_id)
""".strip()


AUDIO_FEATURES_SQL = """
WITH m AS (
    SELECT o_orderkey AS media_id,
           CAST(o_orderkey % 512 + 256 AS BIGINT) AS n,
           CASE o_orderkey % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 44100 END AS sr
    FROM orders WHERE o_orderkey % 100 < 2
), s AS (
    SELECT media_id, n, sr, i, (media_id * 13 + i * 11) % 256 - 128 AS v
    FROM (SELECT media_id, n, sr, unnest(range(0, n)) AS i FROM m)
), lagged AS (
    SELECT media_id, v,
           lag(v) OVER (PARTITION BY media_id ORDER BY i) AS pv
    FROM s
), zc AS (
    SELECT media_id,
           sum(CASE WHEN pv IS NOT NULL AND (v < 0) != (pv < 0)
                    THEN 1 ELSE 0 END) AS z
    FROM lagged GROUP BY media_id
), st AS (
    SELECT media_id, any_value(n) AS n, any_value(sr) AS sr,
           sqrt(avg(CAST(v AS DOUBLE) * v)) AS rms_raw,
           max(abs(v)) AS peak
    FROM s GROUP BY media_id
)
SELECT st.media_id,
       CAST(round(CAST(st.n AS DOUBLE) / st.sr, 7) AS DOUBLE) AS duration_s,
       CAST(round(st.rms_raw, 4) AS DOUBLE) AS rms,
       CAST(zc.z AS BIGINT) AS zero_crossings,
       CAST(st.peak AS INTEGER) AS peak
FROM st JOIN zc ON zc.media_id = st.media_id
""".strip()


# ------------------------------------------------------- shortest paths

# Round budgets for the unrolled Bellman-Ford oracles, calibrated
# with margin over the measured fixture needs: the sf0.01 sparse
# undirected graph has eccentricity 34 from the min-sid source (14,527
# reached — measured by widening the unroll until the reach set and
# max dist stop growing), and the weighted dense SSSP settles by round
# 10 (d10 == d16 exactly). An under-budget cannot pass silently: the
# oracle's not-yet-settled distances would disagree with the engine's
# fixpoint — exactly how the original 12-round BFS budget was caught.
BFS_ROUNDS = 48
SSSP_ROUNDS = 16

# DuckDB twin of algos.paths.CONTRACT_WEIGHT_SQL (exact integer
# arithmetic on both sides; operands are nonnegative, so % == pmod).
_W_EXPR = "1 + (src * 7 + dst * 13) % 10"


def shortest_path_sql(edge_sql: str, rounds: int, weighted: bool = False,
                      directed: bool = True,
                      sources_sql: str | None = None) -> str:
    """Unrolled frontier-free Bellman-Ford from the min-sid source,
    or from the seed SET given by ``sources_sql`` (a query yielding a
    single vertex-id column) — the multi-source variant's d0 seeds
    every listed vertex at distance 0.

    Each step is one MATERIALIZED CTE computing
      d_i(v) = min(d_{i-1}(v), min over (u,v) in rel of d_{i-1}(u)+w)
    — the same recurrence algos/paths.py iterates with frontier
    pruning (pruning never changes the fixpoint, only the work).
    Output: (v, dist) for every REACHED vertex, dist as BIGINT.
    """
    sym = "" if directed else "\n        UNION SELECT tid, sid FROM edge"
    w = _W_EXPR if weighted else "1"
    if sources_sql is None:
        d0_body = ("SELECT CAST((SELECT min(sid) FROM edge) AS BIGINT) AS v,\n"
                   "           CAST(0 AS BIGINT) AS dist")
    else:
        d0_body = (f"SELECT CAST(v AS BIGINT) AS v, CAST(0 AS BIGINT) AS dist\n"
                   f"    FROM ({sources_sql}) s(v)")
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""d{i} AS MATERIALIZED (
    SELECT v, min(dist) AS dist FROM (
        SELECT v, dist FROM d{i-1}
        UNION ALL
        SELECT r.dst AS v, p.dist + r.w AS dist
        FROM d{i-1} p JOIN rel r ON r.src = p.v
    ) GROUP BY v
)""")
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), rel AS MATERIALIZED (
    SELECT src, dst, CAST({w} AS BIGINT) AS w FROM (
        SELECT sid AS src, tid AS dst FROM edge{sym}
    ) WHERE src <> dst
), d0 AS MATERIALIZED (
    {d0_body}
), {', '.join(steps)}
SELECT v, dist FROM d{rounds}"""


WIDEST_ROUNDS = 24


def widest_path_sql(edge_sql: str, rounds: int = WIDEST_ROUNDS,
                    directed: bool = True) -> str:
    """Unrolled (max, min)-semiring relaxation from the min-sid
    source — the oracle twin of paths.widest_paths. Each step:
      w_i(v) = max(w_{i-1}(v), max over (u,v) of least(w_{i-1}(u), w))
    Source seeded at the same 1<<60 sentinel the engine uses; the
    final SELECT excludes the source row, exactly like the engine.
    """
    sym = "" if directed else "\n        UNION SELECT tid, sid FROM edge"
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""d{i} AS MATERIALIZED (
    SELECT v, max(width) AS width FROM (
        SELECT v, width FROM d{i-1}
        UNION ALL
        SELECT r.dst AS v, least(p.width, r.w) AS width
        FROM d{i-1} p JOIN rel r ON r.src = p.v
    ) GROUP BY v
)""")
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), rel AS MATERIALIZED (
    SELECT src, dst, CAST({_W_EXPR} AS BIGINT) AS w FROM (
        SELECT sid AS src, tid AS dst FROM edge{sym}
    ) WHERE src <> dst
), d0 AS MATERIALIZED (
    SELECT CAST((SELECT min(sid) FROM edge) AS BIGINT) AS v,
           CAST({1 << 60} AS BIGINT) AS width
), {', '.join(steps)}
SELECT v, width FROM d{rounds}
WHERE v <> (SELECT min(sid) FROM edge)"""


def shortest_path_tree_sql(edge_sql: str, rounds: int, weighted: bool = False,
                           directed: bool = True) -> str:
    """shortest_path_sql + parent derivation: parent(v) = min u with
    dist(u) + w(u,v) = dist(v); seeds get NULL (w >= 1 means nothing
    relaxes onto dist 0). Mirrors paths.shortest_path_tree exactly."""
    base = shortest_path_sql(edge_sql, rounds, weighted=weighted,
                             directed=directed)
    head, _ = base.rsplit("\nSELECT v, dist FROM", 1)
    return f"""{head}
SELECT d.v, d.dist, p.parent
FROM d{rounds} d LEFT JOIN (
    SELECT r.dst AS v, min(r.src) AS parent
    FROM rel r
    JOIN d{rounds} du ON du.v = r.src
    JOIN d{rounds} dv ON dv.v = r.dst
    WHERE du.dist + r.w = dv.dist
    GROUP BY r.dst
) p ON p.v = d.v"""


# ------------------------------------------------------------- k-truss

# Per-stage peel-round budgets for the unrolled truss oracle,
# calibrated with ~2x margin over the measured sf0.01 cascades
# (k=3: 1 round, k=4: 3 rounds, k=5 empties immediately; max truss 4).
# Same silent-failure argument as KCORE_ROUNDS: an under-budget would
# leave the oracle's peel unfinished and disagree with the engine.
TRUSS_ROUNDS = {3: 3, 4: 6}
TRUSS_DEFAULT_ROUNDS = 3
TRUSS_K_MAX = 6


def truss_numbers_sql(edge_sql: str, k_max: int = TRUSS_K_MAX) -> str:
    """Bounded-depth k-truss peel: stage k repeatedly drops edges in
    fewer than k-2 surviving triangles; t(e) = the last stage e
    survives (>= 2 for every edge). Output: per-edge truss numbers."""
    parts = []
    prev = "lt"
    stage_final = []
    for k in range(3, k_max + 1):
        for r in range(1, TRUSS_ROUNDS.get(k, TRUSS_DEFAULT_ROUNDS) + 1):
            tname, pname = f"t{k}_{r}", f"p{k}_{r}"
            parts.append(f"""{tname} AS MATERIALIZED (
    SELECT e1.sid AS a, e1.tid AS b, e2.tid AS c
    FROM {prev} e1
    JOIN {prev} e2 ON e2.sid = e1.sid AND e1.tid < e2.tid
    JOIN {prev} e3 ON e3.sid = e1.tid AND e3.tid = e2.tid
), {pname} AS MATERIALIZED (
    SELECT sid, tid FROM (
        SELECT sid, tid, count(*) AS c FROM (
            SELECT a AS sid, b AS tid FROM {tname}
            UNION ALL SELECT a, c FROM {tname}
            UNION ALL SELECT b, c FROM {tname}
        ) GROUP BY sid, tid
    ) WHERE c >= {k - 2}
)""")
            prev = pname
        stage_final.append((k, prev))
    tagged = "\n    UNION ALL\n    ".join(
        f"SELECT sid, tid, {k} AS k FROM {nm}" for k, nm in stage_final)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), lt AS MATERIALIZED (
    SELECT DISTINCT sid, tid FROM edge WHERE sid < tid
), {', '.join(parts)}
SELECT sid, tid, CAST(max(k) AS INTEGER) AS truss FROM (
    SELECT sid, tid, 2 AS k FROM lt
    UNION ALL
    {tagged}
) GROUP BY sid, tid"""


# ---------------------------------------------------------------- HITS

HITS_ITERS = 12


def hits_fixed_sql(edge_sql: str, k_iters: int = HITS_ITERS) -> str:
    """Fixed-iteration HITS with L1 normalization — the exact twin of
    algos/hits.py: auth ← Σ hub over in-edges then /Σ, hub ← Σ auth
    over out-edges then /Σ. Output (v, auth, hub) rounded to 6 dp."""
    steps = []
    for i in range(1, k_iters + 1):
        prev = f"s{i-1}"
        steps.append(f"""ar{i} AS MATERIALIZED (
    SELECT verts.v, coalesce(x.raw, 0.0) AS raw FROM verts
    LEFT JOIN (
        SELECT e.tid AS v, sum(p.hub) AS raw
        FROM edge e JOIN {prev} p ON p.v = e.sid GROUP BY e.tid
    ) x ON x.v = verts.v
), a{i} AS MATERIALIZED (
    SELECT v, raw / greatest((SELECT sum(raw) FROM ar{i}), 1e-300) AS auth
    FROM ar{i}
), hr{i} AS MATERIALIZED (
    SELECT verts.v, coalesce(x.raw, 0.0) AS raw FROM verts
    LEFT JOIN (
        SELECT e.sid AS v, sum(a.auth) AS raw
        FROM edge e JOIN a{i} a ON a.v = e.tid GROUP BY e.sid
    ) x ON x.v = verts.v
), s{i} AS MATERIALIZED (
    SELECT a{i}.v, a{i}.auth,
           hr{i}.raw / greatest((SELECT sum(raw) FROM hr{i}), 1e-300) AS hub
    FROM a{i} JOIN hr{i} ON hr{i}.v = a{i}.v
)""")
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), verts AS MATERIALIZED (
    SELECT sid AS v FROM edge UNION SELECT tid FROM edge
), s0 AS MATERIALIZED (
    SELECT v, 1.0 / (SELECT count(*) FROM verts) AS auth,
           1.0 / (SELECT count(*) FROM verts) AS hub
    FROM verts
), {', '.join(steps)}
SELECT v, CAST(round(auth, 6) AS DOUBLE) AS auth,
       CAST(round(hub, 6) AS DOUBLE) AS hub
FROM s{k_iters}"""


# --------------------------------------------------------------- SALSA

SALSA_ITERS = 12


def salsa_fixed_sql(edge_sql: str, k_iters: int = SALSA_ITERS) -> str:
    """Fixed-iteration SALSA with L1 normalization — the exact twin of
    algos/salsa.py: auth ← Σ hub(u)/outdeg(u) over in-edges then /Σ,
    hub ← Σ auth(v)/indeg(v) over out-edges then /Σ. Output
    (v, auth, hub) rounded to 6 dp."""
    steps = []
    for i in range(1, k_iters + 1):
        prev = f"s{i-1}"
        steps.append(f"""ar{i} AS MATERIALIZED (
    SELECT verts.v, coalesce(x.raw, 0.0) AS raw FROM verts
    LEFT JOIN (
        SELECT e.tid AS v, sum(p.hub / od.d) AS raw
        FROM edge e
        JOIN {prev} p ON p.v = e.sid
        JOIN outdeg od ON od.v = e.sid
        GROUP BY e.tid
    ) x ON x.v = verts.v
), a{i} AS MATERIALIZED (
    SELECT v, raw / greatest((SELECT sum(raw) FROM ar{i}), 1e-300) AS auth
    FROM ar{i}
), hr{i} AS MATERIALIZED (
    SELECT verts.v, coalesce(x.raw, 0.0) AS raw FROM verts
    LEFT JOIN (
        SELECT e.sid AS v, sum(a.auth / idg.d) AS raw
        FROM edge e
        JOIN a{i} a ON a.v = e.tid
        JOIN indeg idg ON idg.v = e.tid
        GROUP BY e.sid
    ) x ON x.v = verts.v
), s{i} AS MATERIALIZED (
    SELECT a{i}.v, a{i}.auth,
           hr{i}.raw / greatest((SELECT sum(raw) FROM hr{i}), 1e-300) AS hub
    FROM a{i} JOIN hr{i} ON hr{i}.v = a{i}.v
)""")
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), verts AS MATERIALIZED (
    SELECT sid AS v FROM edge UNION SELECT tid FROM edge
), outdeg AS MATERIALIZED (
    SELECT sid AS v, count(*) AS d FROM edge GROUP BY 1
), indeg AS MATERIALIZED (
    SELECT tid AS v, count(*) AS d FROM edge GROUP BY 1
), s0 AS MATERIALIZED (
    SELECT v, 1.0 / (SELECT count(*) FROM verts) AS auth,
           1.0 / (SELECT count(*) FROM verts) AS hub
    FROM verts
), {', '.join(steps)}
SELECT v, CAST(round(auth, 6) AS DOUBLE) AS auth,
       CAST(round(hub, 6) AS DOUBLE) AS hub
FROM s{k_iters}"""


# ------------------------------------------------- betweenness (Brandes)

# Forward-level budget for the unrolled Brandes oracle: the dense
# directed contract graph has eccentricity <= 5 from the low-id
# pivots at both test SFs; 8 leaves margin (extra levels are empty
# CTEs, so over-budget is free).
BRANDES_LEVELS = 8
BRANDES_PIVOTS = 4


def betweenness_sql(edge_sql: str, n_pivots: int = BRANDES_PIVOTS,
                    levels: int = BRANDES_LEVELS) -> str:
    """Unrolled Brandes from the ``n_pivots`` lowest distinct source
    vertices: per pivot, BFS levels with BIGINT path counts forward,
    dependency accumulation backward; bc(v) = Σ pivots' δ (pivot
    itself excluded). Output (v, bc) rounded to 6 dp."""
    parts = []
    arms = []
    for p in range(n_pivots):
        piv = (f"(SELECT DISTINCT sid FROM edge ORDER BY sid "
               f"LIMIT 1 OFFSET {p})")
        parts.append(f"""f{p}_0 AS MATERIALIZED (
    SELECT CAST({piv} AS BIGINT) AS v, CAST(1 AS BIGINT) AS sigma
), vis{p}_0 AS MATERIALIZED (SELECT v FROM f{p}_0)""")
        for i in range(1, levels + 1):
            parts.append(f"""f{p}_{i} AS MATERIALIZED (
    SELECT e.tid AS v, sum(f.sigma) AS sigma
    FROM f{p}_{i-1} f JOIN edge e ON e.sid = f.v
    WHERE e.tid NOT IN (SELECT v FROM vis{p}_{i-1})
    GROUP BY e.tid
), vis{p}_{i} AS MATERIALIZED (
    SELECT v FROM vis{p}_{i-1} UNION ALL SELECT v FROM f{p}_{i}
)""")
        parts.append(f"""d{p}_{levels} AS MATERIALIZED (
    SELECT v, 0.0 AS delta FROM f{p}_{levels}
)""")
        for i in range(levels - 1, -1, -1):
            parts.append(f"""d{p}_{i} AS MATERIALIZED (
    SELECT f.v, f.sigma * coalesce(c.terms, 0.0) AS delta
    FROM f{p}_{i} f LEFT JOIN (
        SELECT e.sid AS v, sum((1.0 + dn.delta) / fn.sigma) AS terms
        FROM edge e
        JOIN f{p}_{i+1} fn ON fn.v = e.tid
        JOIN d{p}_{i+1} dn ON dn.v = e.tid
        GROUP BY e.sid
    ) c ON c.v = f.v
)""")
        arms += [f"SELECT v, delta FROM d{p}_{i} WHERE v <> {piv}"
                 for i in range(0, levels + 1)]
    union = "\n        UNION ALL\n        ".join(arms)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), verts AS MATERIALIZED (
    SELECT sid AS v FROM edge UNION SELECT tid FROM edge
), {', '.join(parts)}
SELECT verts.v AS v,
       CAST(round(coalesce(sum(t.delta), 0.0), 6) AS DOUBLE) AS bc
FROM verts LEFT JOIN (
        {union}
) t ON t.v = verts.v
GROUP BY verts.v"""


def pivot_distance_sql(edge_sql: str, rounds: int, n_pivots: int = 4,
                       directed: bool = True) -> str:
    """Unrolled per-pivot BFS over the composite key (pivot_id, v): hop
    distances from the ``n_pivots`` lowest vertex ids — the SQL twin
    of algos/paths.py:pivot_distances. Each step is one MATERIALIZED
    CTE of the recurrence
      d_i(p, v) = min(d_{i-1}(p, v), min over (u,v) of d_{i-1}(p, u)+1)
    so a ``rounds`` budget ABOVE the fixture's max eccentricity makes
    the last CTE the fixpoint (same budget-domination argument as
    shortest_path_sql). Output: (pivot_id, v, dist) for reached pairs.
    """
    sym = "" if directed else "\n        UNION SELECT tid, sid FROM edge"
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""d{i} AS MATERIALIZED (
    SELECT pivot_id, v, min(dist) AS dist FROM (
        SELECT pivot_id, v, dist FROM d{i-1}
        UNION ALL
        SELECT p.pivot_id, r.dst AS v, p.dist + 1 AS dist
        FROM d{i-1} p JOIN rel r ON r.src = p.v
    ) GROUP BY pivot_id, v
)""")
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), rel AS MATERIALIZED (
    SELECT src, dst FROM (
        SELECT sid AS src, tid AS dst FROM edge{sym}
    ) WHERE src <> dst
), pv AS MATERIALIZED (
    SELECT v FROM (SELECT sid AS v FROM edge UNION SELECT tid FROM edge)
    ORDER BY v LIMIT {n_pivots}
), d0 AS MATERIALIZED (
    SELECT CAST(v AS BIGINT) AS pivot_id, CAST(v AS BIGINT) AS v,
           CAST(0 AS BIGINT) AS dist
    FROM pv
), {', '.join(steps)}
SELECT pivot_id, v, dist FROM d{rounds}"""


# --------------------------------------------------------------------- Katz

KATZ_ITERS = 8
KATZ_ALPHA = 0.01


def katz_fixed_sql(edge_sql: str, k_iters: int = KATZ_ITERS,
                   alpha: float = KATZ_ALPHA, beta: float = 1.0) -> str:
    """Fixed-iteration Katz centrality, the exact twin of
    algos/katz.py: x0 = beta; x_{t+1}(v) = beta + alpha * sum of
    x_t(u) over in-edges (u -> v); output rounded to 6 dp."""
    steps = []
    for i in range(1, k_iters + 1):
        steps.append(f"""x{i} AS MATERIALIZED (
    SELECT verts.v, {beta} + {alpha} * coalesce(c.s, 0.0) AS x
    FROM verts
    LEFT JOIN (
        SELECT e.tid AS v, sum(p.x) AS s
        FROM edge e JOIN x{i-1} p ON p.v = e.sid
        GROUP BY e.tid
    ) c ON c.v = verts.v
)""")
    return f"""WITH edge AS MATERIALIZED (
    SELECT DISTINCT sid, tid FROM (
{edge_sql}
    ) WHERE sid <> tid
), verts AS MATERIALIZED (
    SELECT sid AS v FROM edge UNION SELECT tid FROM edge
), x0 AS MATERIALIZED (
    SELECT v, CAST({beta} AS DOUBLE) AS x FROM verts
), {', '.join(steps)}
SELECT v, CAST(round(x, 6) AS DOUBLE) AS katz FROM x{k_iters}"""


# --------------------------------------------------------------- Luby MIS

MIS_ROUNDS = 16  # sf0.01 contract graph converges in 7; ~2x margin


def mis_fixed_sql(edge_sql: str, rounds: int = MIS_ROUNDS) -> str:
    """Unrolled deterministic Luby MIS, the exact twin of
    algos/mis.py: priority p(v) = (v mod 1e9+7) * 2654435761 mod
    1e9+7; round i moves every undecided vertex whose (p, v) pair is
    a strict local minimum among undecided neighbors into the MIS and
    deletes its neighbors. Rounds past convergence are no-ops (the
    undecided set is empty), so a generous ``rounds`` budget and the
    engine's early-stopping loop agree exactly."""
    p = "1000000007"
    parts = []
    prev = "u0"
    mis_names = []
    for i in range(1, rounds + 1):
        m, u = f"m{i}", f"u{i}"
        parts.append(f"""{m} AS MATERIALIZED (
    SELECT u.v FROM {prev} u WHERE NOT EXISTS (
        SELECT 1 FROM sym s JOIN {prev} w ON w.v = s.nbr
        WHERE s.v = u.v
          AND (w.p < u.p OR (w.p = u.p AND w.v < u.v)))
)""")
        parts.append(f"""{u} AS MATERIALIZED (
    SELECT u.v, u.p FROM {prev} u
    WHERE u.v NOT IN (SELECT v FROM {m})
      AND NOT EXISTS (SELECT 1 FROM sym s JOIN {m} m ON m.v = s.nbr
                      WHERE s.v = u.v)
)""")
        mis_names.append(m)
        prev = u
    union = "\nUNION ALL\n".join(f"SELECT v FROM {m}" for m in mis_names)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM edge
    UNION
    SELECT tid, sid FROM edge
), u0 AS MATERIALIZED (
    SELECT DISTINCT v, (v % {p}) * 2654435761 % {p} AS p FROM sym
), {', '.join(parts)}
SELECT v FROM (
{union}
)"""


# ----------------------------------------------------- maximal matching

MATCHING_ROUNDS = 20  # sf0.01 contract graph converges in 9; ~2x margin


def matching_fixed_sql(edge_sql: str, rounds: int = MATCHING_ROUNDS) -> str:
    """Unrolled deterministic greedy maximal matching, the exact twin
    of algos/matching.py: an active edge wins a round when its
    (p, a, b) priority is the minimum of the incident-edge priorities
    at BOTH endpoints (row_number = 1 twice under the per-vertex
    explode); winners' endpoints knock out their incident edges.
    Rounds past convergence are no-ops."""
    p = "1000000007"
    pri = (f"(((a % {p}) * 2000003 + (b % {p})) % {p}) "
           f"* 2654435761 % {p}")
    parts = []
    prev = "a0"
    win_names = []
    for i in range(1, rounds + 1):
        w, mv, a = f"w{i}", f"mv{i}", f"a{i}"
        parts.append(f"""{w} AS MATERIALIZED (
    SELECT a, b FROM (
        SELECT v, a, b,
               row_number() OVER (PARTITION BY v ORDER BY p, a, b) AS rn
        FROM (SELECT a AS v, a, b, p FROM {prev}
              UNION ALL
              SELECT b, a, b, p FROM {prev})
    ) WHERE rn = 1 GROUP BY a, b HAVING count(*) = 2
)""")
        parts.append(f"""{mv} AS MATERIALIZED (
    SELECT a AS v FROM {w} UNION SELECT b FROM {w}
)""")
        parts.append(f"""{a} AS MATERIALIZED (
    SELECT e.a, e.b, e.p FROM {prev} e
    WHERE e.a NOT IN (SELECT v FROM {mv})
      AND e.b NOT IN (SELECT v FROM {mv})
)""")
        win_names.append(w)
        prev = a
    union = "\nUNION ALL\n".join(f"SELECT a, b FROM {w}" for w in win_names)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), und AS MATERIALIZED (
    SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
    FROM edge WHERE sid <> tid
), a0 AS MATERIALIZED (
    SELECT a, b, {pri} AS p FROM und
), {', '.join(parts)}
SELECT a AS sid, b AS tid FROM (
{union}
)"""


# ------------------------------------------------ Borůvka spanning forest

# sf0.01 contract graph: 5 rounds, max pointer-chain depth 6 (measured
# by exact-schedule simulation) -> 2x margins; 2^6 = 64 covers depth.
BORUVKA_ROUNDS = 10
BORUVKA_JUMPS = 6


def boruvka_sql(edge_sql: str, rounds: int = BORUVKA_ROUNDS,
                jumps: int = BORUVKA_JUMPS) -> str:
    """Unrolled Borůvka minimum spanning forest, the exact twin of
    algos/mst.boruvka_forest: per round every component takes the
    argmin (w, a, b, other) cross edge, parent pointers break
    mutual-min 2-cycles to the smaller id, and contraction is
    ``jumps`` unrolled pointer-doubling self-joins (depth <= 2^jumps;
    extra jumps are identity once converged). Edge weights are the
    matching-style hash — distinct on the contract fixture, so the
    forest is THE unique MSF and any correct algorithm agrees.
    Rounds past convergence are no-ops (no cross edges -> identity
    relabel)."""
    p = "1000000007"
    w_expr = (f"CAST((((a % {p}) * 2000003 + (b % {p})) % {p}) "
              f"* 2654435761 % {p} AS BIGINT)")
    parts = []
    best_names = []
    for i in range(1, rounds + 1):
        prev = f"c{i - 1}"
        x, bst, q = f"x{i}", f"b{i}", f"q{i}"
        parts.append(f"""{x} AS MATERIALIZED (
    SELECT la.c AS ca, lb.c AS cb, e.w, e.a, e.b
    FROM ew e JOIN {prev} la ON la.v = e.a JOIN {prev} lb ON lb.v = e.b
    WHERE la.c <> lb.c
)""")
        parts.append(f"""{bst} AS MATERIALIZED (
    SELECT c, w, a, b, other FROM (
        SELECT c, w, a, b, other,
               row_number() OVER (PARTITION BY c
                                  ORDER BY w, a, b, other) AS rn
        FROM (SELECT ca AS c, w, a, b, cb AS other FROM {x}
              UNION ALL
              SELECT cb, w, a, b, ca FROM {x})
    ) WHERE rn = 1
)""")
        parts.append(f"""{q} AS MATERIALIZED (
    SELECT cm.c, coalesce(bb.other, cm.c) AS par
    FROM (SELECT DISTINCT c FROM {prev}) cm
    LEFT JOIN {bst} bb ON bb.c = cm.c
)""")
        parts.append(f"""p{i}_0 AS MATERIALIZED (
    SELECT x.c, CASE WHEN y.par = x.c THEN least(x.c, x.par)
                     ELSE x.par END AS par
    FROM {q} x JOIN {q} y ON x.par = y.c
)""")
        for j in range(1, jumps + 1):
            parts.append(f"""p{i}_{j} AS MATERIALIZED (
    SELECT x.c, y.par FROM p{i}_{j - 1} x
    JOIN p{i}_{j - 1} y ON x.par = y.c
)""")
        parts.append(f"""c{i} AS MATERIALIZED (
    SELECT cv.v, pj.par AS c FROM {prev} cv
    JOIN p{i}_{jumps} pj ON pj.c = cv.c
)""")
        best_names.append(bst)
    union = "\nUNION ALL\n".join(
        f"SELECT a, b, w FROM {bst}" for bst in best_names)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), ew AS MATERIALIZED (
    SELECT a, b, {w_expr} AS w FROM (
        SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
        FROM edge WHERE sid <> tid)
), c0 AS MATERIALIZED (
    SELECT v, v AS c FROM (SELECT a AS v FROM ew UNION SELECT b FROM ew)
), {', '.join(parts)}
SELECT DISTINCT a, b, w FROM (
{union}
)"""


# ------------------------------------- ANF (Flajolet-Martin sketches)


def anf_sql(edge_sql: str, rounds: int | None = None,
            k: int | None = None) -> str:
    """Unrolled ANF, the exact twin of algos/anf.anf_neighborhood:
    the SAME engine-portable init/estimate SQL strings (imported from
    the module, so the two sides cannot drift), one bit_or
    join-aggregate CTE per round over the symmetrized+self-loop
    neighbor table, FM estimate per round, pct against the final
    round. Deterministic: both engines compute identical sketches."""
    from adopt_spark.algos.anf import (
        ANF_K, ANF_ROUNDS, _init_mask_sql, anf_estimate_sql)

    rounds = rounds or ANF_ROUNDS
    k = k or ANF_K
    init = ",\n           ".join(
        f"{_init_mask_sql(j)} AS m{j}" for j in range(k))
    steps = []
    for i in range(1, rounds + 1):
        ors = ", ".join(f"bit_or(p.m{j}) AS m{j}" for j in range(k))
        steps.append(f"""m{i} AS MATERIALIZED (
    SELECT s.v, {ors}
    FROM sym s JOIN m{i - 1} p ON p.v = s.nbr
    GROUP BY s.v
)""")
    est = anf_estimate_sql(k)
    curve = "\nUNION ALL\n".join(
        f"SELECT {i} AS h, {est} AS anf FROM m{i}"
        for i in range(1, rounds + 1))
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT DISTINCT v, nbr FROM (
        SELECT sid AS v, tid AS nbr FROM edge WHERE sid <> tid
        UNION ALL SELECT tid, sid FROM edge WHERE sid <> tid
        UNION ALL SELECT sid, sid FROM edge WHERE sid <> tid
        UNION ALL SELECT tid, tid FROM edge WHERE sid <> tid)
), m0 AS MATERIALIZED (
    SELECT v, {init}
    FROM (SELECT DISTINCT v FROM sym)
), {', '.join(steps)}
SELECT h, anf, anf / max(anf) OVER () AS pct FROM (
{curve}
)"""


# --------------------------------------------- product quantization (ADC)

# MUST mirror functions.similarity.{PQ_M, PQ_K, PQ_SEED, PQ_SCALE,
# pq_codebook} exactly.
PQ_M, PQ_K, PQ_SEED, PQ_SCALE = 8, 16, 2024, 0.15
PQ_DIM = 64


def _pq_codebook_values() -> str:
    rng = np.random.default_rng(PQ_SEED)
    cb = rng.standard_normal((PQ_M, PQ_K, PQ_DIM // PQ_M)) * PQ_SCALE
    rows = []
    for mi in range(PQ_M):
        for ki in range(PQ_K):
            lit = "[" + ", ".join(repr(float(x)) for x in cb[mi, ki]) + "]"
            rows.append(f"({mi}, {ki}, {lit})")
    return ",\n".join(rows)


def knn_pq_sql(k: int = 5) -> str:
    """Exact replica of similarity.pq_topk: subvector slices, argmin
    codebook assignment (L2² expanded as ss - 2·ip + c2, ties to the
    smaller centroid id), per-subspace ADC partial products summed
    per pair, cosine against the exact query, 6 dp rank."""
    d = PQ_DIM // PQ_M
    return f"""
WITH ex AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb(m, j, cent) AS (VALUES
{_pq_codebook_values()}
),
sub AS MATERIALIZED (
    SELECT ex.vec_id, mm.m,
           (ex.v)[mm.m * {d} + 1 : mm.m * {d} + {d}] AS sv
    FROM ex CROSS JOIN (SELECT DISTINCT m FROM cb) mm
),
enc AS MATERIALIZED (
    SELECT vec_id, m, cent, list_inner_product(cent, cent) AS c2
    FROM (
        SELECT s.vec_id, s.m, c.cent,
               row_number() OVER (
                   PARTITION BY s.vec_id, s.m
                   ORDER BY list_inner_product(s.sv, s.sv)
                            - 2.0 * list_inner_product(s.sv, c.cent)
                            + list_inner_product(c.cent, c.cent),
                            c.j) AS rn
        FROM sub s JOIN cb c ON c.m = s.m
    ) WHERE rn = 1
),
qn AS (SELECT vec_id AS q_id, sqrt(list_inner_product(v, v)) AS n2
       FROM ex WHERE vec_id < 3),
qsub AS (SELECT vec_id AS q_id, m, sv FROM sub WHERE vec_id < 3),
pairs AS (
    SELECT q.q_id, e.vec_id,
           sum(list_inner_product(q.sv, e.cent)) AS dot,
           sqrt(sum(e.c2)) AS n1
    FROM enc e JOIN qsub q USING (m)
    GROUP BY 1, 2
),
scored AS (
    SELECT p.q_id, p.vec_id,
           CAST(round(p.dot / (p.n1 * q.n2), 6) AS DOUBLE) AS cos
    FROM pairs p JOIN qn q USING (q_id)
)
SELECT q_id, vec_id, cos, CAST(rnk AS INTEGER) AS rank
FROM (SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id) AS rnk
      FROM scored)
WHERE rnk <= {k}"""


# ----------------------------------------------------------------- SimRank

SIMRANK_C = 0.8
SIMRANK_ITERS = 5


def simrank_sql(edge_sql: str, iters: int = SIMRANK_ITERS,
                c: float = SIMRANK_C, top: int = 50) -> str:
    """Unrolled truncated SimRank, the exact twin of algos/simrank.py:
    s0 = diagonal; each step extends both pair ends along in-edges,
    aggregates per (a, b), scales by C/(indeg·indeg), re-unions the
    diagonal. Output: top-``top`` a<b pairs by 6 dp score."""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""s{i} AS MATERIALIZED (
    SELECT v AS a, v AS b, 1.0 AS s FROM verts
    UNION ALL
    SELECT g.a, g.b, ({c} * g.ssum) / (ia.d * ib.d) AS s
    FROM (
        SELECT e1.tid AS a, e2.tid AS b, sum(p.s) AS ssum
        FROM s{i-1} p
        JOIN edge e1 ON e1.sid = p.a
        JOIN edge e2 ON e2.sid = p.b
        GROUP BY e1.tid, e2.tid
    ) g
    JOIN indeg ia ON ia.v = g.a
    JOIN indeg ib ON ib.v = g.b
    WHERE g.a <> g.b
)""")
    return f"""WITH edge AS MATERIALIZED (
    SELECT DISTINCT sid, tid FROM ({edge_sql}) WHERE sid <> tid
), verts AS MATERIALIZED (
    SELECT sid AS v FROM edge UNION SELECT tid FROM edge
), indeg AS MATERIALIZED (
    SELECT tid AS v, count(*) AS d FROM edge GROUP BY tid
), s0 AS MATERIALIZED (
    SELECT v AS a, v AS b, 1.0 AS s FROM verts
), {', '.join(steps)}
SELECT a, b, score, CAST(rk AS INTEGER) AS rk
FROM (
    SELECT a, b, CAST(round(s, 6) AS DOUBLE) AS score,
           row_number() OVER (ORDER BY round(s, 6) DESC, a, b) AS rk
    FROM s{iters} WHERE a < b
) WHERE rk <= {top}"""


# -------------------------------------------------- MIS-peeling coloring

# env-overridable for gates at other scale factors (see KCORE_ROUNDS)
COLORING_COLORS = _env_int("ORACLE_COLORING_COLORS", 10)
# sf0.01 bounded contract subgraph uses 7 colors
COLORING_ROUNDS = _env_int("ORACLE_COLORING_ROUNDS", 8)
# max inner MIS depth measured at sf0.01: 4


def coloring_fixed_sql(edge_sql: str, colors: int = COLORING_COLORS,
                       rounds: int = COLORING_ROUNDS) -> str:
    """Unrolled MIS-peeling coloring, the exact twin of
    algos/mis.greedy_coloring: for each color the inner Luby MIS
    (same priority as mis_fixed_sql) runs over the VERTEX set of
    still-uncolored vertices, restricted to uncolored-uncolored
    adjacency; the class is removed and the next color starts.
    Over-budget colors/rounds are no-ops on empty sets."""
    p = "1000000007"
    parts = []
    color_final = []
    prev_unc = "unc0"
    for ci in range(colors):
        prev = prev_unc
        mis_names = []
        for r in range(1, rounds + 1):
            m, u = f"m{ci}_{r}", f"u{ci}_{r}"
            parts.append(f"""{m} AS MATERIALIZED (
    SELECT u.v FROM {prev} u WHERE NOT EXISTS (
        SELECT 1 FROM sym s JOIN {prev} w ON w.v = s.nbr
        WHERE s.v = u.v
          AND (w.p < u.p OR (w.p = u.p AND w.v < u.v)))
)""")
            parts.append(f"""{u} AS MATERIALIZED (
    SELECT u.v, u.p FROM {prev} u
    WHERE u.v NOT IN (SELECT v FROM {m})
      AND NOT EXISTS (SELECT 1 FROM sym s JOIN {m} m ON m.v = s.nbr
                      WHERE s.v = u.v)
)""")
            mis_names.append(m)
            prev = u
        cls = f"cls{ci}"
        union = "\nUNION ALL\n".join(f"SELECT v FROM {m}" for m in mis_names)
        parts.append(f"""{cls} AS MATERIALIZED (
    SELECT v FROM (
{union}
    )
)""")
        nxt = f"unc{ci + 1}"
        parts.append(f"""{nxt} AS MATERIALIZED (
    SELECT u.v, u.p FROM unc{ci} u
    WHERE u.v NOT IN (SELECT v FROM {cls})
)""")
        color_final.append((ci, cls))
        prev_unc = nxt
    tagged = "\nUNION ALL\n".join(
        f"SELECT v, {ci} AS color FROM {nm}" for ci, nm in color_final)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM edge
    UNION
    SELECT tid, sid FROM edge
), unc0 AS MATERIALIZED (
    SELECT DISTINCT v, (v % {p}) * 2654435761 % {p} AS p FROM sym
), {', '.join(parts)}
SELECT v, CAST(color AS INTEGER) AS color FROM (
{tagged}
)"""


# --------------------------------------- 4-node motif census (enumeration)


def census_sql(edge_sql: str) -> str:
    """Brute-force enumeration twin of algos/census.motif_census_4.

    Deliberately the OPPOSITE formulation: where the Spark side counts
    via degree/codegree/per-edge-triangle identities (one wedge
    shuffle, no 4-tuple ever enumerated), this oracle enumerates every
    motif occurrence with canonicalized multi-joins — the reference's
    own graph_query/*.sql idiom. Only the induced-count linear map
    (fixed public inclusion-exclusion matrix) is shared math; its
    inputs are computed independently on each side.
    """
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), und AS MATERIALIZED (
    SELECT DISTINCT least(sid, tid) AS u, greatest(sid, tid) AS v
    FROM edge WHERE sid <> tid
), adj AS MATERIALIZED (
    SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und
), tri AS MATERIALIZED (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM und e1
    JOIN und e2 ON e2.u = e1.v
    JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
), n_p4 AS (   -- path w-x-y-z, canonical w < z
    SELECT count(*) AS n
    FROM adj e1 JOIN adj e2 ON e2.a = e1.b JOIN adj e3 ON e3.a = e2.b
    WHERE e1.a < e3.b AND e1.a <> e2.b AND e1.b <> e3.b
), n_claw AS ( -- center + three leaves b1 < b2 < b3
    SELECT count(*) AS n
    FROM adj c1
    JOIN adj c2 ON c2.a = c1.a AND c2.b > c1.b
    JOIN adj c3 ON c3.a = c1.a AND c3.b > c2.b
), n_paw AS (  -- canonical triangle + outward pendant edge
    SELECT count(*) AS n
    FROM tri t JOIN adj p ON p.a IN (t.a, t.b, t.c)
    WHERE p.b NOT IN (t.a, t.b, t.c)
), n_c4 AS (   -- cycle a-b-c-d, a = min, direction b < d
    SELECT count(*) AS n
    FROM adj e1
    JOIN adj e2 ON e2.a = e1.b
    JOIN adj e3 ON e3.a = e2.b
    JOIN adj e4 ON e4.a = e3.b AND e4.b = e1.a
    WHERE e1.a < e1.b AND e1.a < e2.b AND e1.a < e3.b AND e1.b < e3.b
), n_dia AS (  -- shared edge (u,v) + common neighbors x < y
    SELECT count(*) AS n
    FROM und e
    JOIN adj x1 ON x1.a = e.u
    JOIN adj x2 ON x2.a = e.v AND x2.b = x1.b
    JOIN adj y1 ON y1.a = e.u
    JOIN adj y2 ON y2.a = e.v AND y2.b = y1.b
    WHERE x1.b < y1.b
), n_k4 AS (   -- a < b < c < d, all six edges
    SELECT count(*) AS n
    FROM und e1
    JOIN und e2 ON e2.u = e1.u
    JOIN und e3 ON e3.u = e1.u
    JOIN und e4 ON e4.u = e1.v AND e4.v = e2.v
    JOIN und e5 ON e5.u = e1.v AND e5.v = e3.v
    JOIN und e6 ON e6.u = e2.v AND e6.v = e3.v
    WHERE e1.v < e2.v AND e2.v < e3.v
), wide AS (
    SELECT (SELECT n FROM n_p4) AS p4, (SELECT n FROM n_claw) AS claw,
           (SELECT n FROM n_paw) AS paw, (SELECT n FROM n_c4) AS c4,
           (SELECT n FROM n_dia) AS diamond, (SELECT n FROM n_k4) AS k4
)
SELECT motif, CAST(n AS BIGINT) AS n,
       CAST(n_induced AS BIGINT) AS n_induced
FROM (
    SELECT 'c4_cycle' AS motif, c4 AS n,
           c4 - diamond + 3 * k4 AS n_induced FROM wide
    UNION ALL
    SELECT 'claw_star', claw, claw - paw + 2 * diamond - 4 * k4 FROM wide
    UNION ALL
    SELECT 'diamond', diamond, diamond - 6 * k4 FROM wide
    UNION ALL
    SELECT 'k4_clique', k4, k4 FROM wide
    UNION ALL
    SELECT 'p4_path', p4,
           p4 - 2 * paw - 4 * c4 + 6 * diamond - 12 * k4 FROM wide
    UNION ALL
    SELECT 'paw_tailed_tri', paw, paw - 4 * diamond + 12 * k4 FROM wide
)
ORDER BY motif"""


# ------------------------------------------------- Weisfeiler-Leman (1-WL)

def wl_fixed_sql(edge_sql: str, rounds: int = 3) -> str:
    """Unrolled 1-WL refinement twin of algos/wl.py:wl_colors.

    Same integer Horner fold (DuckDB ``list_reduce`` vs Spark
    ``aggregate``), same sorted neighbor-color lists, same constants
    (wl.WL_A/WL_B/WL_M/WL_P) — colors are bit-identical per vertex.
    """
    from adopt_spark.algos.wl import WL_A, WL_B, WL_M, WL_P

    ctes = [f"edge AS (\n{edge_sql}\n)", """nbr AS (
    SELECT sid AS v, tid AS u FROM edge WHERE sid <> tid
    UNION
    SELECT tid AS v, sid AS u FROM edge WHERE sid <> tid
)""", """c0 AS (
    SELECT v, CAST(count(*) AS BIGINT) AS color FROM nbr GROUP BY v
)"""]
    for r in range(1, rounds + 1):
        prev = f"c{r - 1}"
        ctes.append(f"""c{r} AS (
    SELECT n.v,
           list_reduce(
               list_prepend((own.color * {WL_A} + {WL_B}) % {WL_P},
                            list_sort(list(c.color))),
               (a, b) -> (a * {WL_M} + b) % {WL_P}) AS color
    FROM nbr n
    JOIN {prev} c   ON c.v = n.u
    JOIN {prev} own ON own.v = n.v
    GROUP BY n.v, own.color
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT v, color AS wl_color FROM c{rounds}")


# ------------------------------------------------- densest subgraph (BKV)

DENSEST_ROUNDS = 12  # sf0.01 sparse contract graph empties in 4; 3x margin


def densest_fixed_sql(edge_sql: str, rounds: int = DENSEST_ROUNDS) -> str:
    """Unrolled BKV eps=1/2 greedy peel, the exact twin of
    algos/densest.py:densest_subgraph: round i drops every vertex with
    deg * nv <= 3 * ne (exact integers, HUGEINT cross-multiplication),
    the best round maximizes ne/nv with ties to the EARLIEST round,
    and the output is that round's vertex set tagged (round, nv, ne).
    Rounds past an empty edge set are no-ops (stats rows with ne = 0
    are excluded), so a generous budget and the engine's early-stop
    loop agree exactly."""
    ctes = [f"""edge AS MATERIALIZED (
{edge_sql}
)""", """e0 AS MATERIALIZED (
    SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
    FROM edge WHERE sid <> tid
)"""]
    stats_rows = []
    vert_rows = []
    for i in range(rounds):
        d, s, nxt = f"d{i}", f"s{i}", f"e{i + 1}"
        ctes.append(f"""{d} AS MATERIALIZED (
    SELECT v, count(*) AS deg
    FROM (SELECT a AS v FROM e{i} UNION ALL SELECT b FROM e{i})
    GROUP BY v
)""")
        ctes.append(f"""{s} AS MATERIALIZED (
    SELECT count(*) AS nv, COALESCE(sum(deg), 0) // 2 AS ne FROM {d}
)""")
        if i < rounds - 1:
            ctes.append(f"""{nxt} AS MATERIALIZED (
    SELECT e.a, e.b
    FROM e{i} e
    JOIN {d} da ON da.v = e.a
    JOIN {d} db ON db.v = e.b, {s} s
    WHERE CAST(da.deg AS HUGEINT) * s.nv > 3 * s.ne
      AND CAST(db.deg AS HUGEINT) * s.nv > 3 * s.ne
)""")
        stats_rows.append(f"SELECT {i} AS round, nv, ne FROM {s}")
        vert_rows.append(f"SELECT {i} AS round, v FROM {d}")
    ctes.append("stats AS MATERIALIZED (\n"
                + "\nUNION ALL\n".join(stats_rows) + "\n)")
    ctes.append("verts AS (\n" + "\nUNION ALL\n".join(vert_rows) + "\n)")
    ctes.append("""best AS (
    SELECT round, nv, ne FROM stats s
    WHERE ne > 0 AND NOT EXISTS (
        SELECT 1 FROM stats o WHERE o.ne > 0 AND (
            CAST(o.ne AS HUGEINT) * s.nv > CAST(s.ne AS HUGEINT) * o.nv
            OR (CAST(o.ne AS HUGEINT) * s.nv = CAST(s.ne AS HUGEINT) * o.nv
                AND o.round < s.round)))
)""")
    return ("WITH " + ",\n".join(ctes) + """
SELECT CAST(verts.v AS BIGINT) AS v,
       CAST(best.round AS INTEGER) AS round,
       CAST(best.nv AS BIGINT) AS nv,
       CAST(best.ne AS BIGINT) AS ne
FROM verts JOIN best ON verts.round = best.round""")


# ----------------------------------------------------- DAG depth

DAG_ROUNDS = 40  # sf0.01 sparse contract graph: max depth 27; 1.5x margin


def dag_depth_sql(edge_sql: str, rounds: int = DAG_ROUNDS) -> str:
    """Unrolled max-relaxation twin of algos/dag.py:dag_depth —
    d_r(v) = min(true_depth(v), r), so any budget >= the true max
    depth yields the fixpoint; rounds past convergence are no-ops."""
    ctes = [f"""edge AS MATERIALIZED (
{edge_sql}
)""", """dag AS MATERIALIZED (
    SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
    FROM edge WHERE sid <> tid
)""", """nodes AS MATERIALIZED (
    SELECT a AS v FROM dag UNION SELECT b FROM dag
)""", """d0 AS MATERIALIZED (
    SELECT v, CAST(0 AS BIGINT) AS d FROM nodes
)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
    SELECT n.v, COALESCE(max(p.d + 1), 0) AS d
    FROM nodes n
    LEFT JOIN dag e ON e.b = n.v
    LEFT JOIN d{r - 1} p ON p.v = e.a
    GROUP BY n.v
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT v, CAST(d AS INTEGER) AS depth FROM d{rounds}")


# ------------------------------------------------------- eigenvector

EIGEN_ITERS = 10


def eigen_fixed_sql(edge_sql: str, k_iters: int = EIGEN_ITERS) -> str:
    """Unrolled power iteration with per-step L2 normalization, the
    exact twin of algos/eigen.py: x0 = 1/sqrt(N) on the symmetrized
    simple graph, x_{t+1} = A x_t / ||A x_t||_2; 6 dp output."""
    steps = []
    for i in range(1, k_iters + 1):
        steps.append(f"""s{i} AS MATERIALIZED (
    SELECT e.w AS v, sum(p.x) AS s
    FROM sym e JOIN x{i-1} p ON p.v = e.u
    GROUP BY e.w
), x{i} AS MATERIALIZED (
    SELECT v, s / (SELECT sqrt(sum(s * s)) FROM s{i}) AS x FROM s{i}
)""")
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT DISTINCT u, w FROM (
        SELECT sid AS u, tid AS w FROM edge
        UNION ALL SELECT tid, sid FROM edge
    ) WHERE u <> w
), verts AS MATERIALIZED (SELECT DISTINCT u AS v FROM sym),
x0 AS MATERIALIZED (
    SELECT v, 1.0 / sqrt((SELECT count(*) FROM verts)) AS x FROM verts
), {', '.join(steps)}
SELECT v, CAST(round(x, 6) AS DOUBLE) AS eigen FROM x{k_iters}"""


# ------------------------------------------------- Markov stationary

MARKOV_ITERS = 20


def markov_stationary_sql(k_iters: int = MARKOV_ITERS) -> str:
    """Unrolled power iteration of the event-type Markov chain, the
    exact twin of queries/registry.py:q_markov_stationary: states =
    event types observed as transition sources; transitions restricted
    to dst within that state set and row-normalized over the
    restricted counts (strictly stochastic); pi0 uniform."""
    steps = []
    for i in range(1, k_iters + 1):
        steps.append(f"""pi{i} AS MATERIALIZED (
    SELECT t.dst AS state, sum(p.pi * t.n / t.tot) AS pi
    FROM trans t JOIN pi{i-1} p ON p.state = t.src
    GROUP BY t.dst
)""")
    return f"""WITH pairs AS MATERIALIZED (
    SELECT src, dst, count(*) AS n FROM (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ) WHERE dst IS NOT NULL GROUP BY src, dst
), states AS MATERIALIZED (SELECT DISTINCT src AS state FROM pairs),
trans AS MATERIALIZED (
    SELECT p.src, p.dst, CAST(p.n AS DOUBLE) AS n, t.tot
    FROM (SELECT * FROM pairs
          WHERE dst IN (SELECT state FROM states)) p
    JOIN (SELECT src, CAST(sum(n) AS DOUBLE) AS tot
          FROM pairs WHERE dst IN (SELECT state FROM states)
          GROUP BY src) t USING (src)
), pi0 AS MATERIALIZED (
    SELECT state, 1.0 / (SELECT count(*) FROM states) AS pi FROM states
), {', '.join(steps)}
SELECT state, CAST(round(pi, 6) AS DOUBLE) AS pi FROM pi{k_iters}"""


# ------------------------------------------------- Louvain local-move

LOUVAIN_SWEEPS = 6


def _louvain_half_step(prev: str, out: str, parity: int) -> str:
    """One parity half-step: vertices with v % 2 == parity re-decide
    (strict-improvement move rule, own community wins score ties,
    smaller c breaks ties among improvers), the rest keep."""
    return f"""tot_{out} AS MATERIALIZED (
    SELECT l.label, sum(d.k) AS tot
    FROM {prev} l JOIN degv d USING (v) GROUP BY l.label
), cand_{out} AS MATERIALIZED (
    SELECT v, c, max(w) AS w FROM (
        SELECT s.v, p.label AS c, count(*) AS w
        FROM sym s JOIN {prev} p ON p.v = s.nbr
        WHERE s.v % 2 = {parity}
        GROUP BY s.v, p.label
        UNION ALL
        SELECT v, label AS c, 0 AS w FROM {prev} WHERE v % 2 = {parity}
    ) GROUP BY v, c
), {out} AS MATERIALIZED (
    SELECT v, c AS label FROM (
        SELECT g.v, g.c,
               row_number() OVER (PARTITION BY g.v
                                  ORDER BY g.score DESC, g.is_own DESC,
                                           g.c ASC) AS rn
        FROM (SELECT ca.v, ca.c,
                     (SELECT twom FROM mm) * ca.w
                     - d.k * (t.tot - CASE WHEN ca.c = ol.label
                                           THEN d.k ELSE 0 END) AS score,
                     CASE WHEN ca.c = ol.label THEN 1 ELSE 0 END AS is_own
              FROM cand_{out} ca
              JOIN {prev} ol ON ol.v = ca.v
              JOIN degv d ON d.v = ca.v
              JOIN tot_{out} t ON t.label = ca.c) g
    ) WHERE rn = 1
    UNION ALL
    SELECT v, label FROM {prev} WHERE v % 2 <> {parity}
)"""


def louvain_fixed_sql(edge_sql: str, sweeps: int = LOUVAIN_SWEEPS) -> str:
    """Parity-scheduled Louvain local-move phase, unrolled: each sweep
    is two half-steps (odd-id vertices re-decide first, then even-id
    against the refreshed labels). An updating vertex moves to the
    candidate community c (a neighbor label or its own) maximizing the
    ALL-INTEGER score

        2m*w_vc - k_v*(tot_c - k_v*[label(v)=c])

    (modularity gain scaled by 2m^2) with the STRICT-improvement rule:
    a top-score tie that includes the current community resolves to
    staying, otherwise the smallest best c wins — the exact twin of
    algos/louvain.py:louvain_move (v % 2 equals Spark\'s pmod(v, 2) on
    the non-negative derived-graph ids). Output: community size
    histogram [label, size]."""
    steps = []
    prev = "l0"
    for i in range(1, sweeps + 1):
        steps.append(_louvain_half_step(prev, f"h{i}", parity=1))
        steps.append(_louvain_half_step(f"h{i}", f"l{i}", parity=0))
        prev = f"l{i}"
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM edge
    UNION
    SELECT tid, sid FROM edge
), degv AS MATERIALIZED (
    SELECT v, count(*) AS k FROM sym GROUP BY v
), mm AS MATERIALIZED (SELECT count(*) AS twom FROM sym),
l0 AS MATERIALIZED (
    SELECT v, v AS label FROM degv
), {', '.join(steps)}
SELECT label, count(*) AS size FROM l{sweeps} GROUP BY label"""


# ------------------------------------------- temporal reachability

TEMPORAL_ROUNDS = 8

# hourly same-event-type contact list — the shared deterministic
# input of the temporal operators (twin of algos/temporal.py:
# hourly_contacts)
CONTACTS_CTE_SQL = """occ AS MATERIALIZED (
    SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
           CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
           event_type
    FROM events
), contacts AS MATERIALIZED (
    SELECT DISTINCT a.u, b.u AS v, a.t
    FROM occ a JOIN occ b ON a.t = b.t AND a.event_type = b.event_type
    WHERE a.u <> b.u
)"""


def temporal_triangles_sql(deltas: tuple[int, ...] = (24, 72)) -> str:
    """δ-temporal triangle census: ordered contact triples
    (u,v,t1),(v,w,t2),(w,u,t3), t1 < t2 < t3, span ≤ δ — the exact
    twin of algos/temporal.py:temporal_triangles."""
    max_d = max(deltas)
    values = ", ".join(f"({int(d)})" for d in deltas)
    return f"""WITH {CONTACTS_CTE_SQL}, tri AS MATERIALIZED (
    SELECT c3.t - c1.t AS span
    FROM contacts c1
    JOIN contacts c2 ON c2.u = c1.v AND c2.t > c1.t AND c2.v <> c1.u
    JOIN contacts c3 ON c3.u = c2.v AND c3.v = c1.u AND c3.t > c2.t
    WHERE c3.t - c1.t <= {max_d}
), dl(delta) AS (VALUES {values})
SELECT d.delta, CAST(count(t.span) AS BIGINT) AS n_triangles
FROM dl d LEFT JOIN tri t ON t.span <= d.delta
GROUP BY d.delta"""


def temporal_reach_sql(rounds: int = TEMPORAL_ROUNDS) -> str:
    """Earliest-arrival temporal BFS over hourly same-event-type
    contacts, unrolled: arr_{i+1}(v) = min(arr_i(v), min t of contacts
    (u,v,t) with t >= arr_i(u)) from the minimum user id — the exact
    twin of algos/temporal.py:temporal_reach_report. Rounds past the
    fixpoint are no-ops."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""a{i} AS MATERIALIZED (
    SELECT v, min(arrival) AS arrival FROM (
        SELECT v, arrival FROM a{i-1}
        UNION ALL
        SELECT c.v, c.t AS arrival
        FROM contacts c JOIN a{i-1} p ON p.v = c.u
        WHERE c.t >= p.arrival
    ) GROUP BY v
)""")
    return f"""WITH {CONTACTS_CTE_SQL}, a0 AS MATERIALIZED (
    SELECT CAST(min(user_id) AS BIGINT) AS v, CAST(0 AS BIGINT) AS arrival
    FROM events
), {', '.join(steps)}
SELECT v, CAST(arrival AS BIGINT) AS arrival FROM a{rounds}"""


# ------------------------------------------- threshold cascade

CASCADE_ROUNDS = 10
CASCADE_THETA = 2
CASCADE_SEEDS = 25


def cascade_fixed_sql(edge_sql: str, n_seeds: int = CASCADE_SEEDS,
                      theta: int = CASCADE_THETA,
                      rounds: int = CASCADE_ROUNDS) -> str:
    """Bootstrap-percolation unroll: seeds = the n_seeds lowest vertex
    ids at round 0; an inactive vertex activates in round i when >=
    theta neighbors are active after round i-1. Monotone, so rounds
    past the fixpoint are no-ops — the exact twin of
    algos/cascade.py:cascade_report."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""r{i} AS MATERIALIZED (
    SELECT v, round FROM r{i-1}
    UNION ALL
    SELECT c.v, {i} AS round FROM (
        SELECT s.v, count(*) AS n_active
        FROM sym s JOIN r{i-1} a ON a.v = s.nbr
        GROUP BY s.v
    ) c
    WHERE c.n_active >= {theta}
      AND c.v NOT IN (SELECT v FROM r{i-1})
)""")
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), sym AS MATERIALIZED (
    SELECT sid AS v, tid AS nbr FROM edge
    UNION
    SELECT tid, sid FROM edge
), r0 AS MATERIALIZED (
    SELECT v, 0 AS round FROM (
        SELECT DISTINCT v FROM sym ORDER BY v LIMIT {n_seeds}
    )
), {', '.join(steps)}
SELECT v, CAST(round AS INTEGER) AS round FROM r{rounds}"""


# ------------------------------------------------ multilevel coarsening

COARSEN_LEVELS = 2
COARSEN_ROUNDS = 12


def _coarsen_chain(levels: int, rounds: int) -> list[str]:
    """CTE chain shared by coarsen_sql / multilevel_partition_sql:
    u0 (unit-weight undirected simple graph), then per level the
    fixed-round Luby matching (identical shape to matching_fixed_sql),
    m{L} (matched pairs), map{L} (b -> a plus identity), u{L}
    (contraction with summed parallel-edge weights)."""
    p = "1000000007"
    pri = (f"(((a % {p}) * 2000003 + (b % {p})) % {p}) "
           f"* 2654435761 % {p}")
    parts = [f"""u0 AS MATERIALIZED (
    SELECT least(sid, tid) AS a, greatest(sid, tid) AS b,
           CAST(1 AS BIGINT) AS w
    FROM (SELECT DISTINCT least(sid, tid) AS sid,
                 greatest(sid, tid) AS tid
          FROM edge WHERE sid <> tid)
)"""]
    for lvl in range(1, levels + 1):
        prev_u = f"u{lvl - 1}"
        prev = f"l{lvl}a0"
        parts.append(f"""{prev} AS MATERIALIZED (
    SELECT a, b, {pri} AS p FROM {prev_u}
)""")
        win_names = []
        for i in range(1, rounds + 1):
            w, mv, a = f"l{lvl}w{i}", f"l{lvl}mv{i}", f"l{lvl}a{i}"
            parts.append(f"""{w} AS MATERIALIZED (
    SELECT a, b FROM (
        SELECT v, a, b,
               row_number() OVER (PARTITION BY v ORDER BY p, a, b) AS rn
        FROM (SELECT a AS v, a, b, p FROM {prev}
              UNION ALL
              SELECT b, a, b, p FROM {prev})
    ) WHERE rn = 1 GROUP BY a, b HAVING count(*) = 2
)""")
            parts.append(f"""{mv} AS MATERIALIZED (
    SELECT a AS v FROM {w} UNION SELECT b FROM {w}
)""")
            parts.append(f"""{a} AS MATERIALIZED (
    SELECT e.a, e.b, e.p FROM {prev} e
    WHERE e.a NOT IN (SELECT v FROM {mv})
      AND e.b NOT IN (SELECT v FROM {mv})
)""")
            win_names.append(w)
            prev = a
        union = "\n        UNION ALL\n        ".join(
            f"SELECT a, b FROM {w}" for w in win_names)
        parts.append(f"""m{lvl} AS MATERIALIZED (
    {union}
)""")
        parts.append(f"""map{lvl} AS MATERIALIZED (
    SELECT b AS v, a AS sv FROM m{lvl}
    UNION ALL
    SELECT v, v AS sv FROM (
        SELECT a AS v FROM {prev_u} UNION SELECT b FROM {prev_u}
    ) WHERE v NOT IN (SELECT b FROM m{lvl})
)""")
        parts.append(f"""u{lvl} AS MATERIALIZED (
    SELECT least(ma.sv, mb.sv) AS a, greatest(ma.sv, mb.sv) AS b,
           CAST(sum(e.w) AS BIGINT) AS w
    FROM {prev_u} e
    JOIN map{lvl} ma ON ma.v = e.a
    JOIN map{lvl} mb ON mb.v = e.b
    WHERE ma.sv <> mb.sv
    GROUP BY 1, 2
)""")
    return parts


def coarsen_sql(edge_sql: str, levels: int = COARSEN_LEVELS,
                rounds: int = COARSEN_ROUNDS) -> str:
    """Unrolled multilevel random-matching coarsening, the exact twin
    of algos/coarsen.py: per level a fixed-round Luby matching
    (identical CTE shape to matching_fixed_sql), supervertex map
    (matched b -> a, identity elsewhere), contraction with summed
    parallel-edge weights; per-level (n_vertices, n_edges,
    total_weight) summary rows."""
    parts = _coarsen_chain(levels, rounds)
    rows = "\n    UNION ALL\n    ".join(f"""SELECT {l} AS level,
        (SELECT count(DISTINCT v) FROM (
            SELECT a AS v FROM u{l} UNION ALL SELECT b FROM u{l}
        )) AS n_vertices,
        (SELECT count(*) FROM u{l}) AS n_edges,
        (SELECT CAST(coalesce(sum(w), 0) AS BIGINT) FROM u{l})
            AS total_weight""" for l in range(levels + 1))
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), {', '.join(parts)}
SELECT CAST(level AS INTEGER) AS level, n_vertices, n_edges, total_weight
FROM (
    {rows}
)
ORDER BY level"""


def multilevel_partition_sql(edge_sql: str, k: int = 4,
                             levels: int = COARSEN_LEVELS,
                             rounds: int = COARSEN_ROUNDS) -> str:
    """Twin of algos/coarsen.py:multilevel_partition — the cascade
    maps composed down to a coarsest-supervertex assignment (sv % k),
    projected to level 0 and cut-scored against direct v % k."""
    parts = _coarsen_chain(levels, rounds)
    parts.append("""verts0 AS MATERIALIZED (
    SELECT DISTINCT v FROM (
        SELECT a AS v FROM u0 UNION ALL SELECT b FROM u0
    )
)""")
    prev = "proj0"
    parts.append(f"""{prev} AS MATERIALIZED (
    SELECT v, v AS sv FROM verts0
)""")
    for lvl in range(1, levels + 1):
        cur = f"proj{lvl}"
        parts.append(f"""{cur} AS MATERIALIZED (
    SELECT p.v, coalesce(m.a, p.sv) AS sv
    FROM {prev} p LEFT JOIN m{lvl} m ON m.b = p.sv
)""")
        prev = cur
    parts.append(f"""assign_ml AS MATERIALIZED (
    SELECT v, sv % {k} AS part FROM {prev}
)""")
    parts.append(f"""assign_h AS MATERIALIZED (
    SELECT v, v % {k} AS part FROM verts0
)""")

    def rep(name: str, assign: str) -> str:
        return f"""SELECT '{name}' AS strategy,
        (SELECT CAST(coalesce(sum(CASE WHEN pa.part <> pb.part
                                       THEN e.w ELSE 0 END), 0) AS BIGINT)
         FROM u0 e JOIN {assign} pa ON pa.v = e.a
                   JOIN {assign} pb ON pb.v = e.b) AS cut_weight,
        (SELECT CAST(coalesce(sum(w), 0) AS BIGINT) FROM u0)
            AS total_weight,
        (SELECT CAST(max(n) AS BIGINT) FROM (
            SELECT count(*) AS n FROM {assign} GROUP BY part
        )) AS max_part"""

    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), {', '.join(parts)}
SELECT strategy, cut_weight, total_weight,
       round(CAST(cut_weight AS DOUBLE) / total_weight, 6) AS cut_frac,
       max_part
FROM (
    {rep('coarsen_project', 'assign_ml')}
    UNION ALL
    {rep('hash_direct', 'assign_h')}
)
ORDER BY strategy"""


def markov_absorb_sql(k_iters: int = MARKOV_ITERS) -> str:
    """Unrolled absorption-probability recurrence, the twin of
    queries/registry.py:q_markov_absorb: same restricted/renormalized
    chain as markov_stationary_sql, absorber = lexicographically
    largest state with its row overridden to 1 every step:
      p_{t+1}(s) = 1 if s = absorber else sum_d T(s, d) * p_t(d)
    — P(hit absorber within t steps), monotone in t."""
    steps = []
    for i in range(1, k_iters + 1):
        steps.append(f"""p{i} AS MATERIALIZED (
    SELECT s.state,
           CASE WHEN s.state = (SELECT a FROM absorber) THEN 1.0
                ELSE coalesce(h.p, 0.0) END AS p
    FROM states s LEFT JOIN (
        SELECT t.src AS state, sum(t.n / t.tot * q.p) AS p
        FROM trans t JOIN p{i-1} q ON q.state = t.dst
        GROUP BY t.src
    ) h ON h.state = s.state
)""")
    return f"""WITH pairs AS MATERIALIZED (
    SELECT src, dst, count(*) AS n FROM (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ) WHERE dst IS NOT NULL GROUP BY src, dst
), states AS MATERIALIZED (SELECT DISTINCT src AS state FROM pairs),
absorber AS MATERIALIZED (SELECT max(state) AS a FROM states),
trans AS MATERIALIZED (
    SELECT p.src, p.dst, CAST(p.n AS DOUBLE) AS n, t.tot
    FROM (SELECT * FROM pairs
          WHERE dst IN (SELECT state FROM states)) p
    JOIN (SELECT src, CAST(sum(n) AS DOUBLE) AS tot
          FROM pairs WHERE dst IN (SELECT state FROM states)
          GROUP BY src) t USING (src)
), p0 AS MATERIALIZED (
    SELECT state,
           CASE WHEN state = (SELECT a FROM absorber)
                THEN 1.0 ELSE 0.0 END AS p
    FROM states
), {', '.join(steps)}
SELECT state, CAST(round(p, 6) AS DOUBLE) AS p_absorb FROM p{k_iters}"""


# env-overridable for gates at other scale factors (see KCORE_ROUNDS)
WEIGHTED_MATCHING_ROUNDS = _env_int("ORACLE_WMATCH_ROUNDS", 24)


def weighted_matching_sql(edge_sql: str,
                          rounds: int = WEIGHTED_MATCHING_ROUNDS) -> str:
    """Unrolled locally-dominant weighted matching, the exact twin of
    algos/matching.py:weighted_matching — matching_fixed_sql with the
    hash priority replaced by (weight DESC, a, b) and the weight
    emitted."""
    pri = "1 + (a * 7 + b * 13) % 10"
    parts = []
    prev = "a0"
    win_names = []
    for i in range(1, rounds + 1):
        w, mv, a = f"w{i}", f"mv{i}", f"a{i}"
        parts.append(f"""{w} AS MATERIALIZED (
    SELECT a, b, min(wt) AS wt FROM (
        SELECT v, a, b, wt,
               row_number() OVER (PARTITION BY v
                                  ORDER BY wt DESC, a, b) AS rn
        FROM (SELECT a AS v, a, b, wt FROM {prev}
              UNION ALL
              SELECT b, a, b, wt FROM {prev})
    ) WHERE rn = 1 GROUP BY a, b HAVING count(*) = 2
)""")
        parts.append(f"""{mv} AS MATERIALIZED (
    SELECT a AS v FROM {w} UNION SELECT b FROM {w}
)""")
        parts.append(f"""{a} AS MATERIALIZED (
    SELECT e.a, e.b, e.wt FROM {prev} e
    WHERE e.a NOT IN (SELECT v FROM {mv})
      AND e.b NOT IN (SELECT v FROM {mv})
)""")
        win_names.append(w)
        prev = a
    union = "\nUNION ALL\n".join(
        f"SELECT a, b, wt FROM {w}" for w in win_names)
    return f"""WITH edge AS MATERIALIZED (
{edge_sql}
), und AS MATERIALIZED (
    SELECT DISTINCT least(sid, tid) AS a, greatest(sid, tid) AS b
    FROM edge WHERE sid <> tid
), a0 AS MATERIALIZED (
    SELECT a, b, CAST({pri} AS BIGINT) AS wt FROM und
), {', '.join(parts)}
SELECT a AS sid, b AS tid, wt AS w FROM (
{union}
)"""


def pagerank_deltas_sql(edge_sql: str, k_iters: int = 8,
                        damping: float = PR_DAMPING) -> str:
    """Per-superstep L1 convergence curve: reuse pagerank_fixed_sql's
    unrolled r0..rk chain, replace the final vector SELECT with one
    delta row per step — sum over v of |r_i - r_{i-1}| (6 dp). The
    oracle for the engine's own convergence telemetry."""
    base = pagerank_fixed_sql(edge_sql, k_iters=k_iters, damping=damping)
    head, _ = base.rsplit("\nSELECT v, CAST(round(r, 6) AS DOUBLE)", 1)
    deltas = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS iteration, "
        f"round((SELECT sum(abs(a.r - b.r)) FROM r{i} a "
        f"JOIN r{i-1} b USING (v)), 6) AS l1_delta"
        for i in range(1, k_iters + 1))
    return f"{head}\n{deltas}"
