"""Session-21 operators: symbol call graph, SemDeDup, DeepWalk
co-occurrence — python/numpy differentials independent of the SQL
twins (which the contract gate already exercises)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# ------------------------------------------------------- call graph


def _py_call_graph(doc_ids, texts):
    """Independent python re-implementation over the SAME planted
    content the engine builds (re-planted here in python, not via the
    engine's Column law)."""
    NSYM = 97
    defs, calls = [], []
    for d, t in zip(doc_ids, texts):
        content = t + f"\ndef sym_{d % NSYM}(x):"
        for j in (1, 2, 3):
            if d % 3 >= j - 1:
                content += f"\ncall sym_{(d * 7 + 13 * j) % NSYM}()"
        for m in re.finditer(r"def (sym_\d+)\(", content):
            defs.append((d, m.group(1)))
        for m in re.finditer(r"call (sym_\d+)\(", content):
            calls.append((d, m.group(1)))
    n_defs = Counter(s for _, s in defs)
    n_sites = Counter(s for _, s in calls)
    callers = defaultdict(set)
    for d, s in calls:
        callers[s].add(d)
    definers = defaultdict(set)
    for d, s in defs:
        definers[s].add(d)
    edges = defaultdict(set)
    for s in callers:
        for c in callers[s]:
            for de in definers.get(s, ()):
                if c != de:
                    edges[s].add((c, de))
    rows = {}
    for s in set(n_defs) | set(n_sites):
        rows[s] = (n_defs.get(s, 0), n_sites.get(s, 0),
                   len(callers.get(s, ())), len(edges.get(s, ())))
    return rows


def test_call_graph_matches_python(spark):
    from adopt_spark.functions.callgraph import call_graph_report

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = {r.symbol: (r.n_defs, r.n_call_sites, r.n_callers,
                      r.n_cross_edges)
           for r in call_graph_report(docs).collect()}
    pdf = docs.select("doc_id", "text").toPandas()
    want = _py_call_graph(pdf.doc_id.tolist(), pdf.text.tolist())
    assert got == want
    # every symbol of the law appears (n_docs >> NSYM)
    assert len(got) == 97


def test_call_graph_extractor_is_generic(spark):
    """The extractor works on arbitrary text, not just the fixture
    law: hand-written defs/calls with multi-definer resolution."""
    from adopt_spark.functions.callgraph import call_graph_report

    rows = [
        (1, "def sym_5(x): pass\ncall sym_7()"),
        (2, "def sym_7(a):\ncall sym_7()\ncall sym_5()"),
        (3, "def sym_7(b):"),        # second definer of sym_7
        (4, "call sym_7() call sym_7()"),   # repeated site, one caller
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.symbol: (r.n_defs, r.n_call_sites, r.n_callers,
                      r.n_cross_edges)
           for r in call_graph_report(docs, F.col("text")).collect()}
    # sym_7: 2 defs (docs 2,3); sites: doc1 x1, doc2 x1, doc4 x2 = 4;
    # callers {1,2,4}; cross edges: (1,2),(1,3),(2,3),(4,2),(4,3) = 5
    # (doc2 calls its own def -> excluded)
    assert out["sym_7"] == (2, 4, 3, 5)
    # sym_5: 1 def (doc1); 1 site (doc2); 1 caller; edge (2,1)
    assert out["sym_5"] == (1, 1, 1, 1)


# --------------------------------------------------------- SemDeDup


def test_semantic_dedup_matches_numpy(spark):
    """Drop decisions re-derived in numpy from the ENGINE's own
    cluster assignment (the assignment itself is oracle-checked via
    s_kmeans); the cosine prune + keep-lowest-id policy must agree."""
    from adopt_spark.functions.dedup import semantic_dedup
    from adopt_spark.functions.kmeans import kmeans_assign

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    tau = 0.3
    got = {r.cid: (r.n_docs, r.n_dropped, r.n_kept)
           for r in semantic_dedup(emb, tau=tau).collect()}

    assign = {r.vec_id: r.cid for r in kmeans_assign(emb).collect()}
    pdf = emb.toPandas()
    V = np.stack(pdf.embedding.values).astype(np.float64)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = pdf.vec_id.tolist()
    by_cid = defaultdict(list)
    for i, vid in enumerate(ids):
        by_cid[assign[vid]].append((vid, i))
    want = {}
    for cid, members in by_cid.items():
        members.sort()
        dropped = set()
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                va, vb = members[a][1], members[b][1]
                if float(U[va] @ U[vb]) >= tau:
                    dropped.add(members[b][0])
        want[cid] = (len(members), len(dropped),
                     len(members) - len(dropped))
    assert got == want
    # sanity: something dropped, nothing fully emptied
    assert sum(d for _, d, _ in got.values()) > 0
    assert all(k > 0 for _, _, k in got.values())


def test_semantic_dedup_tau_monotone(spark):
    """Raising tau can only drop fewer docs."""
    from adopt_spark.functions.dedup import semantic_dedup

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    lo = sum(r.n_dropped for r in semantic_dedup(emb, tau=0.2).collect())
    hi = sum(r.n_dropped for r in semantic_dedup(emb, tau=0.45).collect())
    assert hi <= lo


# --------------------------------------- DeepWalk co-occurrence/PPMI


def test_walk_cooccurrence_matches_python(spark, tri6):
    """Full pair harvest re-derived in python from the engine's own
    deterministic walks (walks themselves are differentially tested
    in test_walks.py / replayed by the SQL twin)."""
    from adopt_spark.algos.walks import random_walks, walk_cooccurrence

    edges, _ = tri6
    length, window = 6, 2
    walks = random_walks(spark, edges, length)
    seqs = defaultdict(dict)
    for r in walks.collect():
        seqs[r.walk_id][r.step] = r.v
    cnt = Counter()
    for wid, sv in seqs.items():
        seq = [sv[s] for s in sorted(sv)]
        for i in range(len(seq)):
            for j in range(i + 1, min(i + window, len(seq) - 1) + 1):
                u, v = sorted((seq[i], seq[j]))
                cnt[(u, v)] += 1
    t = sum(cnt.values())
    marg = Counter()
    for (u, v), n in cnt.items():
        marg[u] += n
        marg[v] += n
    want = {}
    for (u, v), n in cnt.items():
        ppmi = round(max(0.0, math.log(n * 4.0 * t
                                       / (marg[u] * marg[v]))), 6)
        want[(u, v)] = (n, ppmi)

    out = walk_cooccurrence(spark, edges, length=length,
                            window=window, topn=10_000).collect()
    got = {(r.u, r.v): (r.n_cooc, r.ppmi) for r in out}
    assert got == want
    # top-n ordering: counts non-increasing
    ns = [r.n_cooc for r in out]
    assert ns == sorted(ns, reverse=True)


def test_walk_cooccurrence_window1_is_consecutive_steps(spark, tri6):
    """window=1 harvests exactly the walk's consecutive-step pairs."""
    from adopt_spark.algos.walks import random_walks, walk_cooccurrence

    edges, _ = tri6
    walks = random_walks(spark, edges, 4)
    seqs = defaultdict(dict)
    for r in walks.collect():
        seqs[r.walk_id][r.step] = r.v
    cnt = Counter()
    for wid, sv in seqs.items():
        seq = [sv[s] for s in sorted(sv)]
        for a, b in zip(seq, seq[1:]):
            cnt[tuple(sorted((a, b)))] += 1
    out = walk_cooccurrence(spark, edges, length=4, window=1,
                            topn=10_000).collect()
    assert {(r.u, r.v): r.n_cooc for r in out} == dict(cnt)
