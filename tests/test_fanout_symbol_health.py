"""Session-22 operators: GNN neighbor-fanout sampling and cross-slice
symbol health — python differentials independent of the SQL twins
(which the contract gate exercises)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

MIX_A1, MIX_A2, MIX_A3, MIX_B, MIX_M = (
    2_654_435_761, 40_503, 2_246_822_519, 104_729, 2_147_483_647)


def _py_fanout(pairs, fanouts, seed_mod):
    """Independent python replica of the layer-wise sampler."""
    e = sorted({(a, b) for a, b in pairs if a != b})
    adj = defaultdict(list)
    verts = set()
    for a, b in e:
        adj[a].append(b)
        verts.update((a, b))
    frontier = sorted(v for v in verts if v % seed_mod == 0)
    out = []
    for h, f in enumerate(fanouts, start=1):
        nxt = set()
        for src in frontier:
            ranked = sorted(
                adj.get(src, ()),
                key=lambda d: ((MIX_A1 * src + MIX_A2 * h + MIX_A3 * d
                                + MIX_B) % MIX_M, d))
            for dst in ranked[:f]:
                out.append((h, src, dst))
                nxt.add(dst)
        frontier = sorted(nxt)
    return sorted(out)


def test_fanout_matches_python(spark, tri6):
    from adopt_spark.functions.sampling import neighbor_fanout_sample

    edges, pairs = tri6
    got = sorted((r.hop, r.src, r.dst)
                 for r in neighbor_fanout_sample(edges, (2, 1),
                                                 seed_mod=2).collect())
    assert got == _py_fanout(pairs, (2, 1), 2)
    assert len(got) > 0


def test_fanout_respects_fanout_cap(spark, two_components):
    from adopt_spark.functions.sampling import neighbor_fanout_sample

    edges, pairs = two_components
    out = neighbor_fanout_sample(edges, (3, 2), seed_mod=10).collect()
    per = Counter((r.hop, r.src) for r in out)
    for (h, _), n in per.items():
        assert n <= (3 if h == 1 else 2)
    # sampled edges are real edges
    es = {(a, b) for a, b in pairs}
    assert all((r.src, r.dst) in es for r in out)
    assert sorted((r.hop, r.src, r.dst) for r in out) == \
        _py_fanout(pairs, (3, 2), 10)


def test_fanout_big_fanout_is_full_frontier_expansion(spark, tri6):
    """fanout >= max degree keeps every out-edge of the frontier."""
    from adopt_spark.functions.sampling import neighbor_fanout_sample

    edges, pairs = tri6
    out = neighbor_fanout_sample(edges, (100,), seed_mod=1).collect()
    assert {(r.src, r.dst) for r in out} == \
        {(a, b) for a, b in pairs if a != b}


def test_fanout_validation(spark, tri6):
    import pytest

    from adopt_spark.functions.sampling import neighbor_fanout_sample

    edges, _ = tri6
    with pytest.raises(ValueError):
        neighbor_fanout_sample(edges, ())
    with pytest.raises(ValueError):
        neighbor_fanout_sample(edges, (2, 0))
    with pytest.raises(ValueError):
        neighbor_fanout_sample(edges, (2,), seed_mod=0)


# ------------------------------------------------------ symbol health


def test_symbol_health_matches_python(spark):
    from adopt_spark.functions.callgraph import symbol_health

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    pdf = docs.select("doc_id", "text").toPandas()
    NSYM = 97
    n_defs, n_calls = Counter(), Counter()
    for d, t in zip(pdf.doc_id, pdf.text):
        d = int(d)
        content = t + f"\ndef sym_{d % NSYM}(x):"
        for j in (1, 2, 3):
            if d % 3 >= j - 1:
                content += f"\ncall sym_{(d * 7 + 13 * j) % NSYM}()"
        if d < 50:
            for m in re.finditer(r"def (sym_\d+)\(", content):
                n_defs[m.group(1)] += 1
        if d < 30:
            for m in re.finditer(r"call (sym_\d+)\(", content):
                n_calls[m.group(1)] += 1
    want = {}
    for s in set(n_defs) | set(n_calls):
        status = ("unresolved" if s not in n_defs
                  else "dead" if s not in n_calls else "ok")
        want[s] = (n_defs.get(s, 0), n_calls.get(s, 0), status)

    got = {r.symbol: (r.n_defs, r.n_calls, r.status)
           for r in symbol_health(docs).collect()}
    assert got == want
    statuses = {v[2] for v in got.values()}
    assert statuses == {"ok", "dead", "unresolved"}


def test_symbol_health_full_slices_have_no_gaps(spark):
    """With both slices = the whole corpus every symbol resolves."""
    from adopt_spark.functions.callgraph import symbol_health

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    big = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    out = symbol_health(docs, def_docs_below=big,
                        call_docs_below=big).collect()
    assert all(r.status == "ok" for r in out)
