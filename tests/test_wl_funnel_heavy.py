"""WL refinement, funnel, and heavy hitters vs pure-python twins."""

import datetime

import numpy as np
import pytest

from adopt_spark.algos.wl import WL_A, WL_B, WL_M, WL_P, wl_colors
from adopt_spark.functions.funnel import funnel
from adopt_spark.functions.heavy import heavy_hitters
from tests.conftest import edge_df


# ------------------------------------------------------------------- WL

def python_wl(pairs, rounds=3):
    nbr = {}
    for a, b in pairs:
        if a == b:
            continue
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    color = {v: len(us) for v, us in nbr.items()}
    for _ in range(rounds):
        nxt = {}
        for v in color:
            h = (color[v] * WL_A + WL_B) % WL_P
            for c in sorted(color[u] for u in nbr[v]):
                h = (h * WL_M + c) % WL_P
            nxt[v] = h
        color = nxt
    return color


def test_wl_matches_python_twin(spark, tri6):
    edges, pairs = tri6
    got = {r["v"]: r["wl_color"] for r in wl_colors(edges).collect()}
    assert got == python_wl(pairs)


def test_wl_distinguishes_structure(spark):
    # path P4 (0-1-2-3) + isolated triangle (10,11,12): the two path
    # ends must share a color, the two path middles must share one,
    # the triangle is color-uniform, and path/triangle never collide
    pairs = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (10, 12)]
    got = {r["v"]: r["wl_color"] for r in wl_colors(edge_df(spark, pairs)).collect()}
    assert got == python_wl(pairs)
    assert got[0] == got[3] and got[1] == got[2] and got[0] != got[1]
    assert got[10] == got[11] == got[12]
    assert got[10] not in {got[0], got[1]}


def test_wl_random_graph_partition_invariant(spark):
    rng = np.random.default_rng(5)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 60, (300, 2))
                    if a != b})
    df = edge_df(spark, pairs)
    got = {r["v"]: r["wl_color"]
           for r in wl_colors(df.repartition(13)).collect()}
    assert got == python_wl(pairs)


# --------------------------------------------------------------- funnel

def _ev(spark, rows):
    # rows: (user, minutes_offset, type)
    base = datetime.datetime(2024, 1, 1)
    data = [(int(u), base + datetime.timedelta(minutes=int(m)), t)
            for u, m, t in rows]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string")


def test_funnel_ordering_and_window(spark):
    rows = [
        (1, 0, "a"), (1, 5, "b"), (1, 9, "c"),       # completes
        (2, 0, "b"), (2, 5, "a"), (2, 9, "c"),       # b before a: stops at b
        (3, 0, "a"), (3, 5, "b"),                    # no c
        (4, 0, "a"), (4, 5, "b"), (4, 70, "c"),      # c outside 1h window
        (5, 0, "a"), (5, 0, "b"),                    # b not strictly after a
    ]
    out = {r["step"]: r["users"]
           for r in funnel(_ev(spark, rows), ["a", "b", "c"],
                           within="1 HOUR").collect()}
    assert out == {"a": 5, "b": 3, "c": 1}


def test_funnel_anchor_is_first_step0(spark):
    # second 'a' at t=50 would admit the t=70 'c' into a 1h window,
    # but the contract anchors at the FIRST 'a' (t=0) — c is out
    rows = [(1, 0, "a"), (1, 50, "a"), (1, 55, "b"), (1, 70, "c")]
    out = {r["step"]: r["users"]
           for r in funnel(_ev(spark, rows), ["a", "b", "c"],
                           within="1 HOUR").collect()}
    assert out == {"a": 1, "b": 1, "c": 0}


def test_funnel_no_window(spark):
    rows = [(1, 0, "a"), (1, 100000, "b")]
    out = {r["step"]: r["users"]
           for r in funnel(_ev(spark, rows), ["a", "b"]).collect()}
    assert out == {"a": 1, "b": 1}
    with pytest.raises(ValueError):
        funnel(_ev(spark, rows), ["a"])


# -------------------------------------------------------- heavy hitters

def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_heavy_hitters_exact_on_skew(spark):
    # 400 distinct rare words force MG decrements at k=16; the two
    # frequent words must still come out with EXACT counts
    rng = np.random.default_rng(3)
    words = (["hot"] * 500 + ["warm"] * 300
             + [f"rare{i}" for i in rng.integers(0, 400, 700)])
    rng.shuffle(words)
    texts = [" ".join(words[i:i + 25]) for i in range(0, len(words), 25)]
    n = len(words)
    df = _docs(spark, texts).repartition(9)
    got = {(r["w"], r["cnt"])
           for r in heavy_hitters(df, p=1, q=10, k=16).collect()}
    exp = {(w, c) for w, c in
           zip(*np.unique(words, return_counts=True)) if c * 10 >= n}
    assert got == {(w, int(c)) for w, c in exp}
    assert ("hot", 500) in got


def test_heavy_hitters_guarantee_guard(spark):
    df = _docs(spark, ["x y z"])
    with pytest.raises(ValueError):
        heavy_hitters(df, p=1, q=100, k=16)   # 1/100 < 1/16


def test_heavy_hitters_tokenization(spark):
    # mixed whitespace + case folding, exactly like functions/text.py
    df = _docs(spark, ["Foo\tfoo  FOO", "bar foo"])
    got = {(r["w"], r["cnt"])
           for r in heavy_hitters(df, p=1, q=2, k=8).collect()}
    assert got == {("foo", 4)}
