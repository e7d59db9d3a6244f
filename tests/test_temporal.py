"""Temporal reachability vs a pure-python earliest-arrival twin."""

import numpy as np

from adopt_spark.algos.temporal import (hourly_contacts,
                                        temporal_reachability)


def py_earliest_arrival(contacts, seed, rounds=50):
    """contacts: iterable of (u, v, t) directed; returns {v: arrival}."""
    arr = {seed: 0}
    for _ in range(rounds):
        new = dict(arr)
        for u, v, t in contacts:
            if u in arr and t >= arr[u]:
                if v not in new or t < new[v]:
                    new[v] = t
        if new == arr:
            break
        arr = new
    return arr


def _contact_df(spark, triples):
    return spark.createDataFrame(
        [(int(u), int(v), int(t)) for u, v, t in triples],
        "u long, v long, t long")


def sym(triples):
    out = set()
    for u, v, t in triples:
        out.add((u, v, t))
        out.add((v, u, t))
    return sorted(out)


def test_time_respecting_vs_static(spark):
    """u→w at t=5, w→v at t=3: statically connected, temporally NOT."""
    contacts = [(0, 1, 5), (1, 2, 3)]
    arr, _ = temporal_reachability(spark, _contact_df(spark, contacts), 0)
    got = {r["v"]: r["arrival"] for r in arr.collect()}
    assert got == {0: 0, 1: 5}
    # reversed times: now the 2-hop path is time-respecting
    contacts = [(0, 1, 3), (1, 2, 5)]
    arr, _ = temporal_reachability(spark, _contact_df(spark, contacts), 0)
    got = {r["v"]: r["arrival"] for r in arr.collect()}
    assert got == {0: 0, 1: 3, 2: 5}


def test_equal_time_hop_allowed(spark):
    """t >= arr(u): a same-hour relay is a valid temporal path."""
    contacts = [(0, 1, 4), (1, 2, 4)]
    arr, _ = temporal_reachability(spark, _contact_df(spark, contacts), 0)
    got = {r["v"]: r["arrival"] for r in arr.collect()}
    assert got == {0: 0, 1: 4, 2: 4}


def test_random_differential(spark):
    rng = np.random.default_rng(11)
    triples = sym({(int(a), int(b), int(t))
                   for a, b, t in zip(rng.integers(0, 30, 200),
                                      rng.integers(0, 30, 200),
                                      rng.integers(1, 40, 200))
                   if a != b})
    arr, metrics = temporal_reachability(
        spark, _contact_df(spark, triples), 0, rounds=40)
    got = {r["v"]: r["arrival"] for r in arr.collect()}
    assert got == py_earliest_arrival(triples, 0)
    assert metrics[-1]["changed"] == 0  # fixpoint reached within budget


def test_hourly_contacts_symmetric_and_bucketed(spark):
    import datetime as dt
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 5), 100, "click"),
        (2, dt.datetime(2024, 1, 1, 10, 55), 200, "click"),
        (3, dt.datetime(2024, 1, 1, 11, 5), 200, "click"),   # next hour
        (4, dt.datetime(2024, 1, 1, 10, 30), 300, "view"),   # other type
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r["u"], r["v"], r["t"]) for r in hourly_contacts(ev).collect()}
    h = int(dt.datetime(2024, 1, 1, 10, 0,
                        tzinfo=dt.timezone.utc).timestamp() // 3600)
    assert got == {(100, 200, h), (200, 100, h)}


def test_seed_only_when_isolated(spark):
    contacts = [(5, 6, 2)]
    arr, _ = temporal_reachability(spark, _contact_df(spark, contacts), 99)
    assert {tuple(r) for r in arr.collect()} == {(99, 0)}


def test_temporal_triangles_vs_python_twin(spark):
    import itertools

    import numpy as np

    from adopt_spark.algos.temporal import temporal_triangles

    rng = np.random.default_rng(11)
    contacts = set()
    while len(contacts) < 120:
        u, v = rng.integers(0, 15, size=2)
        if u != v:
            t = int(rng.integers(0, 50))
            contacts.add((int(u), int(v), t))
            contacts.add((int(v), int(u), t))  # symmetric, like hourly
    rows = sorted(contacts)
    cdf = spark.createDataFrame(rows, "u long, v long, t long")
    got = {r.delta: r.n_triangles
           for r in temporal_triangles(spark, cdf,
                                       deltas=(5, 20, 100)).collect()}

    cset = set(rows)
    want = {5: 0, 20: 0, 100: 0}
    for (a, b, t1), (b2, c, t2) in itertools.product(rows, rows):
        if b2 != b or t2 <= t1 or c == a:
            continue
        for (c3, a3, t3) in rows:
            if c3 == c and a3 == a and t3 > t2:
                span = t3 - t1
                for d in want:
                    if span <= d:
                        want[d] += 1
    assert got == want


def test_temporal_triangles_strict_time_and_direction(spark):
    from adopt_spark.algos.temporal import temporal_triangles

    def sym(tris):
        out = []
        for u, v, t in tris:
            out += [(u, v, t), (v, u, t)]
        return out

    # distinct increasing times within delta -> exactly one triangle
    one = spark.createDataFrame(sym([(1, 2, 10), (2, 3, 11), (3, 1, 12)]),
                                "u long, v long, t long")
    got = {r.delta: r.n_triangles
           for r in temporal_triangles(spark, one, deltas=(2, 24)).collect()}
    assert got == {2: 1, 24: 1}
    # equal times never count (strict <)
    eq = spark.createDataFrame(sym([(1, 2, 10), (2, 3, 10), (3, 1, 12)]),
                               "u long, v long, t long")
    got = {r.delta: r.n_triangles
           for r in temporal_triangles(spark, eq, deltas=(24,)).collect()}
    assert got == {24: 0}
    # span beyond delta filtered
    far = spark.createDataFrame(sym([(1, 2, 0), (2, 3, 5), (3, 1, 40)]),
                                "u long, v long, t long")
    got = {r.delta: r.n_triangles
           for r in temporal_triangles(spark, far, deltas=(24, 72)).collect()}
    assert got == {24: 0, 72: 1}


def test_decayed_contact_weights_law(spark):
    from adopt_spark.algos.temporal import decayed_contact_weights

    # (u, v) touched at hours 10 (head) and 8: w = 1/1 + 1/3
    contacts = spark.createDataFrame(
        [(1, 2, 10), (1, 2, 8), (2, 1, 10), (3, 1, 5)],
        "u long, v long, t long")
    got = {(r.sid, r.tid): r.w
           for r in decayed_contact_weights(contacts).collect()}
    assert got[(1, 2)] == round(1 / 1 + 1 / 3, 6)
    assert got[(2, 1)] == 1.0
    assert got[(3, 1)] == round(1 / 6, 6)
    # fresher contact -> strictly larger weight
    assert got[(2, 1)] > got[(3, 1)]
