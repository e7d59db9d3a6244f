"""CTDNE temporal walks: python replica differential + the
time-respecting law."""

from __future__ import annotations

from collections import defaultdict

MIX_A1, MIX_A2, MIX_A3, MIX_B, MIX_M = (
    2_654_435_761, 40_503, 2_246_822_519, 104_729, 2_147_483_647)


def _mix(wid, step, cur):
    return (MIX_A1 * wid + MIX_A2 * step + MIX_A3 * cur + MIX_B) % MIX_M


def _py_temporal(contacts, length):
    adj = defaultdict(list)
    for u, v, t in sorted({(u, v, t) for u, v, t in contacts if u != v}):
        adj[u].append((t, v))
    for u in adj:
        adj[u].sort()
    out = []
    for start in sorted(adj):
        cur, tcur = start, min(t for t, _ in adj[start])
        out.append((start, 0, cur, tcur))
        for step in range(1, length + 1):
            cand = [(t, v) for t, v in adj.get(cur, ()) if t >= tcur]
            if not cand:
                break
            t, v = cand[_mix(start, step, cur) % len(cand)]
            out.append((start, step, v, t))
            cur, tcur = v, t
    return sorted(out)


def _contact_df(spark, contacts):
    return spark.createDataFrame(
        [(int(u), int(v), int(t)) for u, v, t in contacts],
        "u long, v long, t long")


CONTACTS = [
    # a small time-stamped interaction mesh incl. same-(u,v) repeats
    (1, 2, 10), (2, 1, 10), (2, 3, 20), (3, 2, 20), (3, 4, 15),
    (4, 3, 15), (1, 3, 30), (3, 1, 30), (2, 4, 25), (4, 2, 25),
    (4, 5, 40), (5, 4, 40), (1, 2, 35), (2, 1, 35), (5, 1, 5),
    (1, 5, 5),
]


def test_temporal_walks_match_python(spark):
    from adopt_spark.algos.walks import temporal_walks

    got = sorted((r.walk_id, r.step, r.v, r.t)
                 for r in temporal_walks(
                     spark, _contact_df(spark, CONTACTS), 5).collect())
    assert got == _py_temporal(CONTACTS, 5)
    assert len(got) > len(set(c[0] for c in CONTACTS))  # walks advanced


def test_temporal_walks_are_time_respecting(spark):
    from adopt_spark.algos.walks import temporal_walks

    out = temporal_walks(spark, _contact_df(spark, CONTACTS), 6).collect()
    seqs = defaultdict(dict)
    for r in out:
        seqs[r.walk_id][r.step] = (r.v, r.t)
    contacts = {(u, v, t) for u, v, t in CONTACTS}
    for wid, sv in seqs.items():
        steps = [sv[s] for s in sorted(sv)]
        for (pu, pt), (cu, ct) in zip(steps, steps[1:]):
            assert ct >= pt                       # non-decreasing time
            assert (pu, cu, ct) in contacts       # real contact used


def test_temporal_walks_dead_end_truncates(spark):
    from adopt_spark.algos.walks import temporal_walks

    # 1 -(t=10)-> 2, and 2's only outgoing contact is in the PAST
    contacts = [(1, 2, 10), (2, 3, 5)]
    out = sorted((r.walk_id, r.step, r.v, r.t)
                 for r in temporal_walks(
                     spark, _contact_df(spark, contacts), 4).collect())
    # walk 1: step0 (1,10) -> step1 (2,10), then stuck (t=5 < 10)
    assert [x for x in out if x[0] == 1] == [(1, 0, 1, 10), (1, 1, 2, 10)]
    # walk 2: step0 (2,5) -> step1 (3,5), 3 has no contacts at all
    assert [x for x in out if x[0] == 2] == [(2, 0, 2, 5), (2, 1, 3, 5)]
