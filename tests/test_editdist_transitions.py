"""PassJoin edit-distance join + Markov transitions vs python twins."""

import collections

import numpy as np
import pytest

from adopt_spark.functions.editdist import edit_distance_join
from adopt_spark.functions.transitions import event_transitions


def lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def brute_pairs(words, d):
    dic = sorted(set(words))
    out = set()
    for i, a in enumerate(dic):
        for b in dic[i + 1:]:
            dd = lev(a, b)
            if 1 <= dd <= d:
                out.add((a, b, dd))
    return out


def run_case(spark, words, d, n_parts):
    df = spark.createDataFrame([(w,) for w in words], "w string") \
        .repartition(n_parts)
    got = {(r["na"], r["nb"], r["dist"])
           for r in edit_distance_join(df, "w", d).collect()}
    assert got == brute_pairs(words, d)


def test_edit_join_substitutions_insertions_deletions(spark):
    # deliberate ins/del/sub neighborhoods around seed words
    seeds = ["ribbon", "carbon", "rib", "bonnet", "cabin"]
    words = list(seeds)
    for s in seeds:
        words.append(s[1:])            # deletion at front (shifts all)
        words.append(s + "x")          # insertion at end
        words.append("q" + s)          # insertion at front
        words.append(s[:2] + "z" + s[3:] if len(s) > 3 else s)
    run_case(spark, words, 2, n_parts=1)
    run_case(spark, words, 2, n_parts=7)


def test_edit_join_random_small_alphabet(spark):
    rng = np.random.default_rng(13)
    words = ["".join(rng.choice(list("ab"), rng.integers(3, 8)))
             for _ in range(150)]
    run_case(spark, words, 1, n_parts=5)
    run_case(spark, words, 2, n_parts=5)


def test_edit_join_validates_max_dist(spark):
    df = spark.createDataFrame([("x",)], "w string")
    with pytest.raises(ValueError):
        edit_distance_join(df, "w", 0)


def test_transitions_hand_case(spark):
    # user 1: a->b->b->c ; user 2: a->c ; ties broken by event_id
    rows = [
        (1, 1, 10.0, "a"), (2, 1, 20.0, "b"),
        (3, 1, 20.0, "b"), (4, 1, 30.0, "c"),
        (5, 2, 10.0, "a"), (6, 2, 15.0, "c"),
    ]
    df = spark.createDataFrame(
        [(i, u, float(t), e) for i, u, t, e in rows],
        "event_id long, user_id long, ts double, event_type string")
    got = {(r["src"], r["dst"]): (r["n"], r["p"])
           for r in event_transitions(df).collect()}
    assert got == {
        ("a", "b"): (1, 0.5), ("a", "c"): (1, 0.5),
        ("b", "b"): (1, 0.5), ("b", "c"): (1, 0.5),
    }


def test_transitions_partition_invariant(spark):
    rng = np.random.default_rng(7)
    rows = [(i, int(rng.integers(0, 10)), float(rng.integers(0, 1000)),
             str(rng.choice(list("xyz"))))
            for i in range(400)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts double, event_type string")
    a = sorted(map(tuple, event_transitions(df.repartition(1)).collect()))
    b = sorted(map(tuple, event_transitions(df.repartition(11)).collect()))
    assert a == b
    # per-src probabilities sum to ~1
    sums = collections.defaultdict(float)
    for src, _dst, _n, p in a:
        sums[src] += p
    assert all(abs(v - 1.0) < 1e-5 for v in sums.values())
