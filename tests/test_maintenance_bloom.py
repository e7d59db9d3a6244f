"""Differential + property tests: maintenance planners, Bloom semi
join, BM25 retrieval (round-3 session-5 batch)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from adopt_spark.functions.bloomjoin import (
    bloom_bitset, bloom_prune, bloom_semi_join,
)
from adopt_spark.functions.maintenance import compaction_plan, partition_skew


def _files(spark, rows):
    return spark.createDataFrame(
        rows, "part string, file_id long, bytes long")


def test_compaction_plan_properties(spark):
    rows = [("a", i, 100 + 37 * (i % 7)) for i in range(40)]
    rows += [("b", i, 5000) for i in range(3)]       # each file > target
    rows += [("c", 0, 10)]                            # single tiny file
    df = _files(spark, rows)
    plan = compaction_plan(df, "part", "file_id", "bytes", 1000).collect()

    # byte mass and file count are preserved exactly
    assert sum(r.bin_bytes for r in plan) == sum(b for _, _, b in rows)
    assert sum(r.n_files for r in plan) == len(rows)

    # bins are contiguous, non-overlapping file ranges per partition
    by_part: dict[str, list] = {}
    for r in plan:
        by_part.setdefault(r.part, []).append(r)
    for part, bins in by_part.items():
        bins.sort(key=lambda r: r.bin)
        for prev, nxt in zip(bins, bins[1:]):
            assert prev.last_file < nxt.first_file

    # every oversized file sits alone in its own bin
    assert all(r.n_files == 1 for r in plan if r.part == "b")
    # a partition smaller than the target compacts to one bin
    assert [r.n_files for r in plan if r.part == "c"] == [1]


def test_compaction_plan_partition_invariance(spark):
    rows = [("p%d" % (i % 3), i, 50 + i) for i in range(60)]
    df = _files(spark, rows)
    a = sorted(map(tuple, compaction_plan(
        df.repartition(1), "part", "file_id", "bytes", 500).collect()))
    b = sorted(map(tuple, compaction_plan(
        df.repartition(7), "part", "file_id", "bytes", 500).collect()))
    assert a == b


def test_compaction_plan_empty(spark):
    df = _files(spark, [])
    assert compaction_plan(df, "part", "file_id", "bytes", 100).count() == 0


def test_partition_skew_report(spark):
    df = spark.createDataFrame([(i % 50,) for i in range(1000)], "k long")
    rep = partition_skew(df, "k", num_partitions=8).collect()
    assert sum(r.n_rows for r in rep) == 1000
    assert sum(r.n_keys for r in rep) == 50
    # load factors average to 1 over the P buckets that appear
    # (empty buckets are absent; with 50 keys into 8 buckets all appear)
    assert len(rep) == 8
    total_lf = sum(r.load_factor for r in rep)
    assert math.isclose(total_lf, 8.0, abs_tol=1e-4)
    # a single hot key -> one bucket holds everything
    hot = spark.createDataFrame([(7,)] * 100, "k long")
    hot_rep = partition_skew(hot, "k", num_partitions=8).collect()
    assert len(hot_rep) == 1 and hot_rep[0].load_factor == 8.0


def test_bloom_no_false_negatives_and_prunes(spark):
    members = spark.createDataFrame(
        [(i * 13 + 1,) for i in range(500)], "k long")
    bitset = bloom_bitset(members, "k")
    # every member passes
    kept = bloom_prune(members, "k", bitset)
    assert kept.count() == 500
    # non-members are mostly pruned (fp rate well under 20% at this fill)
    non = spark.createDataFrame(
        [(1_000_000 + i,) for i in range(2000)], "k long")
    survivors = bloom_prune(non, "k", bitset).count()
    assert survivors < 400


def test_bloom_semi_join_matches_exact(spark):
    big = spark.createDataFrame(
        [(i % 700, i) for i in range(5000)], "k long, v long")
    small = spark.createDataFrame(
        [(i * 3,) for i in range(100)], "k long")
    got = sorted(map(tuple, bloom_semi_join(big, "k", small, "k").collect()))
    want = sorted(map(tuple, big.join(
        small.withColumnRenamed("k", "sk"),
        big.k == F.col("sk"), "left_semi").collect()))
    assert got == want and len(got) > 0


def test_bloom_rejects_bad_m_bits(spark):
    small = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        bloom_bitset(small, "k", m_bits=100)


def _bm25_python(docs, queries, k=5):
    """Pure-python BM25 twin on the same lattice/tie conventions."""
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    df: dict[str, int] = {}
    for terms in toks.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    out = []
    for qid, qtext in queries:
        scores = {}
        for d, terms in toks.items():
            sm = 0
            for t in set(qtext.lower().split()):
                tf = terms.count(t)
                if not tf:
                    continue
                idf = round(math.log(1.0 + (n - df[t] + 0.5)
                                     / (df[t] + 0.5)), 6)
                ratio = float(len(terms) * n) / float(total)
                den = float(tf) + 1.2 * (0.25 + 0.75 * ratio)
                sm += int(math.floor(idf * (tf * 2.2 / den) * 1e6 + 0.5))
            if sm:
                scores[d] = sm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rn, (d, sm) in enumerate(ranked, 1):
            out.append((qid, d, round(sm / 1e6, 6), rn))
    return sorted(out)


def test_bm25_differential(spark):
    from adopt_spark.functions.text import bm25_topk

    docs = [
        (0, "hash join hash join table"),
        (1, "sort merge join window"),
        (2, "hash table scan scan scan"),
        (3, "window agg window agg window"),
        (4, "the quick brown fox"),
        (5, "join join join join join"),
    ]
    queries = [(1, "hash join"), (2, "window agg")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple, bm25_topk(ddf, queries, k=5).collect()))
    assert got == _bm25_python(docs, queries, k=5)


# ---- round-3 session-11: incremental MV merge + file skipping ----

from adopt_spark.functions.maintenance import (  # noqa: E402
    file_skipping_stats, mv_merge,
)


def _facts(spark, n=200, seed=7):
    rows = []
    x = seed
    for i in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        rows.append(("g%d" % (x % 4), "s%d" % (x % 2),
                     1 + x % 50, 10.0 + (x % 997) / 7.0, i))
    return spark.createDataFrame(
        rows, "k1 string, k2 string, qty long, price double, rid long")


def test_mv_merge_equals_full_recompute(spark):
    df = _facts(spark)
    base = df.where(F.col("rid") < 120)
    delta = df.where(F.col("rid") >= 120)
    merged = {tuple(r)[:2]: tuple(r)[2:] for r in
              mv_merge(base, delta, ["k1", "k2"], "qty", "price").collect()}
    full = {tuple(r)[:2]: tuple(r)[2:] for r in
            mv_merge(df, df.limit(0), ["k1", "k2"], "qty", "price").collect()}
    assert merged.keys() == full.keys()
    for k in merged:
        for a, b in zip(merged[k], full[k]):
            assert a == pytest.approx(b, abs=1e-9)


def test_mv_merge_empty_delta_and_disjoint_groups(spark):
    df = _facts(spark, n=80)
    base = df.where(F.col("k1") == "g0")
    delta = df.where(F.col("k1") == "g1")
    out = mv_merge(base, delta, ["k1"], "qty", "price").collect()
    # disjoint groups pass through each side's state unchanged
    want = {r.k1: (r.n_rows, r.sum_qty) for r in
            mv_merge(df.where(F.col("k1").isin("g0", "g1")), df.limit(0),
                     ["k1"], "qty", "price").collect()}
    got = {r.k1: (r.n_rows, r.sum_qty) for r in out}
    assert got == want


def test_file_skipping_clustered_beats_unclustered(spark):
    # pred_col monotone in rid -> clustered layout packs matches into
    # few files; unclustered layout follows a scrambled ingest order.
    rows = [("p", (i * 7919) % 10007, "%05d" % i) for i in range(3000)]
    df = spark.createDataFrame(rows, "part string, rid long, d string")
    out = {r.layout: r for r in file_skipping_stats(
        df, "part", "rid", "d", "00100", "00399",
        rows_per_file=100).collect()}
    c, u = out["clustered"], out["unclustered"]
    # exact match count on both layouts; clustered scans fewer rows
    assert c.rows_matched == u.rows_matched == 300
    assert c.n_files == u.n_files == 30
    assert c.files_skipped > u.files_skipped
    assert c.rows_scanned <= u.rows_scanned
    # clustered layout reads exactly ceil(300/100)=3 files, 0 false pos
    assert c.files_read == 3 and c.files_false_positive == 0
    # invariants: read+skipped = files; scanned >= matched
    for r in (c, u):
        assert r.files_read + r.files_skipped == r.n_files
        assert r.rows_scanned >= r.rows_matched
