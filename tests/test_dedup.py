"""Dedup suite: exact vs DuckDB; near-dup pipelines find planted dups."""

import duckdb
import pytest
from pyspark.sql import functions as F

from adopt_spark.functions.dedup import (
    exact_dedup, minhash_near_dup_pairs, minhash_signatures, simhash_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """Testdata documents + planted exact and near duplicates."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    base = [r for r in docs.limit(5).collect()]
    extra = []
    for i, r in enumerate(base):
        extra.append((10_000 + i, r["text"]))                      # exact dup
        words = r["text"].split()
        words[len(words) // 2] = "MUTATED"
        extra.append((20_000 + i, " ".join(words)))                # near dup
    extra_df = spark.createDataFrame(extra, "doc_id long, text string")
    return docs.unionAll(extra_df)


def test_exact_dedup_vs_duckdb(spark, docs_with_dups):
    got = exact_dedup(docs_with_dups)
    pdf = docs_with_dups.toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    exp_groups = con.execute(
        "SELECT count(*) FROM (SELECT text, min(doc_id), count(*) FROM d GROUP BY text)"
    ).fetchone()[0]
    assert got.count() == exp_groups
    # the 5 planted exact dups collapse onto the original min ids
    dup_rows = {r["doc_id"]: r["n_copies"] for r in got.where(F.col("n_copies") > 1).collect()}
    assert set(dup_rows) == {0, 1, 2, 3, 4}
    assert all(v == 2 for v in dup_rows.values())


def test_minhash_finds_planted_near_dups(spark, docs_with_dups):
    pairs = minhash_near_dup_pairs(docs_with_dups, threshold=0.5)
    rows = pairs.collect()
    got = {(r["a"], r["b"]) for r in rows}
    for i in range(5):
        assert (i, 10_000 + i) in got        # exact dup: jaccard 1.0
        assert (i, 20_000 + i) in got        # near dup: high jaccard
    # every reported jaccard is truthful: recompute exactly in python
    # (the driver testdata itself contains planted organic near-dups,
    # e.g. doc 8 ≈ doc 12, so we verify values, not absence of pairs)
    import numpy as np

    from adopt_spark.functions.dedup import _shingle_hashes

    texts = {r["doc_id"]: r["text"] for r in docs_with_dups.collect()}
    for r in rows[:20]:
        sa = _shingle_hashes(texts[r["a"]], 5)
        sb = _shingle_hashes(texts[r["b"]], 5)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        exp = inter / (sa.size + sb.size - inter)
        assert r["jaccard"] == pytest.approx(exp, abs=1e-12)
        assert r["jaccard"] >= 0.5


def test_minhash_signature_deterministic(spark, docs_with_dups):
    s1 = minhash_signatures(docs_with_dups.limit(20)).collect()
    s2 = minhash_signatures(docs_with_dups.limit(20).repartition(7)).collect()
    d1 = {r["doc_id"]: list(r["sig"]) for r in s1}
    d2 = {r["doc_id"]: list(r["sig"]) for r in s2}
    assert d1 == d2


def test_simhash_pairs_find_exact_dups(spark, docs_with_dups):
    pairs = simhash_pairs(docs_with_dups, max_hamming=3)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    for i in range(5):
        assert (i, 10_000 + i) in got        # identical text → hamming 0


def test_simhash_md5_mode_matches_bruteforce(spark, docs_with_dups):
    """md5 hash mode (the oracle-shared one): engine pairs must equal a
    direct numpy evaluation of md5-simhash + all-pairs hamming."""
    import hashlib

    import numpy as np

    d = docs_with_dups.limit(30)
    rows = {r["doc_id"]: r["text"] or "" for r in d.collect()}

    def sh(text):
        toks = text.split()
        if not toks:
            return 0
        hs = np.array([int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                       for t in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = bits.astype(np.int64).sum(axis=0) * 2 - hs.size
        word = 0
        for b in np.nonzero(votes > 0)[0]:
            word |= 1 << int(b)
        return word - (1 << 64) if word >= (1 << 63) else word

    sigs = {k: sh(t) for k, t in rows.items()}
    ids = sorted(sigs)
    expected = {(a, b, bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1"))
                for i, a in enumerate(ids) for b in ids[i + 1:]
                if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= 3}
    got = {(r["a"], r["b"], r["hamming"])
           for r in simhash_pairs(d, max_hamming=3, hash_mode="md5").collect()}
    assert got == expected


def test_simhash_rejects_unknown_hash_mode(spark, docs_with_dups):
    with pytest.raises(ValueError, match="hash_mode"):
        simhash_pairs(docs_with_dups, hash_mode="sha1").collect()


def test_near_dup_clusters_transitive_collapse(spark):
    """A~B and B~C must land in ONE cluster with min-id canonical even
    when A~C alone (j=0.52) is below threshold (0.6 < chain links 0.70/0.76); untouched docs are singletons. 32 bands of 2 rows: band-match
    prob at j=0.70 is 0.49, miss-all-bands 4e-10 -> deterministic recall."""
    from adopt_spark.functions.dedup import near_dup_clusters

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight while stars shine")
    mid = base.replace("lazy dog", "sleepy dog").replace("stars", "moons")
    far = mid.replace("quick brown", "slow gray").replace("deep", "dark")
    rows = [(0, base), (1, mid), (2, far), (7, "completely unrelated text "
            "about pyspark shuffle partitions and adaptive query execution")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["cluster"], r["is_canonical"])
           for r in near_dup_clusters(d, threshold=0.6, bands=32).collect()}
    assert out[0] == (0, True)
    assert out[1][0] == 0 and not out[1][1]
    assert out[2][0] == 0 and not out[2][1]     # chained via doc 1
    assert out[7] == (7, True)                  # singleton


def test_dedup_report_vs_hand_counts(spark):
    from adopt_spark.functions.dedup import dedup_report

    # clusters: {1,2,3} -> 1, {4} -> 4, {5,6} -> 5
    rows = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)]
    df = spark.createDataFrame(rows, "doc_id long, cluster long")
    r = dedup_report(df).collect()[0]
    assert (r.n_docs, r.n_clusters, r.n_duplicates,
            r.max_cluster_size) == (6, 3, 3, 3)
    assert r.dup_rate == 0.5


def test_prefix_jaccard_exact_vs_all_pairs(spark, docs_with_dups):
    """Prefix-filtered join == brute-force all-pairs word Jaccard."""
    from adopt_spark.functions.dedup import (
        prefix_jaccard_join, word_ngram_jaccard_all_pairs,
    )

    for t in (0.5, 0.8, 0.95):
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in prefix_jaccard_join(docs_with_dups,
                                         threshold=t).collect()
        }
        exp = {
            (r["a"], r["b"]): round(r["jaccard"], 6)
            for r in word_ngram_jaccard_all_pairs(
                docs_with_dups, n_words=1).collect()
            if round(r["jaccard"], 6) >= t
        }
        assert got == exp, f"threshold {t}: {len(got)} vs {len(exp)}"
        # planted exact dups must always surface at jaccard 1.0
        for i in range(5):
            assert got[(i, 10_000 + i)] == 1.0


def test_prefix_jaccard_rejects_bad_threshold(spark, docs_with_dups):
    from adopt_spark.functions.dedup import prefix_jaccard_join

    with pytest.raises(ValueError, match="threshold"):
        prefix_jaccard_join(docs_with_dups, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        prefix_jaccard_join(docs_with_dups, threshold=1.5)


def test_prefix_jaccard_empty_input(spark):
    from adopt_spark.functions.dedup import prefix_jaccard_join

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert prefix_jaccard_join(empty).count() == 0
