"""Entity resolution: transitive closure + canonicalization."""

from adopt_spark.functions.entity import resolve_entities


def run(spark, names, d=2):
    df = spark.createDataFrame([(n,) for n in names], "w string")
    return {r["name"]: r["canonical"]
            for r in resolve_entities(df, "w", d).collect()}


def test_transitive_chain_clusters_to_min(spark):
    # abcd ~ abce ~ abcef chain: ends are distance 2 apart only via
    # the middle — the cluster must still collapse to one canonical
    got = run(spark, ["abcd", "abce", "abcef", "zzz", "abcd"])
    assert got == {"abcd": "abcd", "abce": "abcd", "abcef": "abcd",
                   "zzz": "zzz"}


def test_far_apart_names_stay_separate(spark):
    got = run(spark, ["aaaaaa", "bbbbbb", "cccccc"], d=1)
    assert got == {"aaaaaa": "aaaaaa", "bbbbbb": "bbbbbb",
                   "cccccc": "cccccc"}


def test_canonical_is_lexicographic_min(spark):
    got = run(spark, ["zebra", "zebrb", "zebrc"], d=1)
    assert set(got.values()) == {"zebra"}
