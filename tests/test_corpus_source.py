"""The synth_corpus custom Data Source: parity with the driver-side
generator, partitioned executor reads, option plumbing
(round-3 session-20)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adopt_spark.corpus import corpus_df, generate_corpus
from adopt_spark.sources.corpus_source import register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("synth_corpus")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_source_matches_driver_side_generator(spark):
    df = _read(spark, n_repos=12, n_files=150, seed=7, partitions=3)
    via_source = df.withColumn("content_sha", F.sha2("content", 256))
    want = corpus_df(spark, generate_corpus(n_repos=12, n_files=150,
                                            seed=7))
    a = sorted(map(tuple, via_source.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b  # byte-identical rows INCLUDING sha256(content)


def test_source_partition_count_and_coverage(spark):
    df = _read(spark, n_files=100, partitions=5)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100
    # every partition non-empty and slices are disjoint by path
    per = (df.groupBy(F.spark_partition_id().alias("p"))
           .agg(F.count(F.lit(1)).alias("n")).collect())
    assert len(per) == 5 and all(r.n == 20 for r in per)
    assert df.select("path").distinct().count() == 100


def test_source_is_parallelism_invariant(spark):
    one = _read(spark, n_files=80, partitions=1)
    many = _read(spark, n_files=80, partitions=8)
    sha = lambda d: sorted(  # noqa: E731
        r[0] for r in d.select(F.sha2("content", 256)).collect())
    assert sha(one) == sha(many)


def test_source_feeds_the_flagship_pipeline(spark):
    # the connector slots directly into extract -> edges
    from adopt_spark.extract import repo_edges

    df = _read(spark, n_repos=12, n_files=150, seed=7, partitions=4) \
        .withColumn("content_sha", F.sha2("content", 256))
    got = {(r.src_repo, r.dst_repo) for r in repo_edges(df).collect()}
    want = {tuple(t) for t in generate_corpus(
        n_repos=12, n_files=150, seed=7)
        .expected_edges.itertuples(index=False)}
    assert got == want


def test_source_rejects_bad_partitions(spark):
    with pytest.raises(Exception):
        _read(spark, partitions=0).count()
