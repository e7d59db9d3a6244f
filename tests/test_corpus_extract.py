"""Corpus → extraction → vertex encoding pipeline, vs generator truth."""

from pyspark.sql import functions as F

from adopt_spark.corpus import corpus_df, generate_corpus
from adopt_spark.extract import extract_file_edges, repo_edges
from adopt_spark.vertices import build_vertex_dictionary, encode_edges


def test_extraction_matches_generator(spark):
    c = generate_corpus(n_repos=20, n_files=200, seed=42)
    df = corpus_df(spark, c)
    got = {(r["src_repo"], r["dst_repo"]) for r in repo_edges(df).collect()}
    expected = {
        (r.src_repo, r.dst_repo)
        for r in c.expected_edges.itertuples()
        if r.src_repo != r.dst_repo
    }
    assert got == expected


def test_sha256_invariant_preserved(spark):
    """Per-row content sha must survive the extraction materialization."""
    c = generate_corpus(n_repos=10, n_files=80, seed=7)
    df = corpus_df(spark, c)
    src_shas = {(r["path"], r["content_sha"]) for r in df.select("path", "content_sha").collect()}
    fe = extract_file_edges(df)
    out_shas = {(r["path"], r["content_sha"]) for r in fe.select("path", "content_sha").distinct().collect()}
    # every extracted row's sha matches the source row with the same path
    assert out_shas <= src_shas


def test_determinism_across_parallelism(spark):
    c1 = generate_corpus(seed=42)
    c2 = generate_corpus(seed=42)
    assert c1.files.equals(c2.files)
    df1 = corpus_df(spark, c1, num_partitions=2)
    df8 = corpus_df(spark, c1, num_partitions=8)
    sha1 = sorted(r[0] for r in df1.select("content_sha").collect())
    sha8 = sorted(r[0] for r in df8.select("content_sha").collect())
    assert sha1 == sha8


def test_vertex_dictionary_dense_and_sorted(spark):
    c = generate_corpus(n_repos=20, n_files=200, seed=42)
    df = corpus_df(spark, c)
    vocab = build_vertex_dictionary(df, "repo")
    rows = sorted((r["name"], r["vid"]) for r in vocab.collect())
    names = [n for n, _ in rows]
    vids = [v for _, v in rows]
    assert vids == list(range(len(rows)))          # dense 0..N-1
    assert names == sorted(names)                   # id = sorted rank
    # encoding round-trips
    e = repo_edges(df)
    enc = encode_edges(e, vocab)
    assert enc.count() == e.count()
    assert enc.where(F.col("sid") == F.col("tid")).count() == 0
