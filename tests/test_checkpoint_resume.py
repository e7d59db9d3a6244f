"""Resumable-checkpoint equivalence: stop after superstep k, resume,
final results identical to an uninterrupted run (north rule)."""

import os

import pytest

from adopt_spark.algos.cc import connected_components
from adopt_spark.algos.pagerank import pagerank
from adopt_spark.checkpoint import CheckpointManager


def ranks_dict(df):
    return {r["v"]: r["rank"] for r in df.collect()}


def test_pagerank_resume_equivalence(spark, powerlaw_small, tmp_path):
    df, _ = powerlaw_small
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "partial")

    full, full_metrics = pagerank(spark, df, tol=1e-8, max_iter=100,
                                  checkpoint_dir=full_dir)
    # interrupted run: stop after 3 supersteps
    pagerank(spark, df, tol=1e-8, max_iter=3, checkpoint_dir=part_dir)
    cm = CheckpointManager(part_dir)
    assert cm.latest() == 2
    # resume to convergence
    resumed, resumed_metrics = pagerank(spark, df, tol=1e-8, max_iter=100,
                                        checkpoint_dir=part_dir, resume=True)
    assert resumed_metrics[0]["iteration"] == 3
    a, b = ranks_dict(full), ranks_dict(resumed)
    assert set(a) == set(b)
    for v in a:
        assert b[v] == pytest.approx(a[v], abs=1e-12)


def test_checkpoint_metrics_and_lineage(spark, tri6, tmp_path):
    df, _ = tri6
    ckpt = str(tmp_path / "pr")
    _, metrics = pagerank(spark, df, tol=1e-8, max_iter=50, checkpoint_dir=ckpt)
    cm = CheckpointManager(ckpt)
    disk = cm.load_metrics()
    assert len(disk) == len(metrics)
    for rec in disk:
        assert "partitions" in rec and rec["rows"] > 0
        assert "l1_delta" in rec and "edges_per_sec" in rec
    # gc keeps only the last few snapshots
    assert len(cm.completed_iterations()) <= cm.keep_last
    assert os.path.exists(os.path.join(ckpt, "metrics.jsonl"))


def test_cc_resume_equivalence(spark, two_components, tmp_path):
    df, _ = two_components
    base, _ = connected_components(spark, df)
    part_dir = str(tmp_path / "cc")
    connected_components(spark, df, max_iter=1, checkpoint_dir=part_dir)
    resumed, _ = connected_components(spark, df, checkpoint_dir=part_dir, resume=True)
    a = {r["v"]: r["component"] for r in base.collect()}
    b = {r["v"]: r["component"] for r in resumed.collect()}
    assert a == b


def test_eigen_resume_equivalence(spark, powerlaw_small, tmp_path):
    """Interrupt eigenvector centrality after 3 of 10 supersteps and
    resume: the resumed run must match the uninterrupted one exactly
    (the normalized state vector is the checkpointed unit, so resume
    replays supersteps 4..10 from the snapshot)."""
    from adopt_spark.algos.eigen import eigenvector_centrality

    df, _ = powerlaw_small
    full, _ = eigenvector_centrality(spark, df, max_iter=10)
    ckpt = str(tmp_path / "eig")
    eigenvector_centrality(spark, df, max_iter=3, checkpoint_dir=ckpt)
    resumed, metrics = eigenvector_centrality(
        spark, df, max_iter=10, checkpoint_dir=ckpt, resume=True)
    assert len(metrics) == 7          # only the remaining supersteps ran
    a = {r.v: r.eigen for r in full.collect()}
    b = {r.v: r.eigen for r in resumed.collect()}
    assert a == b
