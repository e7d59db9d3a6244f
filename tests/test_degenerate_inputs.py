"""Degenerate-input sweep: every public algorithm on empty and
single-edge graphs must return well-formed results, never throw.
(The reference crashes on malformed input — console-only; a library
engine must not.)
"""

import pytest
from pyspark.sql import functions as F

from adopt_spark.algos.cc import connected_components
from adopt_spark.algos.cliques import clique_count
from adopt_spark.algos.kcore import core_numbers
from adopt_spark.algos.lpa import label_propagation
from adopt_spark.algos.pagerank import pagerank
from adopt_spark.algos.triangles import triangle_count


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], "sid long, tid long")


@pytest.fixture(scope="module")
def one_edge(spark):
    return spark.createDataFrame([(1, 2)], "sid long, tid long")


@pytest.mark.parametrize("method", ["join", "csr", "cogroup", "auto"])
def test_triangles_empty_and_single(spark, empty, one_edge, method):
    assert triangle_count(empty, method).collect()[0][0] == 0
    assert triangle_count(one_edge, method).collect()[0][0] == 0


@pytest.mark.parametrize("k", [3, 5])
def test_cliques_empty_and_single(spark, empty, one_edge, k):
    assert clique_count(empty, k).collect()[0][0] == 0
    assert clique_count(one_edge, k).collect()[0][0] == 0


def test_pagerank_empty_and_single(spark, empty, one_edge):
    ranks, metrics = pagerank(spark, empty, max_iter=3)
    assert ranks.count() == 0 and metrics == []
    ranks, _ = pagerank(spark, one_edge, max_iter=10)
    rows = {r["v"]: r["rank"] for r in ranks.collect()}
    assert set(rows) == {1, 2}
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    assert rows[2] > rows[1]          # 2 receives 1's rank

def test_cc_lpa_kcore_empty_and_single(spark, empty, one_edge):
    labels, _ = connected_components(spark, empty)
    assert labels.count() == 0
    labels, _ = connected_components(spark, one_edge)
    assert {(r["v"], r["component"]) for r in labels.collect()} == {(1, 1), (2, 1)}

    labels, _ = label_propagation(spark, empty, max_iter=3)
    assert labels.count() == 0
    # synchronous LPA 2-cycles on a single edge (documented); labels stay
    # inside the component and the result is deterministic
    out1, _ = label_propagation(spark, one_edge, max_iter=5)
    out2, _ = label_propagation(spark, one_edge, max_iter=5)
    rows1 = {(r["v"], r["label"]) for r in out1.collect()}
    assert rows1 == {(r["v"], r["label"]) for r in out2.collect()}
    assert {l for _, l in rows1} <= {1, 2}

    cores = core_numbers(spark, empty)
    assert cores.count() == 0
    cores = core_numbers(spark, one_edge)
    assert {(r["v"], r["core"]) for r in cores.collect()} == {(1, 1), (2, 1)}


def test_self_loops_ignored(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 3), (1, 3), (3, 3)],
                               "sid long, tid long")
    assert triangle_count(df, "auto").collect()[0][0] == 1
    labels, _ = connected_components(spark, df)
    assert {r["component"] for r in labels.collect()} == {1}


def test_ivf_degenerate_corpus(spark):
    from adopt_spark.functions.similarity import ivf_topk

    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "q_id long, q_vec array<float>")
    out = ivf_topk(empty_emb, q, k=3)
    assert out.count() == 0
    assert set(out.columns) == {"q_id", "vec_id", "cos", "rank"}

    ragged = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    import pytest
    with pytest.raises(ValueError, match="ragged"):
        ivf_topk(ragged, q, k=3)


def test_round3_late_session_ops_on_empty_and_single(spark, empty, one_edge):
    """Sessions 23-44 surfaces on empty / single-edge graphs: return
    well-formed (possibly empty) results, never throw."""
    from adopt_spark.algos.cc import percolation_profile
    from adopt_spark.algos.cycles import cycle_count_cogroup
    from adopt_spark.algos.matching import weighted_matching
    from adopt_spark.algos.paths import widest_paths
    from adopt_spark.algos.roles import refex_roles
    from adopt_spark.algos.sparsify import local_sparsify, sparsify_report
    from adopt_spark.algos.triangles import triangle_count_incremental
    from adopt_spark.algos.vertex_metrics import (
        quotient_graph, structural_equiv,
    )

    assert structural_equiv(empty).count() == 0
    assert local_sparsify(empty).count() == 0
    assert refex_roles(empty).count() == 0
    assert weighted_matching(empty).count() == 0
    # single edge: its two endpoints mirror each other (deg-1 twins
    # with different neighbors -> NOT equivalent), sparsify keeps it,
    # matching takes it
    assert local_sparsify(one_edge).count() == 1
    assert weighted_matching(one_edge).count() == 1
    q = quotient_graph(one_edge).collect()[0]
    assert (q.n_vertices, q.n_edges) == (2, 1)
    w, _ = widest_paths(spark, empty, 0)
    assert w.count() == 0
    perc = percolation_profile(spark, one_edge, ps=(100,)).collect()[0]
    assert perc.n_edges == 1 and perc.largest == 2
    row = triangle_count_incremental(
        one_edge, (F.col("a") + F.col("b")) % 2 == 0).collect()[0]
    assert row.n_total_triangles == 0
    assert cycle_count_cogroup(empty, 4).collect()[0][0] == 0


def test_round3_text_ops_on_trivial_docs(spark):
    """Classifier / DSIR / fertility on one-doc and empty-text
    corpora: degrade gracefully."""
    from adopt_spark.functions.classify import nb_lang_confusion
    from adopt_spark.functions.sampling import dsir_sample

    one = spark.createDataFrame([(1, "en", "hello world")],
                                "doc_id long, lang string, text string")
    # doc 1 lands in the train split -> empty test -> empty confusion
    assert nb_lang_confusion(one).count() == 0
    sel = dsir_sample(one, keep_pct=100)
    assert sel.count() == 1
    blank = spark.createDataFrame([(1, "en", ""), (2, "de", "x y")],
                                  "doc_id long, lang string, text string")
    assert dsir_sample(blank, keep_pct=100).count() >= 1
