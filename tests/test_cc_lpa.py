"""Connected components vs union-find; LPA determinism/fixpoint."""

from adopt_spark.algos.cc import connected_components
from adopt_spark.algos.lpa import label_propagation
from tests.conftest import py_components


def check_cc(spark, df, pairs):
    expected = py_components(pairs)
    labels, metrics = connected_components(spark, df)
    got = {r["v"]: r["component"] for r in labels.collect()}
    assert got == expected
    return metrics


def test_cc_two_components(spark, two_components):
    df, pairs = two_components
    metrics = check_cc(spark, df, pairs)
    labels, _ = connected_components(spark, df)
    comps = {r["component"] for r in labels.collect()}
    assert comps == {0, 100}
    assert len(metrics) >= 1


def test_cc_tri6(spark, tri6):
    df, pairs = tri6
    check_cc(spark, df, pairs)


def test_cc_star_hub(spark, star_hub):
    df, pairs = star_hub
    check_cc(spark, df, pairs)


def test_cc_powerlaw(spark, powerlaw_small):
    df, pairs = powerlaw_small
    check_cc(spark, df, pairs)


def test_lpa_two_components_separate_labels(spark, two_components):
    df, pairs = two_components
    labels, metrics = label_propagation(spark, df, max_iter=30)
    got = {r["v"]: r["label"] for r in labels.collect()}
    # labels never cross components
    comp_of = {v: (0 if v < 100 else 100) for v in got}
    label_comp = {}
    for v, lab in got.items():
        label_comp.setdefault(lab, set()).add(comp_of[v])
    for lab, comps in label_comp.items():
        assert len(comps) == 1
    # deterministic: rerun gives identical labels
    labels2, _ = label_propagation(spark, df, max_iter=30)
    got2 = {r["v"]: r["label"] for r in labels2.collect()}
    assert got == got2
