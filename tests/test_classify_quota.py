"""Naive Bayes classifier (functions/classify.py) and streaming quota
(streaming/quota.py) vs pure-python twins."""

from __future__ import annotations

import math
import os
import time
from collections import Counter, defaultdict

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ NB

def _py_nb(rows, train_pct=80):
    """rows = [(doc_id, lang, text)] -> confusion dict."""
    import re

    def toks(text):
        return [t for t in re.split(r"\s+", text.strip().lower()) if t]

    def is_train(doc_id):
        return ((2654435761 * doc_id + 104729) % 2147483647) % 100 < train_pct

    train = [r for r in rows if is_train(r[0])]
    test = [r for r in rows if not is_train(r[0])]
    cf = Counter()
    n_l = Counter()
    prior = Counter()
    for _, lang, text in train:
        prior[lang] += 1
        for t in toks(text):
            cf[(lang, t)] += 1
            n_l[lang] += 1
    vocab = len({t for (_, t) in cf})
    n_train = len(train)
    conf = Counter()
    for doc_id, lang, text in test:
        ts = toks(text)
        best = None
        for cls in sorted(n_l):
            score = (math.log(prior[cls] / n_train)
                     + sum(math.log(cf[(cls, t)] + 1) for t in ts)
                     - len(ts) * math.log(n_l[cls] + vocab))
            score = round(score, 6)
            # classes iterate ascending, so keeping the first max
            # implements the (score desc, cls asc) tie-break
            if best is None or score > best[0]:
                best = (score, cls)
        conf[(lang, best[1])] += 1
    return dict(conf)


def test_nb_confusion_vs_python(spark):
    from adopt_spark.functions.classify import nb_lang_confusion

    rows = [(i, lang, text) for i, (lang, text) in enumerate([
        ("de", "der hund läuft im park und der hund schläft"),
        ("de", "die katze schläft auf dem sofa"),
        ("de", "der park ist schön im sommer"),
        ("de", "im sommer läuft der hund im park"),
        ("de", "die sonne scheint und die katze schläft"),
        ("en", "the dog runs in the park and the dog sleeps"),
        ("en", "a cat sleeps on the sofa"),
        ("en", "the park is nice in summer"),
        ("en", "in summer the dog runs in the park"),
        ("en", "the sun shines and the cat sleeps"),
    ] * 4, start=1)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    want = _py_nb(rows)
    got = {(r.lang, r.pred): r.n
           for r in nb_lang_confusion(df).collect()}
    assert got == want


def test_nb_learns_separable_langs(spark):
    from adopt_spark.functions.classify import nb_lang_confusion

    # fully disjoint vocabularies -> every test doc classified right
    rows = [(i, "aa" if i % 2 else "bb",
             "alpha beta gamma" if i % 2 else "uno dos tres")
            for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    conf = {(r.lang, r.pred): r.n for r in nb_lang_confusion(df).collect()}
    assert all(lang == pred for (lang, pred) in conf)


def test_nb_validates_pct(spark):
    from adopt_spark.functions.classify import nb_lang_confusion

    df = spark.createDataFrame([(1, "en", "x")],
                               "doc_id long, lang string, text string")
    with pytest.raises(ValueError):
        nb_lang_confusion(df, train_pct=100)


# --------------------------------------------------------------- quota

def _py_quota(events: pd.DataFrame, quota: int, bucket_seconds: int):
    us = events["ts"].astype("datetime64[us]").astype("int64")
    b = us // (bucket_seconds * 1_000_000)
    df = pd.DataFrame({"user_id": events["user_id"], "bucket_id": b,
                       "event_id": events["event_id"], "us": us})
    out = set()
    for (u, bk), grp in df.groupby(["user_id", "bucket_id"]):
        g = grp.sort_values(["us", "event_id"])
        for rank, (_, row) in enumerate(g.head(quota).iterrows(), 1):
            out.add((u, bk, int(row.event_id), rank, len(g)))
    return out


def test_quota_stream_matches_batch(spark):
    from adopt_spark.streaming.quota import quota_stream

    got = {(r.user_id, r.bucket_id, r.event_id, r.admit_rank, r.n_total)
           for r in quota_stream(spark, SF, quota=2,
                                 bucket_seconds=86400).collect()}
    events = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    want = _py_quota(events, 2, 86400)
    assert got == want
    # shedding must actually bind on this data
    assert len(got) < len(events)


def test_quota_late_event_displaces(spark, tmp_path):
    """A late-arriving EARLIER event must push out the largest
    admitted one — the property counts-only state could not give."""
    from adopt_spark.streaming.quota import quota_stream

    base = pd.Timestamp("2024-01-01 10:00:00")
    b1 = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "ts": [base + pd.Timedelta(minutes=m) for m in (10, 20, 30, 40)],
        "user_id": [7, 7, 7, 7],
    })
    b2 = pd.DataFrame({
        "event_id": [5],
        "ts": [base],                      # earlier than everything
        "user_id": [7],
    })
    src = tmp_path / "src"
    src.mkdir()
    for i, part in enumerate((b1, b2)):
        part = part.copy()
        part["ts"] = part["ts"].astype("datetime64[us]")
        p = str(src / f"part-{i:02d}.parquet")
        part.to_parquet(p)
        os.utime(p, (time.time() + i, time.time() + i))
    got = {(r.event_id, r.admit_rank, r.n_total)
           for r in quota_stream(spark, SF, quota=3, bucket_seconds=86400,
                                 source_dir=str(src),
                                 max_files_per_trigger=1).collect()}
    # final admitted set: 5 (10:00), 1 (10:10), 2 (10:20); 3 displaced
    assert got == {(5, 1, 5), (1, 2, 5), (2, 3, 5)}


def test_quota_validates(spark):
    from adopt_spark.streaming.quota import quota_stream

    with pytest.raises(ValueError):
        quota_stream(spark, SF, quota=0)


def test_nb_prf_laws(spark):
    """P/R/F1 from a known confusion matrix via the same doc fixture
    as the confusion test: metrics recomputed by hand from the
    engine's own matrix."""
    from unittest import mock

    from adopt_spark.queries import registry as R

    rows = [(i, "aa" if i % 2 else "bb",
             "alpha beta gamma" if i % 2 else "uno dos tres")
            for i in range(1, 51)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    with mock.patch.object(R, "_t", lambda s_, sf, name: df):
        conf = {(r.lang, r.pred): r.n
                for r in R.q_nb_confusion(spark, "x").collect()}
        prf = {r.cls: r for r in R.q_nb_prf(spark, "x").collect()}
    for cls in prf:
        tp = conf.get((cls, cls), 0)
        sup = sum(n for (t, _), n in conf.items() if t == cls)
        npred = sum(n for (_, p), n in conf.items() if p == cls)
        assert prf[cls].tp == tp
        assert prf[cls].support == sup
        assert prf[cls].n_pred == npred
        p_ = tp / npred if npred else 0.0
        r_ = tp / sup if sup else 0.0
        f_ = 2 * p_ * r_ / (p_ + r_) if p_ + r_ > 0 else 0.0
        assert prf[cls].precision == round(p_, 6)
        assert prf[cls].recall == round(r_, 6)
        assert prf[cls].f1 == round(f_, 6)
    # disjoint vocab -> perfect scores
    assert all(r.f1 == 1.0 for r in prf.values())
