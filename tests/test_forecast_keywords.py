"""Hand-case twins: seasonal-naive backtest + log-odds keywords."""

from __future__ import annotations

import datetime as dt
import math

from adopt_spark.queries.registry import q_forecast_backtest, q_lang_keywords


def test_forecast_backtest_hand_case(spark, tmp_path):
    # type 'a': day d has d+1 events over 14 days -> |n - n(d-7)| = 7
    rows = []
    eid = 0
    for d in range(14):
        for _ in range(d + 1):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 12, 0, 0),
                         1, "a", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.event_type: r for r in
           q_forecast_backtest(spark, str(tmp_path)).collect()}
    r = out["a"]
    assert r.n_days_eval == 7 and r.abs_err_total == 49
    assert abs(r.mae - 7.0) < 1e-9
    # mape = mean over eval days d=7..13 of 7/(d+1)
    want = sum(7 / (d + 1) for d in range(7, 14)) / 7
    assert abs(r.mape - round(want, 6)) < 1e-6


def _log_odds(c, nl, ct, tot):
    rest_c, rest_n = ct - c, tot - nl
    return round(math.log(((c + 1) / (nl - c + 1))
                          / ((rest_c + 1) / (rest_n - rest_c + 1))), 6)


def test_lang_keywords_differential(spark, tmp_path):
    docs = [
        (0, "alpha alpha alpha shared shared", "en", "s", 1),
        (1, "beta beta shared shared shared", "de", "s", 1),
        (2, "alpha shared gamma", "en", "s", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {(r.lang, r.term): (r.log_odds, r.rn)
           for r in q_lang_keywords(spark, str(tmp_path)).collect()}
    # corpus: en has 8 tokens (alpha x4, shared x3, gamma x1),
    # de has 5 (beta x2, shared x3); tot = 13
    assert got[("en", "alpha")][0] == _log_odds(4, 8, 4, 13)
    assert got[("de", "beta")][0] == _log_odds(2, 5, 2, 13)
    # the most distinctive term per language ranks first
    assert got[("en", "alpha")][1] == 1
    assert got[("de", "beta")][1] == 1
