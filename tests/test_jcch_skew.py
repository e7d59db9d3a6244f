"""JCC-H-style skew workload: value correctness vs DuckDB + plan
evidence that AQE's runtime skew-join splitting actually fires on the
hot-key join (the reference report's Table 1 JCC-H row is a
robustness-to-skew claim; this is the Catalyst-side counterpart)."""

from __future__ import annotations

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
BASE = ("orders", "lineitem", "customer", "supplier", "nation", "region")


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in BASE:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _match(sp, oc) -> bool:
    if len(sp) != len(oc) or sorted(sp.columns) != sorted(oc.columns):
        return False
    a = sp[sorted(sp.columns)]
    b = oc[sorted(oc.columns)]
    a = a.sort_values(by=list(a.columns),
                      key=lambda s: s.astype(str)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns),
                      key=lambda s: s.astype(str)).reset_index(drop=True)
    for c in a.columns:
        for va, vb in zip(a[c], b[c]):
            try:
                if not math.isclose(float(va), float(vb),
                                    rel_tol=1e-9, abs_tol=1e-9):
                    return False
            except (TypeError, ValueError):
                if str(va) != str(vb):
                    return False
    return True


@pytest.mark.parametrize("name", ["jcch_q3_skew", "jcch_q5_skew",
                                  "jcch_q18_skew", "jcch_hotkeys"])
def test_jcch_value_oracle(spark, name):
    from adopt_spark.queries.jcch import jcch_oracle_sql, jcch_query

    sp = jcch_query(name)(spark, SF).toPandas()
    oc = _oracle(SF, jcch_oracle_sql(name))
    assert _match(sp, oc), name


def test_skew_law_is_skewed(spark):
    """The generator law must actually produce the hot/cold popularity
    ratio the docstring claims (hot key ≥ 100x a cold key's orders)."""
    from adopt_spark.queries.jcch import jcch_query

    hot = jcch_query("jcch_hotkeys")(spark, SF01).toPandas()
    hot_n = int(hot["n_orders"].iloc[0])
    # a cold key keeps its uniform share: total orders / n_customers
    import pyarrow.parquet as pq

    n_orders = pq.read_metadata(f"{SF01}/orders.parquet").num_rows
    n_cust = pq.read_metadata(f"{SF01}/customer.parquet").num_rows
    # cold keys keep only the o_orderkey % 4 == 0 quarter of the stream
    cold_expect = 0.25 * n_orders / n_cust
    assert hot_n > 100 * cold_expect


def test_aqe_splits_the_hot_join(spark):
    """With thresholds scaled to fixture sizes, the adaptive plan must
    mark the customer⋈orders_sk hot-key join as skew-split
    (OptimizeSkewedJoin => 'skew=true' in the final SMJ node). At
    production scale the default 256MB thresholds fire on the same
    shape — the law concentrates 75% of the build side on 25 keys."""
    from adopt_spark.queries.jcch import register_jcch_views

    confs = {
        # force the shuffle join path (fixture dims would broadcast)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # enough shuffle partitions that the 25 hot keys concentrate in
        # few partitions and the median (cold-only) partition is tiny —
        # with very few partitions every partition holds a hot key and
        # nothing is skewed RELATIVE to the median
        "spark.sql.shuffle.partitions": "200",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        register_jcch_views(spark, SF01)
        # two constraints discovered empirically (both hold trivially at
        # production scale, and must be arranged at fixture scale):
        #  * no aggregation downstream of the join — OptimizeSkewedJoin
        #    declines to split a join whose output partitioning a later
        #    stage requires (that case needs forceOptimizeSkewedJoin);
        #  * multiple MAP tasks feeding the shuffle — AQE splits a
        #    skewed reduce partition at mapper granularity, and the
        #    single-file fixture scan yields one mapper (nothing to
        #    split); a real table has thousands of input splits.
        spark.table("orders_sk").repartition(32) \
            .createOrReplaceTempView("orders_sk_r")
        spark.table("customer").repartition(8) \
            .createOrReplaceTempView("customer_r")
        df = spark.sql("""
            SELECT c_name, o_orderkey
            FROM customer_r JOIN orders_sk_r ON c_custkey = o_custkey
        """)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
