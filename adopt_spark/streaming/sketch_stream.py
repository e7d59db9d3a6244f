"""Streaming windowed distinct-count sketch: KMV over a stream.

The production ask: "distinct users per hour over an unbounded
stream, in bounded memory". Exact streaming distinct needs state
proportional to the distinct count; the KMV bottom-k sketch
(functions/sketch.py) needs exactly k longs per window — and because
KMV is a MERGEABLE sketch (bottom-k of a union = bottom-k of the
union of bottom-ks), folding each micro-batch into the carried state
yields bit-identical results to running batch KMV over the whole
history. That merge identity makes the *streaming* operator
oracle-checkable value-for-value against a batch DuckDB twin — the
same shared-hash trick the rest of the contract uses.

Implementation: ``applyInPandasWithState`` keyed by tumbling-window
start, state = the window's current bottom-k hash array (O(k) per
window, the bounded-sketch shape). Each batch: union the batch's
distinct hashes into the state, keep the k smallest, emit the
refreshed estimate. Update-mode re-emissions are collapsed by
max(estimate): the estimate is monotone non-decreasing across
batches (below saturation it equals the distinct-hash count, which
only grows; at saturation it is (k-1)*M/h_k and h_k only shrinks),
so the max IS the final emission — pinned by the multi-batch test.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from adopt_spark.functions.sketch import KMV_M, kmv_hash

_OUT_SCHEMA = "window_start string, estimate double"
_STATE_SCHEMA = "hashes array<long>"


def _kmv_fn(k: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        batches = [pdf["h"].to_numpy(dtype=np.int64) for pdf in pdfs]
        hs = (np.unique(np.concatenate(batches)) if batches
              else np.empty(0, np.int64))
        if state.exists:
            carried = np.asarray(state.get[0], dtype=np.int64)
            hs = np.unique(np.concatenate([carried, hs]))
        if len(hs) == 0:
            return
        bottom = hs[:k]  # np.unique returns sorted ascending
        state.update((bottom.tolist(),))
        nb = len(bottom)
        est = float(nb) if nb < k else round((k - 1) * KMV_M / int(bottom[-1]), 4)
        yield pd.DataFrame({"window_start": [key[0]], "estimate": [est]})

    return fn


def windowed_distinct_kmv_stream(
    spark: SparkSession,
    sf_dir: str,
    value_col: str = "user_id",
    k: int = 32,
    source_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Per-hour KMV distinct estimates of ``value_col`` over the
    events stream; returns the completed result
    [window_start: string, estimate: double]."""
    if source_dir is None:
        source_dir = tempfile.mkdtemp(prefix="events_kmv_")
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
                   os.path.join(source_dir, "events.parquet"))
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(source_dir)
        .select(
            F.date_format(F.date_trunc("hour", F.col("ts").cast("timestamp")),
                          "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            kmv_hash(F.col(value_col)).alias("h"),
        )
    )
    out = stream.groupBy("window_start").applyInPandasWithState(
        _kmv_fn(k), _OUT_SCHEMA, _STATE_SCHEMA,
        "update", GroupStateTimeout.NoTimeout)
    name = f"kmv_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (spark.table(name)
            .groupBy("window_start")
            .agg(F.max("estimate").alias("estimate")))
