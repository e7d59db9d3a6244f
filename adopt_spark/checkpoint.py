"""Resumable superstep checkpointing with per-partition lineage.

The reference has anytime/suspend-resume machinery at sub-query
granularity (budget exhaustion snapshots a value-space frontier,
joining/join/wcoj/HyperCubeEvaluationTask.java:283-341). Our unit of
resumability is the superstep: every iteration of an iterative graph
algorithm writes its state DataFrame as a parquet snapshot plus a
metrics record (iteration number, convergence delta, timing,
per-partition row counts = the lineage record), and a fresh run with
``resume=True`` restarts from the latest complete snapshot.

Snapshots double as lineage truncation: reading the parquet back
replaces an ever-growing iterative plan with a flat scan — mandatory
for 100+ supersteps at scale. (Iceberg snapshots would be the
production sink; parquet-per-iteration is the jar-free equivalent.)
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class CheckpointManager:
    """Directory layout:  <root>/iter=<k>/ (parquet) + <root>/metrics.jsonl"""

    root: str
    keep_last: int = 2
    metrics: list[dict[str, Any]] = field(default_factory=list)

    def __post_init__(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    def _iter_dir(self, k: int) -> str:
        return os.path.join(self.root, f"iter={k:05d}")

    def save(self, df: DataFrame, iteration: int,
             sum_cols: tuple[str, ...] = (), **metrics: Any) -> DataFrame:
        """Write snapshot, record metrics+lineage, return truncated DF.

        ``sum_cols``: numeric snapshot columns whose global sums the
        caller needs anyway (e.g. a convergence delta). They ride the
        per-partition lineage scan — same job, zero extra passes — and
        land in the metrics record under ``"sums"`` (read them from
        ``self.metrics[-1]["sums"]``).
        """
        t0 = time.time()
        path = self._iter_dir(iteration)
        tmp = path + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        # atomic-ish publish: only a completed write gets the final name,
        # so resume never sees a torn snapshot
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        spark = df.sparkSession
        out = spark.read.parquet(path)
        agg_exprs = [F.count(F.lit(1)).alias("rows")]
        agg_exprs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
        per_part = (out.groupBy(F.spark_partition_id().alias("pid"))
                    .agg(*agg_exprs).collect())
        per_part.sort(key=lambda r: r["pid"])  # deterministic driver-side sum
        lineage = [{"partition": int(r["pid"]), "rows": int(r["rows"])}
                   for r in per_part]
        sums = {c: float(sum(r[f"sum_{c}"] or 0.0 for r in per_part))
                for c in sum_cols}
        rec = {
            "iteration": iteration,
            "path": path,
            "write_sec": round(time.time() - t0, 4),
            "partitions": lineage,
            "rows": sum(p["rows"] for p in lineage),
            **({"sums": sums} if sum_cols else {}),
            **metrics,
        }
        self.metrics.append(rec)
        with open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._gc(iteration)
        return out

    def record(self, df: DataFrame, iteration: int,
               sum_cols: tuple[str, ...] = (), **metrics: Any) -> None:
        """Per-superstep lineage + metrics record WITHOUT a durable
        state write — for delta rounds whose frontier is near-full:
        their durable state rides the periodic full snapshot (resume
        never restarts from a delta), so writing the ~O(V) delta to
        disk buys nothing, while the lineage/metrics record keeps the
        every-superstep observability contract. One in-memory agg job
        over ``df`` (which the caller has already materialized)."""
        t0 = time.time()
        agg_exprs = [F.count(F.lit(1)).alias("rows")]
        agg_exprs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
        per_part = (df.groupBy(F.spark_partition_id().alias("pid"))
                    .agg(*agg_exprs).collect())
        per_part.sort(key=lambda r: r["pid"])
        lineage = [{"partition": int(r["pid"]), "rows": int(r["rows"])}
                   for r in per_part]
        sums = {c: float(sum(r[f"sum_{c}"] or 0.0 for r in per_part))
                for c in sum_cols}
        rec = {
            "iteration": iteration,
            "path": None,
            "durable": False,
            "write_sec": round(time.time() - t0, 4),
            "partitions": lineage,
            "rows": sum(p["rows"] for p in lineage),
            **({"sums": sums} if sum_cols else {}),
            **metrics,
        }
        self.metrics.append(rec)
        with open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def amend_last(self, **extra: Any) -> None:
        """Fold late-computed metrics (e.g. convergence delta measured
        after the snapshot write) into the last record, on disk too."""
        if not self.metrics:
            return
        self.metrics[-1].update(extra)
        path = os.path.join(self.root, "metrics.jsonl")
        existing = self.load_metrics()
        if existing:
            existing[-1].update(extra)
            with open(path, "w") as f:
                for rec in existing:
                    f.write(json.dumps(rec) + "\n")

    def _gc(self, current: int) -> None:
        done = sorted(self.completed_iterations())
        for k in done[: max(0, len(done) - self.keep_last)]:
            if k < current:
                shutil.rmtree(self._iter_dir(k), ignore_errors=True)

    def completed_iterations(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if name.startswith("iter=") and not name.endswith(".tmp"):
                out.append(int(name.split("=")[1]))
        return sorted(out)

    def latest(self) -> int | None:
        its = self.completed_iterations()
        return its[-1] if its else None

    def load(self, spark: SparkSession, iteration: int) -> DataFrame:
        return spark.read.parquet(self._iter_dir(iteration))

    def load_metrics(self) -> list[dict[str, Any]]:
        p = os.path.join(self.root, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
