"""SparkSession factory with scale-appropriate defaults.

The reference engine is single-JVM in-memory (buffer/BufferManager.java);
our equivalent knob surface is the Spark session config. Everything here
is chosen to survive a 1000-executor / 100 TB deployment:

  * AQE on (runtime re-planning ≈ the reference's adaptive episode
    scheduling), including skew-join splitting (≈ hypercube re-split,
    joining/join/wcoj/Hypercube.java subtractByPoint).
  * Arrow on for every pandas-UDF exchange (vectorized-only contract).
  * shuffle partitions sized by env, not the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "adopt_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a local SparkSession.

    ``cpus`` controls ``local[N]``; ``shuffle_partitions`` defaults to
    2×cpus locally (on a real cluster you would size this to keep
    post-shuffle partitions under ~200 MB; AQE coalescing trims the
    excess either way).
    """
    n = cpus or DEFAULT_CPUS
    parts = shuffle_partitions or max(2 * n, 8)
    # Local-mode Python workers inherit os.environ, not the driver's
    # sys.path — export the package root so pandas-UDF kernels can
    # `import adopt_spark` regardless of the launch cwd. (On a real
    # cluster the dist zip travels via spark-submit --py-files instead;
    # see scripts/make_dist.sh.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else ""))
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
