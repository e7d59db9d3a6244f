"""Custom Python Data Source (Spark 4 DataSource API): the synthetic
repo-file corpus as a REGISTERED CONNECTOR.

``spark.read.format("synth_corpus").option("n_files", …).load()``
serves the exact corpus law of corpus.py:generate_corpus through
Spark's pluggable source interface — schema declaration, option
parsing, and PARTITIONED executor-side reads (each InputPartition
materializes its contiguous file-index slice), so the ingest
parallelizes like any first-class source instead of funneling
through a driver-side createDataFrame.

Parity: rows are byte-identical to ``generate_corpus(...)`` for the
same options (the differential test holds sha256(content) sets equal
across the two paths and across partition counts). Each partition
replays the seeded generator and keeps its slice — O(n_files) work
per partition, the honest cost of keeping the global sequential rng
law; a true 10^12-file deployment would switch the law to
per-partition seeding (rng(seed + partition)) as corpus.py's
docstring already specifies, turning replay cost O(n_files/P).

Reference parity note: the reference's sources are fixed CSV/DB
loaders (SURVEY §2.1); a user-pluggable connector API is new-engine
surface that Spark provides and this module exercises.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, InputPartition,
)

DEFAULTS = {"n_repos": 20, "n_files": 200, "seed": 42,
            "partitions": 4}


class SynthCorpusDataSource(DataSource):
    """format("synth_corpus") — options: n_repos, n_files, seed,
    partitions (all int)."""

    @classmethod
    def name(cls) -> str:
        return "synth_corpus"

    def schema(self) -> str:
        return ("repo string, path string, commit string, "
                "lang string, content string")

    def reader(self, schema) -> "SynthCorpusReader":
        return SynthCorpusReader(self.options)


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.opts = {k: int(options.get(k, d))
                     for k, d in DEFAULTS.items()}
        if self.opts["partitions"] < 1:
            raise ValueError("partitions must be >= 1")

    def partitions(self):
        return [InputPartition(i)
                for i in range(self.opts["partitions"])]

    def read(self, partition: InputPartition):
        # executor-side: replay the seeded law, emit this slice
        from adopt_spark.corpus import generate_corpus

        o = self.opts
        corpus = generate_corpus(n_repos=o["n_repos"],
                                 n_files=o["n_files"], seed=o["seed"])
        files = corpus.files
        p, n = partition.value, o["partitions"]
        lo = len(files) * p // n
        hi = len(files) * (p + 1) // n
        for row in files.iloc[lo:hi].itertuples(index=False):
            yield (row.repo, row.path, row.commit, row.lang,
                   row.content)


def register(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("synth_corpus")`` resolves."""
    spark.dataSource.register(SynthCorpusDataSource)
