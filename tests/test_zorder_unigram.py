"""Z-order layout + unigram surprisal vs python twins."""

import collections
import glob
import math
import os

import numpy as np

from pyspark.sql import functions as F

from adopt_spark.functions.text import unigram_logprob
from adopt_spark.functions.zorder import morton_code, zorder_layout


def py_morton(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_code_matches_python(spark):
    rng = np.random.default_rng(2)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 1 << 10, (300, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in
           df.select("x", "y", morton_code("x", "y", 10).alias("z")).collect()}
    for (x, y), z in got.items():
        assert z == py_morton(x, y, 10)


def test_zorder_layout_files_are_z_disjoint(spark, tmp_path):
    rng = np.random.default_rng(4)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 1 << 8, (5000, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    path = str(tmp_path / "zlay")
    zorder_layout(df, "x", "y", path, n_files=6, bits=8)
    # per parquet file: recompute z; files must own disjoint z-ranges
    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pdf = spark.read.parquet(f).toPandas()
        if len(pdf) == 0:
            continue
        zs = [py_morton(int(x), int(y), 8) for x, y in zip(pdf.x, pdf.y)]
        ranges.append((min(zs), max(zs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # contiguous, non-overlapping Z ownership
    # bounding-box tightness: every file's x/y spread must be far below
    # the global domain (the whole point of the interleave)
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pdf = spark.read.parquet(f).toPandas()
        if len(pdf):
            spans.append((pdf.x.max() - pdf.x.min()) *
                         (pdf.y.max() - pdf.y.min()))
    assert sum(spans) / len(spans) < (255 * 255) * 0.55


def test_unigram_logprob_python_twin(spark):
    docs = [
        (0, "the cat sat"), (1, "the dog sat"), (2, "the the the"),
        (3, "rare token here"), (4, ""), (5, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["surprisal"])
           for r in unigram_logprob(df).collect()}
    toks = collections.Counter()
    per_doc = {}
    for did, text in docs:
        ws = [w for w in text.lower().strip().split() if w]
        per_doc[did] = ws
        toks.update(ws)
    n_total = sum(toks.values())
    for did, ws in per_doc.items():
        if not ws:
            assert did not in got  # empty docs produce no row
            continue
        exp = sum(-math.log(toks[w] / n_total) for w in ws) / len(ws)
        assert got[did][0] == len(ws)
        assert abs(got[did][1] - round(exp, 6)) <= 1e-6
    # doc 2 (all 'the', the most common token) must be the LEAST surprising
    assert got[2][1] == min(v[1] for v in got.values())
