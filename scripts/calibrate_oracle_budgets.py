"""Calibrate the unrolled DuckDB oracle budgets at a target scale factor.

The coloring / k-core / onion oracles (oracle_gen.coloring_fixed_sql,
core_numbers_sql, onion_layers_sql) unroll a fixed (stage, round)
schedule whose depth was measured at sf0.01.  At a different sf the
graph is denser, so the required depth changes; an under-budget oracle
fails LOUDLY (row-count / hash mismatch) but tells you nothing about
the right budget.  This script runs the ENGINE side once at the target
sf with instrumentation, derives the measured schedule, applies a 2x
margin (the same convention truss_numbers_sql documents), and prints
the ORACLE_* environment overrides that scripts/contract_check.py /
sf01_gate.py consume.

Usage: python scripts/calibrate_oracle_budgets.py [sf_dir]
Prints one JSON line: {"ORACLE_COLORING_COLORS": ..., ...} and writes
it to /tmp/oracle_budgets_<sfname>.json for the gate to pick up.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + \
    os.environ.get("PYTHONPATH", "")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from adopt_spark.algos.kcore import onion_layers
    from adopt_spark.algos.mis import greedy_coloring
    from adopt_spark.edges import derived_edges, derived_edges_sparse
    from adopt_spark.session import get_spark

    spark = get_spark("calibrate_budgets", cpus=16, shuffle_partitions=32)

    # --- coloring: bounded dense subgraph (same cut as q_coloring) ---
    SCC_ID_LIM = 300
    e = derived_edges(spark, sf_dir).where(
        (F.col("sid") < SCC_ID_LIM) & (F.col("tid") < SCC_ID_LIM))
    stats: dict = {}
    colored = greedy_coloring(e, stats=stats)
    n_colors = colored.agg(F.max("color")).first()[0] + 1
    rounds_per_color = stats["rounds_per_color"]
    max_mis_rounds = max(rounds_per_color) if rounds_per_color else 1

    # --- onion / k-core: sparse derived graph (same as q_onion_layers,
    # a_core_numbers) — per-k non-empty batch counts ARE the needed
    # peel depth (an empty round means the stage already converged) ---
    on = onion_layers(spark, derived_edges_sparse(spark, sf_dir))
    per_k = (on.groupBy("core")
             .agg(F.countDistinct("layer").alias("rounds"))
             .orderBy("core").collect())
    kcore_rounds = {int(r["core"]) + 1: int(r["rounds"]) for r in per_k}
    k_max_needed = max(kcore_rounds) if kcore_rounds else 1

    # --- weighted matching: full derived graph (same as
    # q_weighted_matching) — rounds to empty-active is the needed
    # unroll depth ---
    from adopt_spark.algos.matching import weighted_matching

    wstats: dict = {}
    weighted_matching(derived_edges(spark, sf_dir), stats=wstats).count()
    wmatch_rounds = wstats.get("rounds", 1)

    margin = 2
    env = {
        "ORACLE_WMATCH_ROUNDS": str(wmatch_rounds + max(4,
                                                        wmatch_rounds // 4)),
        "ORACLE_COLORING_COLORS": str(n_colors + 2),
        "ORACLE_COLORING_ROUNDS": str(max_mis_rounds * margin),
        "ORACLE_KCORE_K_MAX": str(k_max_needed + 1),
        "ORACLE_KCORE_DEFAULT_ROUNDS": "4",
        "ORACLE_KCORE_ROUNDS": json.dumps(
            {k: v * margin for k, v in kcore_rounds.items()}),
        "_measured": json.dumps({
            "sf_dir": sf_dir,
            "coloring_colors": n_colors,
            "coloring_rounds_per_color": rounds_per_color,
            "kcore_rounds_per_k": kcore_rounds,
            "wmatch_rounds": wmatch_rounds,
        }),
    }
    out = f"/tmp/oracle_budgets_{os.path.basename(sf_dir.rstrip('/'))}.json"
    with open(out, "w") as f:
        json.dump(env, f, indent=1)
    print(json.dumps(env))
    print(f"-> {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
