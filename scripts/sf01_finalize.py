"""Fold completed sf0.1 slice files + failure classifications into
CORRECTNESS_SF01.json — idempotent, safe to run while the gate is
live (the gate only ever ADDS green rows; this never removes them).

Run at any time; designed for end-of-round so a killed gate still
leaves every completed entry recorded and every non-green row
carrying its in-JSON classification.
"""

from __future__ import annotations

import glob
import json

from sf01_gate import CLASSIFY, OUT, SKIP, _green, _load  # type: ignore


def main() -> None:
    merged = _load(OUT)
    for part_file in sorted(glob.glob("/tmp/sf01_slice_*.json")):
        for k, v in _load(part_file).items():
            if not k.startswith("_") and not _green(merged.get(k, {})):
                merged[k] = v
    merged["_skipped"] = {"names": sorted(SKIP), "reasons": SKIP}
    budgets = _load("/tmp/oracle_budgets_sf0.1.json")
    if budgets:
        merged["_budgets"] = budgets
    n_ok = n_ro = n_bad = n_missing = 0
    for k, rec in merged.items():
        if k.startswith("_"):
            continue
        if rec.get("hash_match"):
            n_ok += 1
            rec.pop("classification", None)
        elif rec.get("err") == "no_oracle":
            n_ro += 1
        else:
            n_bad += 1
            rec["classification"] = CLASSIFY.get(
                k, "unclassified: see err; engine vs oracle side not "
                   "yet adjudicated")
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    n_all = sum(1 for k in merged if not k.startswith("_"))
    print(f"sf0.1 gate state: {n_ok}/{n_all} oracle-PASS, {n_ro} rows-only, "
          f"{n_bad} classified-FAIL ({len(SKIP)} documented exclusions)")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
