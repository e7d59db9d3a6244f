"""Registry-surface manifest pin (round-4 verdict item 7).

The driver's CORRECTNESS gate checks the FIRST 50 ``all_queries()``
entries each round, so the dict's key ORDER is load-bearing: a
refactor of the 5-part registry package that silently reorders keys
would silently change what the external gate attests. Same for the
oracle SQL text — the value-hash compare runs the pinned SQL, so an
accidental edit changes the contract.

``registry_manifest.json`` pins (a) the exact key order, (b) a
sha256 prefix of every oracle's SQL. Regenerate DELIBERATELY when
adding entries (see the test docstrings for the one-liner).
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))

with open(os.path.join(_HERE, "registry_manifest.json")) as f:
    MANIFEST = json.load(f)


@pytest.fixture(scope="module")
def registry():
    from adopt_spark.queries.registry import all_oracles, all_queries

    return all_queries(), all_oracles()


def test_key_order_matches_manifest(registry):
    """Exact ordered key list — catches silent reordering of the
    driver head. Regenerate on purposeful change:
    python -c "from tests.test_registry_manifest import regen; regen()"
    """
    queries, _ = registry
    assert list(queries) == MANIFEST["key_order"]


def test_entry_count(registry):
    queries, oracles = registry
    assert len(queries) == MANIFEST["n_entries"]
    assert len(oracles) == MANIFEST["n_entries"]


def test_oracle_hashes_match_manifest(registry):
    _, oracles = registry
    got = {k: hashlib.sha256(v.encode()).hexdigest()[:16]
           for k, v in oracles.items()}
    changed = {k for k in got
               if got[k] != MANIFEST["oracle_sha256"].get(k)}
    assert not changed, (
        f"oracle SQL changed for {sorted(changed)[:10]} — if deliberate, "
        "regenerate tests/registry_manifest.json")


def test_head_never_driver_checked():
    """The 50-entry driver head must be entries with no r1-r4 driver
    row (the rotation invariant the round-4 verdict asks each round
    to keep)."""
    from adopt_spark.queries.registry import all_queries

    head = list(all_queries())[:50]
    checked: set[str] = set()
    for r in (1, 2, 3, 4):
        path = os.path.join(_HERE, os.pardir, f"CORRECTNESS_r0{r}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            checked |= {k for k in json.load(f) if not k.startswith("_")}
    assert not set(head) & checked


def regen() -> None:
    """Regenerate the manifest after a deliberate registry change."""
    from adopt_spark.queries.registry import all_oracles, all_queries

    q, o = all_queries(), all_oracles()
    manifest = {
        "n_entries": len(q),
        "key_order": list(q),
        "oracle_sha256": {k: hashlib.sha256(v.encode()).hexdigest()[:16]
                          for k, v in sorted(o.items())},
    }
    with open(os.path.join(_HERE, "registry_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"manifest regenerated: {len(q)} entries")
