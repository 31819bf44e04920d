"""Registration guard — the structural fix for round 9's process hole.

Round 9's end-of-round snapshot commit published two registry queries
(`pca_top_component_scores`, `embedding_covariance`) that had never
been sim-run or tested; both were broken and became the project's
first driver reds. The ledger guard covers window FREEZES; this guard
covers REGISTRATION: every name in the registry must carry committed
verification evidence — either a driver row in LEDGER.json (it has
been through a real round window) or a sim-green record in SIMLOG.json
(written only by `tools/drive_driver_contract.py` after a green
hash-compare vs the DuckDB oracle at sf0.01). An unverified
registration now fails pytest immediately instead of shipping.
VERDICT r09 item 3.
"""

from __future__ import annotations

import json
import os

from etl_fuel_priceguide_ec2_spark import registry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ledger_names() -> set[str]:
    with open(os.path.join(ROOT, "LEDGER.json")) as f:
        return {q["query"] for q in json.load(f)["queries"]}


def _simlog() -> dict:
    path = os.path.join(ROOT, "SIMLOG.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _simlog_names() -> set[str]:
    return {k for k, v in _simlog().items() if v.get("green")}


def test_every_registered_query_has_verification_record():
    """Evidence strength must match what the query CAN provide: an
    ORACLED query needs a hash-compared green (mode == "hash",
    EXPLICITLY — SIMLOG.json is committed, hand-editable evidence, so
    a record with no mode field is treated as NOT hash-verified
    rather than granted the benefit of the doubt); a rows_only green
    is acceptable evidence only for a query with no oracle, so a
    crash-free-but-wrong oracled query can never ship on execution
    evidence alone (code-review r10, hardened by a second pass)."""
    ledger = _ledger_names()
    log = _simlog()
    oracled = set(registry.oracle_sql())
    missing = []
    for name in registry.queries():
        if name in ledger:
            continue
        rec = log.get(name)
        if not rec or not rec.get("green"):
            missing.append(name)
            continue
        if name in oracled and rec.get("mode") != "hash":
            missing.append(f"{name} (rows_only evidence but an oracle exists)")
    assert not missing, (
        "registered without committed verification evidence (run "
        "`python tools/drive_driver_contract.py <name>` green first — "
        f"it records SIMLOG.json): {missing}"
    )


def test_simlog_names_exist_in_registry():
    """A SIMLOG entry for a renamed/deleted query is stale evidence —
    flag it so the log tracks the registry."""
    stale = sorted(_simlog_names() - set(registry.queries()))
    assert not stale, f"SIMLOG.json entries with no registry query: {stale}"
