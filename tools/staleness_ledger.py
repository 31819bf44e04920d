"""Per-query driver-staleness ledger (VERDICT r06 item 3).

Joins the registry's full query list against every committed
CORRECTNESS_r*.json and emits, per query:

  last_green_round   -- highest round with a green driver row
                        (rows_match & schema_match & hash_match-or-rows-only
                        & no err), or None if never driver-seen
  last_seen_round    -- highest round the driver ran it at all
  rounds_stale       -- current_round - last_green_round
                        (current_round = max committed round + 1, i.e. the
                        round being frozen); None => infinitely stale

The ledger is the single source of truth for the round-N verification
window: the freeze step takes the top-50 stalest (never-seen first, then
by rounds_stale desc, registration order as tiebreak) and writes them
into `_ROUND_PRIORITY`. Replaces the hand-maintained priority list.

Usage:
  python tools/staleness_ledger.py            # prints ledger, writes LEDGER.json
  python tools/staleness_ledger.py --window   # prints the derived top-50 window
"""
from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SLOTS = 50


def _green(row: dict) -> bool:
    if row.get("err"):
        return False
    if not row.get("rows_match"):
        return False
    # hash_match is None for rows-only (no-oracle) checks; absence of a
    # hash mismatch still counts as the driver's green for that class.
    hm = row.get("hash_match")
    sm = row.get("schema_match")
    return (hm is not False) and (sm is not False)


def assert_artifacts_tracked(repo: str = REPO) -> list[str]:
    """Refuse to build a freeze-driving ledger while any
    ``CORRECTNESS_r*.json`` is untracked or modified in git (VERDICT
    r08 item 7): an uncommitted newest round would be silently treated
    as nonexistent by round-number logic derived from *committed*
    state elsewhere, so a freeze could skip the freshest verification
    results. Returns the offending paths (and raises) so the caller
    commits the driver artifacts FIRST — the standing round order."""
    res = subprocess.run(
        ["git", "status", "--porcelain", "--", "CORRECTNESS_r*.json"],
        capture_output=True, text=True, cwd=repo,
    )
    dirty = [ln[3:].strip() for ln in res.stdout.splitlines() if ln.strip()]
    if dirty:
        raise RuntimeError(
            "uncommitted CORRECTNESS artifacts — commit the driver round "
            f"artifacts before freezing a window: {dirty}"
        )
    return dirty


def build_ledger() -> tuple[list[dict], int]:
    from etl_fuel_priceguide_ec2_spark.registry import base

    assert_artifacts_tracked()

    names = list(base._ordered())
    reg_order = {n: i for i, n in enumerate(base._REGISTRY)}

    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)

    current_round = (max(rounds) if rounds else 0) + 1
    ledger = []
    for n in names:
        last_green = None
        last_seen = None
        for r in sorted(rounds):
            if n in rounds[r]:
                last_seen = r
                if _green(rounds[r][n]):
                    last_green = r
        ledger.append({
            "query": n,
            "last_green_round": last_green,
            "last_seen_round": last_seen,
            "rounds_stale": (current_round - last_green) if last_green else None,
            "registry_order": reg_order.get(n, 10**9),
        })
    return ledger, current_round


def derive_window(ledger: list[dict]) -> list[str]:
    def key(e):
        # Never-seen first (inf staleness), then stalest, then registration order.
        stale = e["rounds_stale"]
        return (0 if stale is None else 1, -(stale or 0), e["registry_order"])

    return [e["query"] for e in sorted(ledger, key=key)][:WINDOW_SLOTS]


def main() -> None:
    ledger, current_round = build_ledger()
    out = {
        "current_round": current_round,
        "window_slots": WINDOW_SLOTS,
        "queries": [
            {k: v for k, v in e.items() if k != "registry_order"}
            for e in ledger
        ],
    }
    path = os.path.join(REPO, "LEDGER.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    never = [e["query"] for e in ledger if e["last_green_round"] is None]
    print(f"round being frozen: r{current_round:02d}")
    print(f"registry: {len(ledger)} queries; never-driver-green: {len(never)}")
    if "--window" in sys.argv:
        for i, n in enumerate(derive_window(ledger), 1):
            e = next(x for x in ledger if x["query"] == n)
            print(f"{i:3d}. {n}  (last_green={e['last_green_round']})")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
