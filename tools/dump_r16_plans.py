"""Dump .explain("formatted") for a list of queries into plans/r16/.

Usage: python tools/dump_r16_plans.py <suffix> <name> [name ...]
Writes plans/r16/<name>_<suffix>.txt for each. Explain only — no jobs run
(safe to run beside a timed session only when suffix capture is all we
need; never time anything concurrently).
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_fuel_priceguide_ec2_spark import registry
from etl_fuel_priceguide_ec2_spark.session import get_session

SF_DIR = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r16"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_session("dump-r16-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (OUT / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
