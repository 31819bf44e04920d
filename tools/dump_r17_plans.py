"""Dump .explain("formatted") for a list of queries into plans/r17/.

Usage: python tools/dump_r17_plans.py <suffix> <name> [name ...]
Writes plans/r17/<name>_<suffix>.txt for each. Explain only — though a
builder that pins (localCheckpoint) runs its pin jobs during the build;
never time anything concurrently.
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
OUT = Path(__file__).resolve().parent.parent / "plans" / "r17"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_session("dump-r17-plans")
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
