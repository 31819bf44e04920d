"""The external driver's result canonicalization, as ONE shared
implementation.

The driver compares Spark vs DuckDB oracle results by sorting columns
by name, normalizing each value (floats: NaN -> "NaN", else
``round(v, 9)``), sorting rows on a type-stable key, and hashing
``repr(tuple)`` per row. ``repr`` is the load-bearing detail: it
distinguishes ``-0.0`` from ``0.0`` even though they are ``==``-equal
— exactly the class of mismatch that slipped through round 9's
local harness (``embedding_covariance``: DuckDB ROUND emitted ``-0.0``
where Spark emitted ``+0.0``; pytest compared with ``==`` and passed,
the driver repr-hashed and failed). VERDICT r09 items 2-3.

Both ``tests/test_queries_oracle.py`` and
``tools/drive_driver_contract.py`` import from here so the local gate
can never again be weaker than the driver's.
"""

from __future__ import annotations

import hashlib
import math


def norm_value(v):
    """Driver value normalization: floats become ``round(v, 9)``
    (NaN -> the string "NaN"); everything else passes through."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def rowset(rows, colnames):
    """Rows as column-name-sorted, value-normalized tuples, sorted on
    a type-stable key (both sides use the same key, so equality of the
    sorted sequences is unaffected by the key's choice)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    tuples = [tuple(norm_value(r[i]) for i in order) for r in rows]
    tuples.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return tuples


def row_reprs(rows, colnames):
    """The exact per-row strings the driver hashes — compare THESE in
    tests (not the tuples) so ``repr``-level differences like
    ``-0.0`` vs ``0.0`` fail locally exactly as they would fail the
    driver."""
    return [repr(t) for t in rowset(rows, colnames)]


def rowhash(rows, colnames):
    """The driver's value hash: sha256 over the repr of each
    canonicalized row."""
    h = hashlib.sha256()
    for s in row_reprs(rows, colnames):
        h.update(s.encode())
    return h.hexdigest()
