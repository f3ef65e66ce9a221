"""Golden value-hash gate for the rows-only queries (round-4 VERDICT next
#7): every ``queries()`` entry WITHOUT an ``oracle_sql()`` counterpart is
semantically un-SQL-able (wavelet points, Gorilla, LTTB, MinHash, LSH ANN,
fingerprints, sketches), so the driver's gate only checks row counts — a
silent semantic drift would pass. This pins each one's FULL canonical
output hash on the sf0.01 fixture (committed goldens, generated and
run-stability-verified by scripts/gen_rows_only_goldens.py).

If an intentional semantic change breaks a hash: re-run the generator,
eyeball the diff, and commit the new golden alongside the change.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from check_queries import to_pandas, value_hash  # noqa: E402
from gen_rows_only_goldens import PARALLELISM_SENSITIVE  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
GOLDENS_PATH = os.path.join(ROOT, "tests", "goldens", "rows_only_sf001.json")

with open(GOLDENS_PATH) as _f:
    GOLDENS = json.load(_f)


def test_goldens_cover_every_rows_only_query(ray_session):
    """A new rows-only query must ship with its golden (run the generator)."""
    import __ray_entry__ as e

    rows_only = {n for n in e.queries() if n not in e.oracle_sql()}
    missing = rows_only - set(GOLDENS)
    stale = set(GOLDENS) - rows_only
    assert not missing, f"rows-only queries without goldens: {sorted(missing)}"
    assert not stale, f"goldens for queries that no longer exist: {sorted(stale)}"


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_rows_only_golden(ray_session, name):
    import __ray_entry__ as e

    df = to_pandas(e.queries()[name](SF_DIR))
    g = GOLDENS[name]
    assert len(df) == g["rows"], f"{name}: rows {len(df)} != golden {g['rows']}"
    assert sorted(map(str, df.columns)) == g["cols"], (
        f"{name}: columns {sorted(df.columns)} != golden {g['cols']}")
    if name in PARALLELISM_SENSITIVE:
        return
    assert value_hash(df) == g["hash"], (
        f"{name}: value hash drifted — if intentional, re-run "
        f"scripts/gen_rows_only_goldens.py and commit the new golden")
