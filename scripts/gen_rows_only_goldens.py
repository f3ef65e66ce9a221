"""Generate the committed golden value-hashes for every rows-only query
(queries() entries with no oracle_sql() counterpart — wavelet points,
Gorilla, LTTB, MinHash, LSH ANN, fingerprints, ...). Round-4 VERDICT next
#7: these are semantically un-SQL-able, so a silent semantic drift would
pass the driver's rows-only check; pinning the full-output hash on the
sf0.01 fixture makes any drift loud (tests/test_rows_only_goldens.py).

Usage:  python scripts/gen_rows_only_goldens.py [sf_dir]
Writes: tests/goldens/rows_only_sf001.json   (sorted, committed)

Run it twice and diff if you suspect nondeterminism — every entry here
was verified run-stable before being committed.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from check_queries import to_pandas, value_hash  # noqa: E402

OUT = os.path.join(ROOT, "tests", "goldens", "rows_only_sf001.json")

# sketch outputs whose VALUES legitimately depend on the session's
# parallelism (block count changes the sketch merge order): golden-pin
# rows+columns only — hash recorded as null so regeneration under any
# session width never shows a spurious diff. The accuracy contract is
# pinned separately (test_functions.test_quantiles_kll_close_to_exact).
# tests/test_rows_only_goldens.py imports this as the single source.
PARALLELISM_SENSITIVE = {"quantiles_kll"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from tsrollup.util import tune_ray_data

    tune_ray_data()

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    rows_only = [n for n in qs if n not in sqls]
    goldens: dict[str, dict] = {}
    for name in rows_only:
        t0 = time.time()
        df = to_pandas(qs[name](sf_dir))
        h = None if name in PARALLELISM_SENSITIVE else value_hash(df)
        goldens[name] = {"rows": int(len(df)),
                         "cols": sorted(map(str, df.columns)),
                         "hash": h}
        print(f"{name}: {len(df)} rows, {h} ({time.time()-t0:.1f}s)")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(dict(sorted(goldens.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {len(goldens)} goldens -> {OUT}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
