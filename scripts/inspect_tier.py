"""Committed-tier inspector — the engine's answer to the reference's Kafka
console monitor (ref real_time_monitoring.py:42-79): read a tier's rolled and
points parquet, print per-source summaries, and decode a Gorilla block to
prove round-trip on the committed bytes. Pure pyarrow/duckdb (no Ray).

    python scripts/inspect_tier.py <out_root> [tier] [--verify-all]

``--verify-all`` decodes EVERY committed Gorilla block in one vectorized
pass and verifies round-trip against the stored plain columns; it may be
given in any position (flags are never consumed as the tier positional).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.dataset as pads

from tsrollup import gorilla
from tsrollup.lineage import load_manifest


def main() -> int:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_root = pos[0]
    tier = pos[1] if len(pos) > 1 else "1m"
    man = load_manifest(out_root)
    rec = man["tiers"].get(tier)
    if not rec:
        print(f"tier {tier!r} not committed; manifest has {sorted(man['tiers'])}")
        return 1
    print(f"tier {tier}: config={rec['config_hash']} input={rec['input_fingerprint']}")
    from tsrollup.lineage import tier_provenance

    prov = tier_provenance(out_root, tier)
    if prov:
        n_frag = len(prov.get("fragments") or [])
        agree = prov.get("input_fingerprint") == rec.get("input_fingerprint")
        print(
            f"provenance: {n_frag} input fragments, now_1m={prov.get('now_1m')}"
            + ("" if agree else "  [WARNING: manifest lags the committed data]")
        )
    for src, info in sorted(rec["lineage"].items()):
        print(f"  {src}: {json.dumps(info)}")

    pts_dir = os.path.join(out_root, tier, "points")
    if os.path.isdir(pts_dir):
        t = pads.dataset(pts_dir, format="parquet", partitioning="hive").to_table()
        print(f"points: {t.num_rows} windows")
        if t.num_rows and "--verify-all" in sys.argv:
            # decode EVERY committed block in one vectorized pass and
            # verify round-trip against the stored plain columns
            import time

            t0 = time.time()
            blks = t["gorilla"].to_pylist()
            ts, vals, off = gorilla.decode_concat(blks)
            vcol = t["values"].combine_chunks()
            flat_v = np.asarray(vcol.flatten(), dtype=np.float64)
            kcol = t["kept_idx"].combine_chunks()
            flat_k = np.asarray(kcol.flatten(), dtype=np.int64)
            sb = t["start_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            lens = np.diff(off)
            ok = (
                np.array_equal(lens, np.diff(np.asarray(vcol.offsets)))
                and np.array_equal(vals.view(np.uint64), flat_v.view(np.uint64))
                and np.array_equal(ts, np.repeat(sb, lens) + flat_k)
            )
            print(
                f"verify-all: {t.num_rows} blocks / {len(vals)} points "
                f"decoded+verified in {time.time() - t0:.2f}s "
                f"roundtrip_ok={bool(ok)}"
            )
            if not ok:
                return 1
        elif t.num_rows:
            i = 0
            blk = t["gorilla"][i].as_py()
            ts, vals = gorilla.decode(blk)
            kept = np.asarray(t["kept_idx"][i].as_py())
            ok = np.array_equal(vals, np.asarray(t["values"][i].as_py()))
            print(
                f"sample window: source={t['source'][i].as_py()} start_bucket="
                f"{t['start_bucket'][i].as_py()} kept={len(kept)}/{t['n_in'][i].as_py()} "
                f"gorilla={len(blk)}B (raw {16 * len(vals)}B) roundtrip_ok={ok}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
