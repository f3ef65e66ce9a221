"""Schema evolution on read: fragments written before the ``source``
column existed roll up under ``__legacy__`` instead of failing the scan;
fragments missing a MANDATORY column (doc_id / n_tok) quarantine as a
whole, counted — never silently dropped, never a crashed job. The 100 TB
posture: corpora accrete over schema versions, and re-ingesting
petabytes to backfill one column is not a plan."""

from __future__ import annotations

import glob
import json
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from tsrollup.ingest import LEGACY_SOURCE, QUARANTINE_SOURCE
from tsrollup.synth import write_synth_parquet


def _strip_column(path: str, col: str) -> int:
    """Rewrite a parquet fragment without ``col``; returns its row count."""
    t = pq.read_table(path)
    pq.write_table(t.drop_columns([col]), path)
    return t.num_rows


def test_legacy_and_mandatory_missing_fragments(tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    write_synth_parquet(str(src), seed=7, n_sources=3, base_span=512,
                        rows_per_chunk=400)
    frags = sorted(glob.glob(str(src / "*.parquet")))
    assert len(frags) >= 3
    n_legacy = _strip_column(frags[0], "source")
    n_broken = _strip_column(frags[1], "n_tok")

    # the job runs in a subprocess (it owns its own ray.init)
    r = subprocess.run(
        [sys.executable, "-m", "tsrollup.job", "--input", str(src),
         "--out", str(out), "--num-cpus", "4"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    rolled = pq.read_table(
        glob.glob(str(out / "1m" / "rolled" / "**" / "*.parquet"),
                  recursive=True))
    df = rolled.to_pandas()
    legacy = df[df["source"] == LEGACY_SOURCE]
    assert legacy["n_rows"].sum() == n_legacy  # every legacy row rolled

    # quarantine carries the unreadable fragment's FULL row count in the
    # committed lineage (manifest.json at the output root)
    manifest = json.load(open(out / "manifest.json"))
    q = manifest["tiers"]["1m"]["lineage"].get(QUARANTINE_SOURCE)
    assert q is not None and q["quarantined_rows"] == n_broken

    # real sources are untouched by either degraded fragment: the sum of
    # all rolled real+legacy rows equals the readable input rows
    real = df[~df["source"].isin([QUARANTINE_SOURCE, LEGACY_SOURCE])]
    total_in = sum(pq.ParquetFile(f).metadata.num_rows
                   for f in frags if f != frags[1])
    assert real["n_rows"].sum() + legacy["n_rows"].sum() == total_in
    assert n_broken >= 1
