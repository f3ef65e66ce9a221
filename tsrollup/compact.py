"""Committed-tier compaction — the maintenance half of incremental appends.

Each ``--watch`` / incremental-append cycle adds one parquet file per merged
fragment to every (tier, source) hive partition (job.py:322), so a
long-lived output accumulates many small files and every later read pays
per-file open cost. ``compact_tier`` rewrites a committed tier's partitions
into size-bounded files while preserving:

- **row content** — files merge by concatenation only; tests assert DuckDB
  ``EXCEPT`` emptiness and byte-identical lineage checksums before/after;
- **provenance** — ``_PROVENANCE.json`` is copied verbatim (config hash,
  input fingerprint, fragment list), so resume/append semantics are
  untouched: the next incremental run sees exactly the fragments it saw
  before compaction;
- **atomicity** — the compacted tree is staged beside the tier and swapped
  in with the same rename discipline as ``lineage.commit_tier``; a crash
  at any point leaves either the old or the new complete tier.

Unchanged partitions (already a single file, or every planned run a
singleton) are HARDLINKED into the staged tree, not copied — compaction of
an already-compact tier is a metadata-only no-op.

The reference engine has no maintenance path at all (its sink is a Kafka
topic, core/kafka_pipeline.py); this closes the operational loop of the
repo's own per-fragment append design. Scale note: partitions compact
independently — at cluster scale each (tier, source) partition is an
independent Ray task's worth of work; this module keeps the loop
sequential because rolled tiers are >=60x reduced and the per-partition
work is one streaming parquet read/write.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from tsrollup.lineage import (
    PROVENANCE,
    lineage_from_rolled,
    load_manifest,
    _store_manifest,
    tier_provenance,
)

DEFAULT_TARGET_BYTES = 128 << 20


def _plan_runs(files: list[tuple[str, int]], target: int) -> list[list[str]]:
    """Greedy size-bounded runs over (path, size), deterministic by the
    sorted file order the caller provides."""
    runs: list[list[str]] = []
    cur: list[str] = []
    size = 0
    for f, sz in files:
        if cur and size + sz > target:
            runs.append(cur)
            cur, size = [], 0
        cur.append(f)
        size += sz
    if cur:
        runs.append(cur)
    return runs


def _compact_partition(src_dir: str, dst_dir: str, target: int) -> tuple[int, int]:
    """Compact one hive partition dir into ``dst_dir``; returns
    (files_before, files_after). Singleton runs hardlink; multi-file runs
    merge into one parquet file each."""
    os.makedirs(dst_dir, exist_ok=True)
    for entry in sorted(os.listdir(src_dir)):  # sidecars travel verbatim
        p = os.path.join(src_dir, entry)
        if os.path.isfile(p) and not entry.endswith(".parquet"):
            os.link(p, os.path.join(dst_dir, entry))
    files = sorted(
        (os.path.join(src_dir, f), os.path.getsize(os.path.join(src_dir, f)))
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    runs = _plan_runs(files, target)
    for i, run in enumerate(runs):
        if len(run) == 1:
            dst = os.path.join(dst_dir, os.path.basename(run[0]))
            os.link(run[0], dst)
        else:
            merged = pa.concat_tables([pq.read_table(f) for f in run])
            pq.write_table(merged, os.path.join(dst_dir, f"compact-{i:06d}.parquet"))
    return len(files), len(runs)


def compact_tier(
    out_root: str,
    tier: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Compact every kind dir (rolled/points/...) of a committed tier.
    Returns {"kinds": {kind: {"files_before": n, "files_after": m}},
    "changed": bool}. Raises if the tier has no committed provenance."""
    tier_dir = os.path.join(out_root, tier)
    prov = tier_provenance(out_root, tier)
    if prov is None:
        raise ValueError(f"tier {tier!r} has no committed provenance at {tier_dir}")

    tmp_dir = os.path.join(out_root, f".compact-{tier}-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp_dir)
    report: dict = {"kinds": {}, "changed": False}
    try:
        for kind in sorted(os.listdir(tier_dir)):
            src_kind = os.path.join(tier_dir, kind)
            if not os.path.isdir(src_kind):
                continue
            before = after = 0
            for part in sorted(os.listdir(src_kind)):
                src_part = os.path.join(src_kind, part)
                if not os.path.isdir(src_part):
                    continue
                b, a = _compact_partition(
                    src_part, os.path.join(tmp_dir, kind, part), target_bytes
                )
                before += b
                after += a
            report["kinds"][kind] = {"files_before": before, "files_after": after}
            if after != before:
                report["changed"] = True
        if not report["changed"]:
            shutil.rmtree(tmp_dir)
            return report
        # any file the tier carries beyond the partition dirs (provenance,
        # sidecar metadata a future writer might add) travels VERBATIM —
        # compaction only ever merges partition parquet files
        for kind in sorted(os.listdir(tier_dir)):
            src_kind = os.path.join(tier_dir, kind)
            if os.path.isfile(src_kind):
                shutil.copyfile(src_kind, os.path.join(tmp_dir, kind))
            else:
                for entry in sorted(os.listdir(src_kind)):
                    p = os.path.join(src_kind, entry)
                    if os.path.isfile(p):
                        os.link(p, os.path.join(tmp_dir, kind, entry))
        old_dir = os.path.join(out_root, f".old-{tier}-{uuid.uuid4().hex[:8]}")
        os.rename(tier_dir, old_dir)
        try:
            os.rename(tmp_dir, tier_dir)
        except BaseException:
            # restore the original tier before propagating: a failed swap
            # must never leave the canonical path empty
            os.rename(old_dir, tier_dir)
            raise
        shutil.rmtree(old_dir)
    except BaseException:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise

    # manifest lineage refresh: content-derived sums are invariant under
    # compaction, so this re-read doubles as a row-preservation audit
    manifest = load_manifest(out_root)
    rec = manifest["tiers"].get(tier)
    if rec is not None:
        rec["lineage"] = lineage_from_rolled(os.path.join(tier_dir, "rolled"))
        rec["compacted"] = report["kinds"]
        _store_manifest(out_root, manifest)
    return report


def compact(out_root: str, tiers=None,
            target_bytes: int = DEFAULT_TARGET_BYTES) -> dict:
    """Compact every committed tier under ``out_root`` (or the given
    subset); tiers without provenance are skipped with a note."""
    if tiers is None:
        tiers = sorted(
            d for d in os.listdir(out_root)
            if os.path.isfile(os.path.join(out_root, d, PROVENANCE))
        )
    out = {}
    for tier in tiers:
        try:
            out[tier] = compact_tier(out_root, tier, target_bytes)
        except ValueError as e:
            out[tier] = {"skipped": str(e)}
    return out
