"""Lineage records, atomic tier commits, and checkpoint resume.

Implements what the reference's README claims but its code omits — there is no
``enable_checkpointing`` anywhere in the reference (ref README.md:48 vs
core/streaming_pipeline.py) — and upgrades its AT_LEAST_ONCE duplicate-prone
sink (ref core/streaming_pipeline.py:356) to idempotent committed partitions:

- each tier writes to ``{out_root}/{tier}/.tmp-*`` and is atomically renamed
  into place, so a killed run never leaves a half-visible tier;
- a ``manifest.json`` at the output root lists committed tiers with the
  config hash, input fingerprint, per-source lineage records (row counts,
  token sums, wrapping checksums, quarantine counts) — written via
  tmp-file + ``os.replace`` (atomic on POSIX);
- resume = load manifest, skip tiers whose (config_hash, input_fingerprint)
  match, recompute the rest (SURVEY §7.7).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import numpy as np
import pyarrow.dataset as pads

from tsrollup.config import RollupConfig
from tsrollup.ingest import QUARANTINE_SOURCE

MANIFEST = "manifest.json"


def _fragment_entries(paths: list[str]) -> list[tuple[str, str, int, int]]:
    """ONE definition of 'which files constitute the input': sorted
    (abs_path, rel_key, size, mtime_ns) tuples via ingest.list_parquet_files —
    both the fingerprint and the fragment list derive from this walk, so they
    can never disagree about the input's membership. mtime_ns rides along for
    fragment_delta's move-stable matching only (rename/move preserves it; a
    different file that coincidentally shares rel+size won't share it);
    input_fingerprint deliberately ignores it."""
    from tsrollup.ingest import list_parquet_files

    entries: list[tuple[str, str, int, int]] = []
    for p in sorted(paths):
        is_dir = os.path.isdir(p)
        for fp in list_parquet_files(p):
            rel = os.path.relpath(fp, p) if is_dir else os.path.basename(fp)
            st = os.stat(fp)
            entries.append((os.path.abspath(fp), rel, st.st_size, st.st_mtime_ns))
    return sorted(entries)


def input_fingerprint(paths: list[str]) -> str:
    """Cheap, stable fingerprint of the input: sorted (rel_path, size) pairs
    (relative keys, so the fingerprint survives moving the input root)."""
    import hashlib

    entries = [[rel, size] for _, rel, size, _mt in _fragment_entries(paths)]
    return hashlib.sha256(json.dumps(entries).encode()).hexdigest()[:16]


def input_fragments(paths: list[str]) -> list[list]:
    """Per-fragment identity of the input: sorted [abs_path, rel_key, size,
    mtime_ns] — recorded in each tier's provenance (SURVEY §7.7
    ``input_fragment_ids``) so a later run can diff WHICH fragments changed
    instead of invalidating every tier on any input change. rel_key is the
    same root-relative identity ``input_fingerprint`` hashes and mtime_ns is
    preserved by rename/move, so the append-only diff survives moving the
    input root without trusting (rel, size) alone."""
    return sorted([ap, rel, size, mt] for ap, rel, size, mt in _fragment_entries(paths))


def fragment_delta(committed: list | None, current: list) -> list[str] | None:
    """APPEND-ONLY diff: the new fragment abs paths if every committed
    fragment is still present with the same size, else None (modified or
    removed inputs fall back to a full recompute).

    Matching identity is (rel_key, size, mtime_ns) — exact and move-stable:
    rename/relocate preserves all three (POSIX rename and shutil.move keep
    mtime), so a committed base isn't thrown away just because its mount
    point moved, while a DIFFERENT file that coincidentally shares rel+size
    (the review's replaced-root hazard) won't share the nanosecond mtime
    and falls back to a full recompute. Rel matching additionally requires
    rel keys to be UNIQUE on both sides — a multi-root input can repeat a
    basename (part-000.parquet per day dir), and a dict keyed on a
    colliding rel could mask a genuinely new or modified fragment; on
    collision the diff matches exact abs paths instead. Older provenance
    ([abs, size] or [abs, rel, size]) also matches by abs path.
    Deliberately NOT a statistics-based content fingerprint: parquet
    footer stats (num_rows, min/max) cannot see a row rewrite inside the
    min/max envelope, and a false "unchanged" here silently corrupts every
    committed tier. Note OUTPUT-tier compaction (--compact) never reaches
    this code path at all: it copies ``_PROVENANCE.json`` verbatim, so the
    next append diffs against exactly the pre-compaction base (pinned by
    test_compact.test_append_compact_append_reuses_points)."""
    if not committed:
        return None
    new_format = len(committed[0]) == 4
    rel_unique = new_format and (
        len({e[1] for e in committed}) == len(committed)
        and len({e[1] for e in current}) == len(current)
    )
    if rel_unique:
        # identity = (rel, size, mtime_ns); value = presence
        cur = {(rel, size, mt) for _ap, rel, size, mt in current}
        com = {(rel, size, mt) for _ap, rel, size, mt in committed}
        if not com <= cur:
            return None
        com_rels = {rel for _ap, rel, _s, _mt in committed}
        return [ap for ap, rel, _s, _mt in current if rel not in com_rels]
    # abs-path matching: legacy formats, or rel-key collisions
    # (2-field entries carry size at e[1]; 3/4-field at e[2])
    def _size(e):
        return e[1] if len(e) == 2 else e[2]

    cur_abs = {e[0]: _size(e) for e in current}
    for e in committed:
        if cur_abs.get(e[0]) != _size(e):
            return None
    com_keys = {e[0] for e in committed}
    return [e[0] for e in current if e[0] not in com_keys]


def load_manifest(out_root: str) -> dict:
    p = os.path.join(out_root, MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"tiers": {}}


def _store_manifest(out_root: str, manifest: dict) -> None:
    os.makedirs(out_root, exist_ok=True)
    tmp = os.path.join(out_root, f".{MANIFEST}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_root, MANIFEST))


def tier_committed(out_root: str, tier: str, cfg: RollupConfig, fingerprint: str) -> bool:
    rec = load_manifest(out_root)["tiers"].get(tier)
    return bool(
        rec
        and rec.get("config_hash") == cfg.config_hash(tier)
        and rec.get("input_fingerprint") == fingerprint
        and os.path.isdir(os.path.join(out_root, tier))
    )


def tier_path(out_root: str, tier: str, kind: str) -> str:
    return os.path.join(out_root, tier, kind)


def lineage_from_rolled(rolled_dir: str) -> dict:
    """Per-source lineage computed from the *committed* parquet (re-read from
    disk, so the record describes what is actually durable). Rolled tiers are
    tiny (>=60x reduction), so this is a metadata-scale scan."""
    from tsrollup.hashing import safe_factorize

    ds = pads.dataset(rolled_dir, format="parquet", partitioning="hive")
    if not ds.files:  # empty tier (e.g. empty input)
        return {}
    t = ds.to_table(columns=["source", "bucket", "n_rows", "sum_tok", "chk"])
    codes, uniques = safe_factorize(t["source"].to_numpy(zero_copy_only=False))
    lineage: dict[str, dict] = {}
    n_rows = t["n_rows"].to_numpy(zero_copy_only=False)
    sum_tok = t["sum_tok"].to_numpy(zero_copy_only=False)
    chk = t["chk"].to_numpy(zero_copy_only=False)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        for i, s in enumerate(uniques):
            m = codes == i
            if s == QUARANTINE_SOURCE:
                lineage[str(s)] = {"quarantined_rows": int(chk[m].sum())}
                continue
            lineage[str(s)] = {
                "buckets": int(m.sum()),
                "row_count": int(n_rows[m].sum()),
                "token_sum": int(sum_tok[m].sum()),
                "checksum": int(np.int64(chk[m].sum())),
                "bucket_min": int(bucket[m].min()),
                "bucket_max": int(bucket[m].max()),
            }
    return lineage


PROVENANCE = "_PROVENANCE.json"


def tier_provenance(out_root: str, tier: str) -> dict | None:
    """The provenance record stored INSIDE the committed tier directory —
    written before the atomic rename, so it can never disagree with the data
    it sits next to. The incremental-append path MUST key off this, not the
    manifest: the manifest is written after the rename, and a crash between
    the two would otherwise make the next run re-merge a fragment the
    directory already contains (silent double-count)."""
    p = os.path.join(out_root, tier, PROVENANCE)
    try:
        with open(p) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        # a truncated/empty provenance file (crash mid-write, power loss)
        # must degrade to "no provenance" -> full recompute, never crash
        # every subsequent resume run
        return None


def commit_tier(
    out_root: str,
    tier: str,
    staged: dict[str, str],
    cfg: RollupConfig,
    fingerprint: str,
    extra: dict | None = None,
) -> dict:
    """Atomically publish staged dirs ({kind: tmp_path}) as ``out_root/tier/{kind}``
    and record lineage in the manifest. Provenance (config hash, input
    fingerprint, fragment list) travels INSIDE the renamed directory so data
    and provenance commit in one atomic step."""
    final_tier_dir = os.path.join(out_root, tier)
    tmp_tier_dir = os.path.join(out_root, f".tmp-tier-{tier}-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp_tier_dir, exist_ok=True)
    for kind, src_path in staged.items():
        os.rename(src_path, os.path.join(tmp_tier_dir, kind))
    prov = {
        "config_hash": cfg.config_hash(tier),
        "input_fingerprint": fingerprint,
    }
    if extra:
        prov.update({k: v for k, v in extra.items() if k in ("fragments", "now_1m")})
    with open(os.path.join(tmp_tier_dir, PROVENANCE), "w") as f:
        json.dump(prov, f)
        f.flush()
        os.fsync(f.fileno())  # durable before the atomic tier rename
    if os.path.isdir(final_tier_dir):
        shutil.rmtree(final_tier_dir)
    os.rename(tmp_tier_dir, final_tier_dir)

    record = {
        "tier": tier,
        "config_hash": cfg.config_hash(tier),
        "input_fingerprint": fingerprint,
        "committed_at": time.time(),
        "lineage": lineage_from_rolled(os.path.join(final_tier_dir, "rolled")),
    }
    if extra:
        record.update(extra)
    manifest = load_manifest(out_root)
    manifest["tiers"][tier] = record
    _store_manifest(out_root, manifest)
    return record


def staging_dir(out_root: str, tier: str, kind: str) -> str:
    p = os.path.join(out_root, f".stage-{tier}-{kind}-{uuid.uuid4().hex[:8]}")
    os.makedirs(p, exist_ok=True)
    return p


def clean_stale_staging(out_root: str) -> int:
    """Remove .stage-*/.tmp-* leftovers from killed runs (commits are atomic
    renames, so anything still prefixed is garbage). Returns count removed."""
    n = 0
    if not os.path.isdir(out_root):
        return 0
    for name in os.listdir(out_root):
        if name.startswith((".stage-", ".tmp-")):
            shutil.rmtree(os.path.join(out_root, name), ignore_errors=True)
            n += 1
    return n
