"""Checkpoint/resume + retention semantics (SURVEY §7.7, FIXTURES invariant 2:
identical output after a kill/resume cycle; committed tiers not recomputed)."""

import json
import os
import shutil

import pandas as pd
import pytest

from tsrollup import job, lineage, oracle
from tsrollup.config import RollupConfig


def _rolled(out_root, tier):
    df = job.read_tier(out_root, tier, "rolled").to_pandas()
    return df[df.source != "__quarantine__"].reset_index(drop=True)[oracle.ROLLED_COLUMNS]


def test_partial_run_then_resume_matches_full_run(ray_session, tiny_input_dir, tmp_path):
    """Simulated kill after the 1m commit: a fresh run resumes, skips 1m, and
    the final tiers equal a from-scratch full run bit-for-bit."""
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    # "killed" run: only 1m committed
    job.run(tiny_input_dir, RollupConfig(out_root=out_a, tiers=("1m",)))
    mtimes = _tree_mtimes(os.path.join(out_a, "1m"))
    # resumed run with all tiers
    res = job.run(tiny_input_dir, RollupConfig(out_root=out_a))
    assert res["1m"]["skipped"] is True
    assert res["1h"]["skipped"] is False and res["1d"]["skipped"] is False
    assert _tree_mtimes(os.path.join(out_a, "1m")) == mtimes  # not rewritten
    # reference full run
    job.run(tiny_input_dir, RollupConfig(out_root=out_b))
    for tier in ("1m", "1h", "1d"):
        pd.testing.assert_frame_equal(_rolled(out_a, tier), _rolled(out_b, tier))


def _tree_mtimes(root):
    out = {}
    for r, _, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


def test_config_change_forces_recompute(ray_session, tiny_input_dir, tmp_path):
    out = str(tmp_path / "out")
    job.run(tiny_input_dir, RollupConfig(out_root=out, tiers=("1m",)))
    res = job.run(
        tiny_input_dir, RollupConfig(out_root=out, tiers=("1m",), gapfill_method="ffill")
    )
    assert res["1m"]["skipped"] is False


def test_input_change_forces_recompute(ray_session, tiny_input_dir, tiny_table, tmp_path):
    import pyarrow.parquet as pq

    d = tmp_path / "in"
    shutil.copytree(tiny_input_dir, d)
    out = str(tmp_path / "out")
    job.run(str(d), RollupConfig(out_root=out, tiers=("1m",)))
    pq.write_table(tiny_table.slice(0, 10), str(d / "c.parquet"))  # new fragment
    res = job.run(str(d), RollupConfig(out_root=out, tiers=("1m",)))
    assert res["1m"]["skipped"] is False


def test_manifest_is_valid_json_with_lineage(ray_session, tiny_input_dir, tmp_path):
    out = str(tmp_path / "out")
    cfg = RollupConfig(out_root=out, tiers=("1m",))
    job.run(tiny_input_dir, cfg)
    with open(os.path.join(out, lineage.MANIFEST)) as f:
        m = json.load(f)
    rec = m["tiers"]["1m"]
    assert rec["config_hash"] == cfg.config_hash("1m")
    assert "src00" in rec["lineage"]
    assert rec["lineage"]["src00"]["row_count"] > 0


def test_retention_prunes_old_buckets(ray_session, tiny_input_dir, tmp_path):
    """1m keeps only the last 60 buckets; 1h/1d keep everything."""
    cfg = RollupConfig(
        out_root=str(tmp_path / "out"),
        retention_buckets={"1m": 60, "1h": None, "1d": None},
    )
    job.run(tiny_input_dir, cfg)
    r1m = _rolled(cfg.out_root, "1m")
    full = job.read_tier(cfg.out_root, "1m", "rolled_full").to_pandas()
    full = full[full.source != "__quarantine__"]
    now_bucket = int(full["bucket"].max())
    assert r1m["bucket"].min() >= now_bucket - 60
    assert len(r1m) < len(full)
    # the cascade saw the FULL 1m data: 1d totals equal full 1m totals
    r1d = _rolled(cfg.out_root, "1d")
    assert r1d["n_rows"].sum() == full["n_rows"].sum()


def test_rerun_is_idempotent_byte_identical(ray_session, tiny_input_dir, tmp_path):
    """Two from-scratch runs produce identical committed logical content."""
    outs = []
    for name in ("x", "y"):
        cfg = RollupConfig(out_root=str(tmp_path / name), tiers=("1m",))
        job.run(tiny_input_dir, cfg)
        outs.append(_rolled(cfg.out_root, "1m"))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_stale_staging_cleanup(ray_session, tiny_input_dir, tmp_path):
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, ".stage-1m-rolled-deadbeef"))
    job.run(tiny_input_dir, RollupConfig(out_root=out, tiers=("1m",)))
    assert not [d for d in os.listdir(out) if d.startswith(".stage-")]


def test_config_from_yaml(tmp_path):
    from tsrollup.config import RollupConfig

    y = tmp_path / "cfg.yaml"
    y.write_text("wavelet: haar\ntiers: ['1m', '1h']\ngapfill_method: ffill\n")
    cfg = RollupConfig.from_yaml(str(y))
    assert cfg.wavelet == "haar" and cfg.tiers == ("1m", "1h")
    y.write_text("nope: 1\n")
    import pytest as _pt

    with _pt.raises(ValueError):
        RollupConfig.from_yaml(str(y))


def test_retention_on_cascaded_tiers_matches_oracle(ray_session, tmp_path):
    """Round-2 regression (ADVICE job.py:108): retention horizons on 1h/1d must
    compute the cutoff from the 1m-unit 'now', not the tier's own bucket units.
    The engine must equal oracle.apply_retention on every tier, and the 1h/1d
    horizons must actually prune (a 3-day span makes that non-vacuous)."""
    import pyarrow.parquet as pq

    from tsrollup.config import TIER_FACTORS
    from tsrollup.synth import synth_table

    t = synth_table(seed=7, n_sources=2, base_span=86400 * 2 + 7200)
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(t, str(d / "a.parquet"))
    cfg = RollupConfig(
        out_root=str(tmp_path / "out"),
        retention_buckets={"1m": 600, "1h": 1500, "1d": 1300},
    )
    job.run(str(d), cfg)
    golden = oracle.pipeline(t, cfg)
    now_1m = int(golden["rolled_1m"]["bucket"].max())
    for tier in ("1m", "1h", "1d"):
        got = _rolled(cfg.out_root, tier)
        exp = golden[f"rolled_{tier}"].reset_index(drop=True)
        for c in exp.columns:
            got[c] = got[c].astype(exp[c].dtype)
        pd.testing.assert_frame_equal(got, exp, obj=tier)
        full = job.read_tier(cfg.out_root, tier, "rolled_full").to_pandas()
        full = full[full.source != "__quarantine__"]
        if tier in ("1m", "1h", "1d"):
            assert len(got) < len(full), f"{tier}: horizon pruned nothing"
        cutoff = (now_1m - cfg.retention_buckets[tier]) // TIER_FACTORS[tier]
        assert got["bucket"].min() >= cutoff, tier


def _pts(out, tier):
    return (
        job.read_tier(out, tier, "points").to_pandas()
        .sort_values(["source", "window_id"]).reset_index(drop=True)
    )


def _assert_tiers_equal(out_a, out_b, tiers=("1m", "1h", "1d")):
    import numpy as np

    for tier in tiers:
        a = job.read_tier(out_a, tier, "rolled").to_pandas().reset_index(drop=True)
        b = job.read_tier(out_b, tier, "rolled").to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(a[b.columns.tolist()], b, obj=f"rolled-{tier}")
        pa_, pb = _pts(out_a, tier), _pts(out_b, tier)
        assert len(pa_) == len(pb), tier
        for i in range(len(pb)):
            ga, gb = pa_.iloc[i], pb.iloc[i]
            assert (ga.source, ga.window_id, ga.start_bucket, ga.n_in, ga.n_filled) == (
                gb.source, gb.window_id, gb.start_bucket, gb.n_in, gb.n_filled
            ), (tier, i)
            np.testing.assert_array_equal(np.asarray(ga.kept_idx), np.asarray(gb.kept_idx))
            np.testing.assert_array_equal(np.asarray(ga["values"]), np.asarray(gb["values"]))
            assert bytes(ga.gorilla) == bytes(gb.gorilla), (tier, i)


def test_incremental_append_matches_from_scratch(ray_session, tmp_path):
    """Round-2 (VERDICT #4): appending ONE parquet fragment triggers the
    per-fragment incremental path — only the new fragment is scanned, only
    delta-touched windows are recomputed — and the final tiers equal a
    from-scratch run bit-for-bit."""
    import pyarrow.parquet as pq

    from tsrollup.synth import synth_table

    t = synth_table(seed=9, n_sources=3, base_span=43200)
    d = tmp_path / "in"
    d.mkdir()
    half = t.num_rows * 3 // 4
    pq.write_table(t.slice(0, half), str(d / "a.parquet"))
    out_i, out_f = str(tmp_path / "incr"), str(tmp_path / "full")
    r1 = job.run(str(d), RollupConfig(out_root=out_i))
    assert not r1["1m"].get("incremental")
    pq.write_table(t.slice(half), str(d / "b.parquet"))  # append one fragment
    r2 = job.run(str(d), RollupConfig(out_root=out_i))
    assert r2["1m"]["incremental"] is True
    # unchanged windows were NOT recomputed (the delta touches the tail only)
    assert r2["1m"]["points_reused"] > 0
    assert r2["1m"]["points_recomputed"] < r2["1m"]["points_reused"]
    job.run(str(d), RollupConfig(out_root=out_f))
    _assert_tiers_equal(out_i, out_f)


def test_incremental_append_with_retention_cutoff_move(ray_session, tmp_path):
    """The appended data advances 'now', moving every tier's retention
    cutoff: straddling windows recompute, the rest reuse; output still equals
    a from-scratch run bit-for-bit."""
    import pyarrow.parquet as pq

    from tsrollup.synth import synth_table

    t = synth_table(seed=13, n_sources=2, base_span=86400)
    d = tmp_path / "in"
    d.mkdir()
    half = t.num_rows * 2 // 3
    pq.write_table(t.slice(0, half), str(d / "a.parquet"))
    retention = {"1m": 700, "1h": 1100, "1d": None}
    out_i, out_f = str(tmp_path / "incr"), str(tmp_path / "full")
    job.run(str(d), RollupConfig(out_root=out_i, retention_buckets=retention))
    pq.write_table(t.slice(half), str(d / "b.parquet"))
    r2 = job.run(str(d), RollupConfig(out_root=out_i, retention_buckets=retention))
    assert r2["1m"]["incremental"] is True
    job.run(str(d), RollupConfig(out_root=out_f, retention_buckets=retention))
    _assert_tiers_equal(out_i, out_f)


def test_modified_fragment_falls_back_to_full_recompute(ray_session, tiny_input_dir, tiny_table, tmp_path):
    """A changed (not appended) fragment is NOT append-only: the engine falls
    back to the full scan and still produces the right answer."""
    import pyarrow.parquet as pq

    d = tmp_path / "in"
    shutil.copytree(tiny_input_dir, d)
    out = str(tmp_path / "out")
    job.run(str(d), RollupConfig(out_root=out, tiers=("1m",)))
    # REWRITE an existing fragment (size changes)
    pq.write_table(tiny_table.slice(0, 400), str(d / "a.parquet"))
    r = job.run(str(d), RollupConfig(out_root=out, tiers=("1m",)))
    assert r["1m"]["skipped"] is False
    assert not r["1m"].get("incremental")


def test_watch_tails_appended_fragments(ray_session, tmp_path):
    """Micro-batch streaming mode: the watcher folds a fragment appended
    mid-watch into the committed tiers via the incremental path."""
    import pyarrow.parquet as pq

    from tsrollup.synth import synth_table

    t = synth_table(seed=21, n_sources=2, base_span=4096)
    d = tmp_path / "in"
    d.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(d / "a.parquet"))
    cfg = RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",))
    ticks = []

    def _cb(res):
        ticks.append(res["1m"].get("incremental", False))
        if len(ticks) == 1:
            pq.write_table(t.slice(half), str(d / "b.parquet"))

    res = job.watch(str(d), cfg, iterations=2, poll_seconds=0.05, on_result=_cb)
    assert ticks == [False, True]  # first tick full, second incremental
    assert res["1m"]["incremental"] is True
    # committed == oracle over the FULL table after the second tick
    got = _rolled(cfg.out_root, "1m")
    exp = oracle.rollup_1m(t)
    for c in exp.columns:
        got[c] = got[c].astype(exp[c].dtype)
    pd.testing.assert_frame_equal(got, exp)


def test_incremental_append_merges_quarantine_counts(ray_session, tmp_path):
    """Malformed rows in an APPENDED fragment merge into the committed
    quarantine lineage (counts add, nothing silently dropped)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tsrollup.synth import synth_table

    t = synth_table(seed=31, n_sources=2, base_span=2048)
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(t, str(d / "a.parquet"))
    cfg = RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",))
    job.run(str(d), cfg)
    bad = pa.table(
        {
            "doc_id": pa.array(["srcXX-oops!", "srcXX-0000000007"]),
            "tokens": pa.array([[1], [1, 2]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([1, 99], type=pa.int32()),
            "source": pa.array(["srcXX", "srcXX"]),
        }
    )
    pq.write_table(bad, str(d / "b.parquet"))
    res = job.run(str(d), cfg)
    assert res["1m"]["incremental"] is True
    assert res["1m"]["lineage"]["__quarantine__"]["quarantined_rows"] == 2


def test_validate_tokens_false_prunes_token_read(ray_session, tiny_input_dir, tiny_table, tmp_path):
    """validate_tokens=False reads only the rollup columns (tokens pruned at
    the scan) and still matches the oracle rollup."""
    cfg = RollupConfig(
        out_root=str(tmp_path / "out"), tiers=("1m",), validate_tokens=False
    )
    job.run(tiny_input_dir, cfg)
    got = _rolled(cfg.out_root, "1m")
    exp = oracle.rollup_1m(tiny_table).reset_index(drop=True)
    for c in exp.columns:
        got[c] = got[c].astype(exp[c].dtype)
    pd.testing.assert_frame_equal(got, exp)


def test_incremental_coarse_tier_requires_same_input_base(ray_session, tmp_path):
    """Review fix: a coarser tier whose committed points predate an earlier
    append must NOT be reused as an incremental base. Run 2 advances only the
    1m tier (cfg.tiers=('1m',)); run 3 appends again with all tiers — the 1h
    points were built from the original input, so they must be recomputed,
    and the final tiers must equal a from-scratch run bit-for-bit."""
    import pyarrow.parquet as pq

    from tsrollup.synth import synth_table

    t = synth_table(seed=21, n_sources=2, base_span=43200)
    d = tmp_path / "in"
    d.mkdir()
    third = t.num_rows // 3
    pq.write_table(t.slice(0, third), str(d / "a.parquet"))
    out_i, out_f = str(tmp_path / "incr"), str(tmp_path / "full")
    job.run(str(d), RollupConfig(out_root=out_i, tiers=("1m", "1h")))
    # append f1, advance ONLY the finest tier (supported per config_hash)
    pq.write_table(t.slice(third, third), str(d / "b.parquet"))
    job.run(str(d), RollupConfig(out_root=out_i, tiers=("1m",)))
    # append f2, full tier list again: 1h's committed points lack f1
    pq.write_table(t.slice(2 * third), str(d / "c.parquet"))
    r3 = job.run(str(d), RollupConfig(out_root=out_i, tiers=("1m", "1h")))
    assert r3["1m"]["incremental"] is True
    # 1h must NOT have reused stale points (its base fingerprint differs)
    assert "points_reused" not in r3["1h"]
    job.run(str(d), RollupConfig(out_root=out_f, tiers=("1m", "1h")))
    _assert_tiers_equal(out_i, out_f, tiers=("1m", "1h"))


def test_crash_between_commit_and_manifest_does_not_double_count(ray_session, tmp_path):
    """Review fix: provenance lives INSIDE the committed tier dir (atomic with
    the data). Simulate a crash after the data rename but before the manifest
    write by restoring the PRE-append manifest: the next run must not re-merge
    the already-merged fragment (no double-count) — it sees the dir's own
    provenance, finds an empty delta, and recomputes/commits consistently."""
    import json

    import pyarrow.parquet as pq

    from tsrollup.synth import synth_table

    t = synth_table(seed=27, n_sources=2, base_span=43200)
    d = tmp_path / "in"
    d.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(d / "a.parquet"))
    out_i, out_f = str(tmp_path / "incr"), str(tmp_path / "full")
    cfg = RollupConfig(out_root=out_i, tiers=("1m",))
    job.run(str(d), cfg)
    manifest_path = os.path.join(out_i, "manifest.json")
    with open(manifest_path) as f:
        stale_manifest = f.read()
    # incremental append commits data + provenance + manifest...
    pq.write_table(t.slice(half), str(d / "b.parquet"))
    r2 = job.run(str(d), cfg)
    assert r2["1m"]["incremental"] is True
    # ...then "crash before the manifest write": restore the stale manifest
    with open(manifest_path, "w") as f:
        f.write(stale_manifest)
    r3 = job.run(str(d), cfg)  # must NOT re-merge fragment b
    assert not r3["1m"].get("incremental")  # empty delta -> full path
    job.run(str(d), RollupConfig(out_root=out_f, tiers=("1m",)))
    _assert_tiers_equal(out_i, out_f, tiers=("1m",))
    # and the tier's own lineage token_sum matches the input exactly once
    with open(manifest_path) as f:
        rec = json.load(f)["tiers"]["1m"]["lineage"]
    import pyarrow.compute as pc

    expected = int(pc.sum(t["n_tok"]).as_py())
    assert sum(v.get("token_sum", 0) for v in rec.values()) == expected


def test_corrupt_provenance_degrades_to_full_recompute(ray_session, tiny_table, tmp_path):
    """A truncated/empty _PROVENANCE.json (crash mid-write, power loss) must
    not crash resume: with unchanged input the manifest-backed skip still
    applies (data is intact); with an APPENDED fragment the incremental path
    can't establish its base, so the run degrades to a full recompute —
    never a JSONDecodeError, never a delta double-count."""
    import pyarrow.parquet as pq

    from tsrollup import lineage as lin

    d = tmp_path / "in"
    d.mkdir()
    half = tiny_table.num_rows // 2
    pq.write_table(tiny_table.slice(0, half), str(d / "a.parquet"))
    out = str(tmp_path / "out")
    job.run(str(d), RollupConfig(out_root=out, tiers=("1m",)))
    prov_path = os.path.join(out, "1m", lin.PROVENANCE)
    with open(prov_path, "w") as f:
        f.write('{"config_hash": "tru')  # truncated JSON
    assert lin.tier_provenance(out, "1m") is None  # no JSONDecodeError
    # unchanged input: manifest skip is still correct (committed data intact)
    res = job.run(str(d), RollupConfig(out_root=out, tiers=("1m",)))
    assert res["1m"]["skipped"] is True
    # appended fragment: no provenance base -> full recompute, right answer
    with open(prov_path, "w") as f:
        f.write("")  # fully empty this time
    pq.write_table(tiny_table.slice(half), str(d / "b.parquet"))
    res2 = job.run(str(d), RollupConfig(out_root=out, tiers=("1m",)))
    assert res2["1m"]["skipped"] is False
    assert not res2["1m"].get("incremental")
    # rebuilt tier carries valid provenance again and matches from-scratch
    assert lin.tier_provenance(out, "1m") is not None
    out_f = str(tmp_path / "full")
    job.run(str(d), RollupConfig(out_root=out_f, tiers=("1m",)))
    _assert_tiers_equal(out, out_f, tiers=("1m",))
