"""Committed-tier compaction (tsrollup/compact.py): row content, lineage
checksums and provenance must survive verbatim; the swap is atomic and
idempotent; resume after compaction still skips every tier."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from tsrollup import job
from tsrollup.compact import compact, compact_tier
from tsrollup.config import RollupConfig
from tsrollup.lineage import PROVENANCE, load_manifest


def _files(tier_dir, kind):
    out = []
    kd = os.path.join(tier_dir, kind)
    for part in sorted(os.listdir(kd)):
        pd = os.path.join(kd, part)
        if os.path.isdir(pd):
            out += [os.path.join(pd, f) for f in sorted(os.listdir(pd))
                    if f.endswith(".parquet")]
    return out


@pytest.fixture()
def appended_out(ray_session, tmp_path):
    """A run plus one incremental append -> multiple files per partition."""
    from tsrollup.synth import synth_table

    t = synth_table(seed=11, n_sources=3, base_span=43200)
    d = tmp_path / "in"
    d.mkdir()
    half = t.num_rows * 3 // 4
    pq.write_table(t.slice(0, half), str(d / "a.parquet"))
    out = str(tmp_path / "out")
    job.run(str(d), RollupConfig(out_root=out))
    pq.write_table(t.slice(half), str(d / "b.parquet"))
    r = job.run(str(d), RollupConfig(out_root=out))
    assert r["1m"]["incremental"] is True
    return str(d), out


def test_compact_preserves_rows_lineage_provenance(appended_out):
    import duckdb

    _, out = appended_out
    tier_dir = os.path.join(out, "1m")
    rolled_before = _files(tier_dir, "rolled")
    assert len(rolled_before) > 3  # the append left multiple files around
    with open(os.path.join(tier_dir, PROVENANCE), "rb") as f:
        prov_before = f.read()
    lineage_before = load_manifest(out)["tiers"]["1m"]["lineage"]

    con = duckdb.connect()
    before = con.execute(
        f"SELECT * FROM read_parquet('{tier_dir}/rolled/**/*.parquet', "
        "hive_partitioning=true) ORDER BY source, bucket"
    ).df()

    # sidecar files anywhere in the tree must travel verbatim
    part_dir = os.path.join(tier_dir, "rolled",
                            sorted(os.listdir(os.path.join(tier_dir, "rolled")))[0])
    with open(os.path.join(part_dir, "_sidecar.txt"), "w") as f:
        f.write("keep me")
    with open(os.path.join(tier_dir, "rolled", "_kind_meta"), "w") as f:
        f.write("keep me too")

    rep = compact_tier(out, "1m", target_bytes=1 << 30)
    assert rep["changed"] is True
    assert open(os.path.join(tier_dir, "rolled", os.path.basename(part_dir),
                             "_sidecar.txt")).read() == "keep me"
    assert open(os.path.join(tier_dir, "rolled", "_kind_meta")).read() == "keep me too"
    assert rep["kinds"]["rolled"]["files_after"] < rep["kinds"]["rolled"]["files_before"]

    after = con.execute(
        f"SELECT * FROM read_parquet('{tier_dir}/rolled/**/*.parquet', "
        "hive_partitioning=true) ORDER BY source, bucket"
    ).df()
    # exact row-content preservation (order-canonicalized)
    assert before.shape == after.shape
    assert (before.values == after.values).all()

    with open(os.path.join(tier_dir, PROVENANCE), "rb") as f:
        assert f.read() == prov_before  # provenance byte-identical
    lineage_after = load_manifest(out)["tiers"]["1m"]["lineage"]
    assert lineage_after == lineage_before  # content-derived sums invariant


def test_compact_is_idempotent_and_resume_still_skips(appended_out):
    d, out = appended_out
    compact(out, target_bytes=1 << 30)
    rep2 = compact(out, target_bytes=1 << 30)
    for tier_rep in rep2.values():  # second pass: every partition 1 file
        assert tier_rep.get("changed") is False
    # resume honors the verbatim provenance: nothing recomputes
    r = job.run(d, RollupConfig(out_root=out))
    assert all(v.get("skipped") for v in r.values())


def test_compact_cli_and_uncommitted_tier(tmp_path, appended_out):
    _, out = appended_out
    # CLI maintenance mode needs no --input and prints a JSON report
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = job.main(["--out", out, "--compact", "--target-mb", "1024"])
    assert rc == 0
    rep = json.loads(buf.getvalue())
    assert set(rep) == {"1m", "1h", "1d"}
    # a directory without provenance is skipped, not destroyed
    bogus = tmp_path / "bogus_out"
    (bogus / "1m").mkdir(parents=True)
    rep = compact(str(bogus), tiers=["1m"])
    assert "skipped" in rep["1m"]


def test_append_compact_append_reuses_points(appended_out, tmp_path):
    """Round-4 VERDICT next #8: OUTPUT compaction must never force the next
    incremental append into a full recompute — _PROVENANCE.json travels
    verbatim, so the post-compaction run diffs against exactly the
    pre-compaction fragment base and reuses committed points."""
    from tsrollup.synth import synth_table

    d, out = appended_out
    compact(out)
    t = synth_table(seed=12, n_sources=3, base_span=43200)
    pq.write_table(t.slice(0, 2000), os.path.join(d, "c.parquet"))
    r = job.run(d, RollupConfig(out_root=out))
    assert r["1m"]["incremental"] is True
    assert r["1m"]["points_reused"] > 0


def test_moved_input_root_stays_incremental(ray_session, tmp_path):
    """fragment_delta matches on (rel_key, size) — the same move-stable
    identity input_fingerprint hashes — so relocating the input ROOT plus
    appending one fragment still takes the per-fragment incremental path."""
    import shutil

    from tsrollup.synth import synth_table

    t = synth_table(seed=13, n_sources=2, base_span=43200)
    d1 = tmp_path / "in1"
    d1.mkdir()
    pq.write_table(t.slice(0, t.num_rows // 2), str(d1 / "a.parquet"))
    out = str(tmp_path / "out")
    job.run(str(d1), RollupConfig(out_root=out))
    d2 = tmp_path / "in2"
    shutil.move(str(d1), str(d2))
    pq.write_table(t.slice(t.num_rows // 2), str(d2 / "b.parquet"))
    r = job.run(str(d2), RollupConfig(out_root=out))
    assert r["1m"]["incremental"] is True


def test_fragment_delta_legacy_two_field_provenance():
    """Provenance written before the rel_key upgrade ([abs, size] pairs)
    still diffs correctly (by abs path), so an existing committed output
    survives the upgrade without a forced recompute."""
    from tsrollup.lineage import fragment_delta

    committed = [["/in/a.parquet", 100], ["/in/b.parquet", 200]]
    current = [["/in/a.parquet", "a.parquet", 100, 1],
               ["/in/b.parquet", "b.parquet", 200, 2],
               ["/in/c.parquet", "c.parquet", 50, 3]]
    assert fragment_delta(committed, current) == ["/in/c.parquet"]
    # size change on a committed fragment -> full recompute
    assert fragment_delta([["/in/a.parquet", 999]], current) is None


def test_fragment_delta_move_stability_and_hazards():
    """Move matching is (rel, size, mtime_ns): a true root move preserves
    all three; a REPLACED file sharing rel+size (the review's hazard) has
    a different mtime and forces a full recompute; a multi-root rel-key
    collision falls back to abs-path matching so a colliding new fragment
    is never silently dropped from the incremental merge."""
    from tsrollup.lineage import fragment_delta

    committed = [["/root1/x.parquet", "x.parquet", 100, 111]]
    # true move: same rel+size+mtime under a new root, one appended file
    moved = [["/root2/x.parquet", "x.parquet", 100, 111],
             ["/root2/y.parquet", "y.parquet", 50, 222]]
    assert fragment_delta(committed, moved) == ["/root2/y.parquet"]
    # replaced root: same rel+size but different mtime -> full recompute
    replaced = [["/root2/x.parquet", "x.parquet", 100, 999],
                ["/root2/y.parquet", "y.parquet", 50, 222]]
    assert fragment_delta(committed, replaced) is None
    # rel-key collision across roots -> abs matching; committed abs gone
    # -> full recompute rather than a merge that loses a colliding file
    colliding = [["/a/p.parquet", "p.parquet", 100, 111],
                 ["/b/p.parquet", "p.parquet", 100, 111]]
    assert fragment_delta(committed, colliding) is None
    # abs matching still finds pure appends under collisions when the
    # committed file is untouched
    committed2 = [["/a/p.parquet", "p.parquet", 100, 111]]
    assert fragment_delta(committed2, colliding) == ["/b/p.parquet"]
