"""Continuous monitoring in --watch mode: after each committed tick,
hours breaching 3σ vs their (source, hour-of-day) baseline append to
alerts.jsonl exactly once (high-water idempotence across ticks)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from tsrollup import job
from tsrollup.config import RollupConfig


def _frag(rows):
    return pa.table(
        {"doc_id": pa.array([f"{s}-{m * 60:010d}" for s, m, _ in rows]),
         "tokens": pa.array([[1] * n for _, _, n in rows], pa.list_(pa.int32())),
         "n_tok": pa.array([n for _, _, n in rows], pa.int32()),
         "source": pa.array([s for s, _, _ in rows])}
    )


def test_watch_emits_alerts_idempotently(ray_session, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # fragment a: 12 days of hour-0 volume 100 (+ jitter so variance > 0:
    # alternate 100/102 — no single point breaches 3 sigma)
    base = [("s", day * 1440, 100 + 2 * (day % 2)) for day in range(12)]
    pq.write_table(_frag(base), str(d / "a.parquet"))
    cfg = RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",))
    alerts_path = os.path.join(cfg.out_root, "alerts.jsonl")
    ticks = []

    def _cb(res):
        ticks.append(True)
        if len(ticks) == 1:   # day 12: 100x spike -> the only 3-sigma breach
            pq.write_table(_frag([("s", 12 * 1440, 10_000)]), str(d / "b.parquet"))
        elif len(ticks) == 2:  # day 13: normal volume, must NOT re-alert day 12
            pq.write_table(_frag([("s", 13 * 1440, 100)]), str(d / "c.parquet"))

    job.watch(str(d), cfg, iterations=3, poll_seconds=0.05,
              on_result=_cb, alerts=True)
    assert len(ticks) == 3
    with open(alerts_path) as f:
        recs = [json.loads(line) for line in f]
    assert len(recs) == 1, recs
    assert recs[0]["source"] == "s" and recs[0]["sum_tok"] == 10_000
    assert recs[0]["z"] > 3
    # RESTART the watcher: the high-water recovers from alerts.jsonl, so the
    # recorded spike must not re-emit
    job.watch(str(d), cfg, iterations=1, poll_seconds=0.05, alerts=True)
    with open(alerts_path) as f:
        assert len(f.readlines()) == 1
    hi = job.load_alert_hi_water(cfg.out_root)
    assert hi == {"s": recs[0]["bucket_h"]}


def test_alert_hi_water_is_per_source(ray_session, tmp_path):
    """A lagging source must not be silenced by a leading one: source A is
    committed far ahead; B's spike arrives later but in B's own new hours."""
    d = tmp_path / "in"
    d.mkdir()
    rows = [("A", day * 1440, 100 + 2 * (day % 2)) for day in range(21)]
    rows += [("B", day * 1440 + 60, 100 + 2 * (day % 2)) for day in range(12)]
    pq.write_table(_frag(rows), str(d / "a.parquet"))
    cfg = RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",))
    ticks = []

    def _cb(res):
        ticks.append(True)
        if len(ticks) == 1:  # B's day-12 spike: behind A's hours, new for B
            pq.write_table(_frag([("B", 12 * 1440 + 60, 10_000)]),
                           str(d / "b.parquet"))

    job.watch(str(d), cfg, iterations=2, poll_seconds=0.05,
              on_result=_cb, alerts=True)
    with open(os.path.join(cfg.out_root, "alerts.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert [r["source"] for r in recs] == ["B"]
    assert recs[0]["sum_tok"] == 10_000


def test_emit_alerts_empty_and_quarantine_safe(ray_session, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(_frag([("s", 0, 5)]), str(d / "a.parquet"))
    cfg = RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",))
    job.run(str(d), cfg)
    alerts, hi = job.emit_alerts(cfg.out_root)
    assert alerts == []                       # single hour: n < 2 per hod cell
    assert hi == {"s": 1767225600 // 3600}    # per-source absolute epoch hour
    # re-poll with the same high-water stays silent
    alerts2, hi2 = job.emit_alerts(cfg.out_root, hi)
    assert alerts2 == [] and hi2 == hi
