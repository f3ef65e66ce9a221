"""Windowing, gap-fill, wavelet-downsample and Gorilla-encode stages.

Topology (over the tiers' *rolled* rows — already 1/60th+ of input; all
computed tiers union into ONE points execution, job.py):

    rolled -> map_batches(add_window + tier col)                [stateless]
           -> shuffle.map_key_groups((tier, source, window),
                                     gapfill)                   [bounded groups: <= window_len buckets]
           -> map_batches(WaveletStage, concurrency=(1,N))      [ACTOR POOL: per-worker state
                                                                 loaded once, ref core/streaming_pipeline.py:229-257 ST1]
           -> map_batches(gorilla_encode_batch)                 [stateless]

Keying on (tier, source, window) guarantees a window lands wholly in one task
(SURVEY §7.9.2) and bounds group size regardless of source skew — a hot source
gets more windows, not bigger ones.
"""

from __future__ import annotations

from dataclasses import asdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tsrollup import gorilla, wavelet
from tsrollup.config import RollupConfig
from tsrollup.oracle import gapfill_series

WINDOW_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("window_id", pa.int64()),
        ("start_bucket", pa.int64()),
        ("n_in", pa.int64()),
        ("n_filled", pa.int64()),
        ("series", pa.list_(pa.float64())),
    ]
)

POINTS_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("tier", pa.string()),
        ("window_id", pa.int64()),
        ("start_bucket", pa.int64()),
        ("n_in", pa.int64()),
        ("n_filled", pa.int64()),
        ("kept_idx", pa.list_(pa.int32())),
        ("values", pa.list_(pa.float64())),
    ]
)


def add_window(t: pa.Table, window_len: int) -> pa.Table:
    # numpy FLOOR division (Arrow pc.divide truncates toward zero and would
    # disagree with the rollup's window keying on negative buckets)
    b = t["bucket"].to_numpy(zero_copy_only=False)
    return t.append_column("window_id", pa.array(b // window_len))


def gapfill_group(t: pa.Table, method: str) -> pa.Table:
    """One (source, window) group -> one window row with the gap-filled series.

    Restores bucket order inside the group (cheap in-memory sort, SURVEY §2.8)
    and fills interior holes per the configured method — the reference's
    linear-interp reconstruction semantics (new_evaluation.py:185-198).
    """
    has_tier = "tier" in t.column_names
    if t.num_rows == 0:
        empty = WINDOW_SCHEMA.empty_table()
        if has_tier:
            empty = empty.add_column(0, "tier", pa.array([], type=pa.string()))
        return empty
    order = pc.sort_indices(t["bucket"])
    buckets = t["bucket"].take(order).to_numpy(zero_copy_only=False)
    vals = t["sum_tok"].take(order).to_numpy(zero_copy_only=False)
    full, series, filled = gapfill_series(buckets, vals, method)
    la = pa.ListArray.from_arrays(pa.array([0, len(series)], type=pa.int32()), pa.array(series))
    out = pa.table(
        {
            "source": t["source"].slice(0, 1),
            "window_id": pa.array([int(t["window_id"][0].as_py())], type=pa.int64()),
            "start_bucket": pa.array([int(full[0])], type=pa.int64()),
            "n_in": pa.array([len(full)], type=pa.int64()),
            "n_filled": pa.array([int(filled.sum())], type=pa.int64()),
            "series": la,
        }
    )
    if has_tier:
        out = out.add_column(0, "tier", t["tier"].slice(0, 1))
    return out


def gapfill_block(t: pa.Table, method: str) -> pa.Table:
    """Vectorized multi-window gap-fill: one pass over a hash-partition block
    holding complete (tier, source, window) groups. Equivalent to calling
    :func:`gapfill_group` per group, but builds the output columns once —
    per-window Python is just the interp kernel, not 15 pyarrow calls.
    """
    if t.num_rows == 0:
        empty = WINDOW_SCHEMA.empty_table()
        return empty.add_column(0, "tier", pa.array([], type=pa.string()))
    if "__wn" in t.column_names:
        # co-partitioned fast path: verify every (source, window) group in
        # this block is complete (see rollup.check_window_counts), then drop
        # the guard column.
        from tsrollup.rollup import check_window_counts

        check_window_counts(t, t["window_id"].to_numpy(zero_copy_only=False))
        t = t.drop_columns(["__wn"])
    t = t.sort_by(
        [("tier", "ascending"), ("source", "ascending"), ("window_id", "ascending"),
         ("bucket", "ascending")]
    )
    tier = t["tier"].to_numpy(zero_copy_only=False)
    source = t["source"].to_numpy(zero_copy_only=False)
    window_id = t["window_id"].to_numpy(zero_copy_only=False)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    vals = t["sum_tok"].to_numpy(zero_copy_only=False)
    n = len(bucket)
    change = (window_id[1:] != window_id[:-1]) | (source[1:] != source[:-1]) | (
        tier[1:] != tier[:-1]
    )
    starts = np.concatenate(([0], np.flatnonzero(change) + 1, [n]))
    series_parts: list[np.ndarray] = []
    start_buckets = np.empty(len(starts) - 1, dtype=np.int64)
    n_in = np.empty(len(starts) - 1, dtype=np.int64)
    n_filled = np.empty(len(starts) - 1, dtype=np.int64)
    for w in range(len(starts) - 1):
        lo, hi = starts[w], starts[w + 1]
        full, filled_vals, filled = gapfill_series(bucket[lo:hi], vals[lo:hi], method)
        series_parts.append(filled_vals)
        start_buckets[w] = full[0]
        n_in[w] = len(full)
        n_filled[w] = int(filled.sum())
    offsets = np.zeros(len(series_parts) + 1, dtype=np.int32)
    offsets[1:] = np.cumsum(n_in)
    series = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(np.concatenate(series_parts))
    )
    heads = starts[:-1]
    return pa.table(
        {
            "tier": pa.array(tier[heads]),
            "source": pa.array(source[heads]),
            "window_id": pa.array(window_id[heads]),
            "start_bucket": pa.array(start_buckets),
            "n_in": pa.array(n_in),
            "n_filled": pa.array(n_filled),
            "series": series,
        }
    )


class WaveletStage:
    """Actor-pool stage: wavelet-downsample a batch of window rows.

    State (filter bank, config, counters) is built ONCE per actor in
    ``__init__`` — the Ray-native version of the reference's lazy per-process
    model singleton (ref core/streaming_pipeline.py:229-257). ``__call__``
    vectorizes the DWT across all same-length windows in the batch
    (``dwt1`` is (B, n) batched), instead of the reference's record-at-a-time
    ``tf.py_function`` row loop (ref core/downsampling_algorithm2.py:348-365).
    """

    def __init__(self, cfg: dict | RollupConfig, tier: str | None = None, encode: bool = True):
        self.cfg = cfg if isinstance(cfg, RollupConfig) else RollupConfig(**cfg)
        # tier: fixed per-stage, or None -> taken from the input's tier column
        # (the merged multi-tier points pipeline, one pool for all tiers)
        self.tier = tier
        # fuse the Gorilla encode into this actor by default: one stage fewer,
        # and the point lists never make an extra object-store hop
        self.encode = encode
        # precompute the filter bank once per actor
        self.filters = wavelet.filter_bank(self.cfg.wavelet)
        # resolve the scorer once per actor — class-based scorers (e.g. the
        # "mlp" learned-importance head) load their weight file HERE, not per
        # batch (the reference's lazy per-process model singleton, ST1)
        self.scorer = wavelet.get_scorer(self.cfg.scorer)
        self.windows_processed = 0

    def __call__(self, t: pa.Table) -> pa.Table:
        cfg = self.cfg
        n_rows = t.num_rows
        if n_rows == 0:
            return POINTS_SCHEMA.empty_table()
        tier_col = (
            pa.array([self.tier] * n_rows) if self.tier is not None else t["tier"].combine_chunks()
        )
        series_col = t.column("series").combine_chunks()
        if isinstance(series_col, pa.ChunkedArray):
            series_col = series_col.chunk(0)
        flat = np.asarray(series_col.flatten())
        offs = np.asarray(series_col.offsets)
        lens = offs[1:] - offs[:-1]

        kept_out: list[np.ndarray] = [None] * n_rows  # type: ignore[list-item]
        vals_out: list[np.ndarray] = [None] * n_rows  # type: ignore[list-item]
        # batch rows by identical length -> one vectorized kernel call each
        for n in np.unique(lens):
            rows = np.flatnonzero(lens == n)
            if n < cfg.min_wavelet_len:
                for r in rows:
                    x = flat[offs[r] : offs[r + 1]]
                    kept_out[r] = np.arange(n, dtype=np.int32)
                    vals_out[r] = x.astype(np.float64)
                continue
            mat = np.stack([flat[offs[r] : offs[r] + n] for r in rows])
            results = wavelet.downsample_points(
                mat, cfg.wavelet, cfg.mode, cfg.retention_rate, cfg.approx_ds_factor,
                cfg.detail_selector, cfg.scorer,
                cfg.target_cumulative_importance, cfg.min_retention_rate,
                level=cfg.dwt_level,
            )
            for r, (kept, vals) in zip(rows, results):
                kept_out[r] = kept
                vals_out[r] = vals
        self.windows_processed += n_rows

        k_offsets = np.zeros(n_rows + 1, dtype=np.int32)
        np.cumsum([len(k) for k in kept_out], out=k_offsets[1:])
        kept_arr = pa.ListArray.from_arrays(
            pa.array(k_offsets), pa.array(np.concatenate(kept_out).astype(np.int32))
        )
        vals_arr = pa.ListArray.from_arrays(
            pa.array(k_offsets), pa.array(np.concatenate(vals_out))
        )
        out = pa.table(
            {
                "source": t["source"],
                "tier": tier_col,
                "window_id": t["window_id"],
                "start_bucket": t["start_bucket"],
                "n_in": t["n_in"],
                "n_filled": t["n_filled"],
                "kept_idx": kept_arr,
                "values": vals_arr,
            }
        )
        if self.encode:
            out = gorilla_encode_batch(out)
        return out


def make_wavelet_stage(cfg: RollupConfig, tier: str):
    """Bind config as a plain dict so the callable pickles cheaply to workers."""
    d = asdict(cfg)
    return WaveletStage, {"cfg": d, "tier": tier}


def gorilla_encode_batch(t: pa.Table) -> pa.Table:
    """Append the Gorilla block per point row: ts = start_bucket + kept_idx."""
    if t.num_rows == 0:
        return t.append_column("gorilla", pa.array([], type=pa.large_binary()))
    kept = t.column("kept_idx").combine_chunks()
    vals = t.column("values").combine_chunks()
    start = t["start_bucket"].to_numpy(zero_copy_only=False)
    # one vectorized pass over ALL windows via the ListArray's flat buffers
    # (per-window ts = start_bucket + kept_idx, broadcast by list offsets)
    k_off = np.asarray(kept.offsets)
    v_off = np.asarray(vals.offsets)
    lens = np.diff(k_off)
    ts_flat = np.asarray(kept.values, dtype=np.int64)[k_off[0] : k_off[-1]] + np.repeat(
        start, lens
    )
    v_flat = np.asarray(vals.values, dtype=np.float64)[v_off[0] : v_off[-1]]
    blocks = gorilla.encode_concat(ts_flat, v_flat, k_off - k_off[0])
    return t.append_column("gorilla", pa.array(blocks, type=pa.large_binary()))
