"""Single-process NumPy/pandas golden oracle for the engine.

Computes, without Ray, exactly what the distributed pipeline must produce:
1m/1h/1d rollups, gap-filled windows, wavelet-downsampled points, Gorilla
blocks, retention pruning. Tests assert **bit-for-bit equality** between
``tsrollup.job`` output (at any parallelism) and this oracle (FIXTURES.md §F2/F3).

The wavelet/Gorilla kernels are shared with the engine (they are pure,
unit-tested functions); what the oracle independently re-derives is the
*composition*: bucketing, grouping, gap-fill spans, window alignment, checksum
combination — i.e. everything the distributed plan could get wrong.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tsrollup import gorilla, wavelet
from tsrollup.config import EPOCH0_S, SECONDS_PER_BUCKET, STEP_S, TIER_FACTORS, RollupConfig
from tsrollup.hashing import row_checksum

ROLLED_COLUMNS = ["source", "bucket", "n_rows", "sum_tok", "min_tok", "max_tok", "chk"]
POINT_COLUMNS = [
    "source", "tier", "window_id", "start_bucket", "n_in", "n_filled",
    "kept_idx", "values", "gorilla",
]


def seq_from_doc_id(doc_id: pd.Series | np.ndarray) -> np.ndarray:
    return np.asarray([int(s[-10:]) for s in doc_id], dtype=np.int64)


def rollup_1m(table: pa.Table) -> pd.DataFrame:
    """F2 golden: per (source, 1m bucket) n_rows/sum_tok/min/max/checksum."""
    df = pd.DataFrame(
        {
            "source": table["source"].to_pandas(),
            "seq": seq_from_doc_id(table["doc_id"].to_pandas()),
            "n_tok": table["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64),
        }
    )
    df["bucket"] = (EPOCH0_S + df["seq"] * STEP_S) // SECONDS_PER_BUCKET
    df["chk"] = row_checksum(df["seq"].to_numpy(), df["n_tok"].to_numpy()).view(np.int64)
    g = df.groupby(["source", "bucket"], sort=True)
    out = pd.DataFrame(
        {
            "n_rows": g.size().astype(np.int64),
            "sum_tok": g["n_tok"].sum().astype(np.int64),
            "min_tok": g["n_tok"].min().astype(np.int32),
            "max_tok": g["n_tok"].max().astype(np.int32),
            "chk": g["chk"].apply(lambda s: np.int64(s.to_numpy().sum())),  # wrapping int64
        }
    ).reset_index()
    return out[ROLLED_COLUMNS]


def cascade(rolled: pd.DataFrame, factor: int) -> pd.DataFrame:
    """Coarser tier from a finer one (1m->1h: factor 60; 1h->1d: factor 24)."""
    df = rolled.copy()
    df["bucket"] = df["bucket"] // factor
    g = df.groupby(["source", "bucket"], sort=True)
    out = pd.DataFrame(
        {
            "n_rows": g["n_rows"].sum().astype(np.int64),
            "sum_tok": g["sum_tok"].sum().astype(np.int64),
            "min_tok": g["min_tok"].min().astype(np.int32),
            "max_tok": g["max_tok"].max().astype(np.int32),
            "chk": g["chk"].apply(lambda s: np.int64(s.to_numpy().sum())),
        }
    ).reset_index()
    return out[ROLLED_COLUMNS]


def gapfill_series(buckets: np.ndarray, vals: np.ndarray, method: str):
    """Fill the inclusive span [buckets[0], buckets[-1]] (buckets sorted unique).

    Returns (full_buckets, full_vals float64, filled bool). Linear interpolation
    follows the reference's reconstruction blueprint (new_evaluation.py:185-198);
    'ffill' carries the previous value; 'zero' inserts 0.
    """
    full = np.arange(buckets[0], buckets[-1] + 1, dtype=np.int64)
    filled = ~np.isin(full, buckets)
    if method == "linear":
        out = np.interp(full, buckets, vals.astype(np.float64))
    elif method == "ffill":
        idx = np.searchsorted(buckets, full, side="right") - 1
        out = vals.astype(np.float64)[idx]
    elif method == "zero":
        out = np.zeros(len(full))
        out[~filled] = vals.astype(np.float64)
    else:
        raise ValueError(f"unknown gapfill method {method!r}")
    return full, out, filled


def windows_for_tier(rolled: pd.DataFrame, cfg: RollupConfig) -> pd.DataFrame:
    """Group a rolled tier into absolute-aligned windows of ``cfg.window_len``
    buckets, gap-filling interior holes per (source, window).

    A (source, window) group spans only [first, last] present buckets inside
    the window — leading/trailing absence is not fabricated. Windows are
    independent by construction (SURVEY §7.5: bounded group size, no cross-
    window state), at the cost of not interpolating across window boundaries.
    """
    L = cfg.window_len
    rows = []
    for (src, wid), g in rolled.groupby(["source", rolled["bucket"] // L], sort=True):
        g = g.sort_values("bucket")
        buckets = g["bucket"].to_numpy()
        vals = g["sum_tok"].to_numpy()
        full, filled_vals, filled = gapfill_series(buckets, vals, cfg.gapfill_method)
        rows.append(
            {
                "source": src,
                "window_id": int(wid),
                "start_bucket": int(full[0]),
                "n_in": len(full),
                "n_filled": int(filled.sum()),
                "series": filled_vals,
            }
        )
    return pd.DataFrame(rows)


def downsample_windows(windows: pd.DataFrame, tier: str, cfg: RollupConfig) -> pd.DataFrame:
    """F3 golden: wavelet-downsampled points + Gorilla blocks per window."""
    rows = []
    for r in windows.itertuples(index=False):
        x = np.asarray(r.series, dtype=np.float64)
        n = len(x)
        if n < cfg.min_wavelet_len:
            kept = np.arange(n, dtype=np.int32)
            vals = x
        else:
            [(kept, vals)] = wavelet.downsample_points(
                x[None, :], cfg.wavelet, cfg.mode, cfg.retention_rate, cfg.approx_ds_factor,
                cfg.detail_selector, cfg.scorer,
                cfg.target_cumulative_importance, cfg.min_retention_rate,
                level=cfg.dwt_level,
            )
        ts = r.start_bucket + kept.astype(np.int64)
        rows.append(
            {
                "source": r.source,
                "tier": tier,
                "window_id": r.window_id,
                "start_bucket": r.start_bucket,
                "n_in": r.n_in,
                "n_filled": r.n_filled,
                "kept_idx": kept,
                "values": vals,
                "gorilla": gorilla.encode(ts, vals),
            }
        )
    df = pd.DataFrame(rows, columns=POINT_COLUMNS)
    return df.sort_values(["source", "window_id"]).reset_index(drop=True)


def apply_retention(rolled: pd.DataFrame, tier: str, cfg: RollupConfig, now_bucket: int) -> pd.DataFrame:
    """Drop buckets older than the tier's retention horizon (1m-bucket units)."""
    keep = cfg.retention_buckets.get(tier)
    if keep is None:
        return rolled
    factor = TIER_FACTORS[tier]
    cutoff = (now_bucket - keep) // factor
    return rolled[rolled["bucket"] >= cutoff].reset_index(drop=True)


def pipeline(table: pa.Table, cfg: RollupConfig | None = None) -> dict[str, pd.DataFrame]:
    """Full golden pipeline: tiers of rolled buckets + downsampled points."""
    cfg = cfg or RollupConfig()
    out: dict[str, pd.DataFrame] = {}
    r1m = rollup_1m(table)
    now_bucket = int(r1m["bucket"].max()) if len(r1m) else 0
    tiers = {"1m": r1m}
    if "1h" in cfg.tiers:
        tiers["1h"] = cascade(r1m, 60)
    if "1d" in cfg.tiers:
        tiers["1d"] = cascade(tiers.get("1h", cascade(r1m, 60)), 24)
    for tier, rolled in tiers.items():
        rolled = apply_retention(rolled, tier, cfg, now_bucket)
        out[f"rolled_{tier}"] = rolled
        wins = windows_for_tier(rolled, cfg)
        out[f"points_{tier}"] = downsample_windows(wins, tier, cfg)
    return out
