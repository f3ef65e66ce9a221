"""Shared hour-of-day anomaly kernel — the single source of truth for the
exact integer 3σ contract used by BOTH the SQL-verified q_hod_anomaly
query and the --watch --alerts monitor (job.emit_alerts), so the two can
never drift."""

from __future__ import annotations

import math

import numpy as np


def hod_breaches(
    hb_u: np.ndarray, x: np.ndarray, hi_water: int = -1, n_slots: int = 24
) -> list[tuple[int, int, int, float]]:
    """Hours breaching 3σ against their own hour-of-day baseline.

    ``hb_u``: sorted unique hour buckets; ``x``: the hour's integer volume.
    Returns (bucket_h, volume, dev, z) for every hour with
    (n·x − S)² > 9·(n·S2 − S²) over its hod slot's population sums —
    Python bignums (the squares exceed int64 by design) — restricted to
    hours STRICTLY above ``hi_water``. Deterministic: exact integers
    decide the flag; the float z is presentation."""
    out: list[tuple[int, int, int, float]] = []
    hod = hb_u % n_slots
    for h in range(n_slots):
        sel = hod == h
        xs = [int(v) for v in x[sel]]
        n = len(xs)
        if n < 2:
            continue
        S, S2 = sum(xs), sum(v * v for v in xs)
        var_n2 = n * S2 - S * S
        if var_n2 <= 0:
            continue
        for bh, xv in zip(hb_u[sel], xs):
            a = n * xv - S
            if int(bh) > hi_water and a * a > 9 * var_n2:
                out.append((int(bh), xv, a,
                            round(float(a) / math.sqrt(float(var_n2)), 6)))
    out.sort()
    return out
