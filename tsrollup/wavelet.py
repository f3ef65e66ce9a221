"""Pure-NumPy wavelet downsampling kernels + the baseline downsampler library.

Re-implements, vectorized and deterministic, the semantics of the reference's
downsampling kernel and its evaluation baselines (no PyWavelets / TensorFlow):

- level-1 DWT with symmetric extension          (ref core/downsampling_algorithm2.py:294-298,348-365)
- approx branch: avg-pool by ``factor`` (VALID) (ref core/downsampling_algorithm2.py:304-320)
- detail branch: |cD|-magnitude top-k, indices sorted ascending
                                                (ref new_evaluation.py:139-152 — the reference's own
                                                 deterministic analog of its attention scorer
                                                 core/downsampling_algorithm2.py:114-121)
- coefficient-length arithmetic                 (ref core/downsampling_algorithm2.py:8-23)
- baseline downsamplers B1-B8                   (ref new_evaluation.py:66-183)
- linear-interpolation reconstruction           (ref new_evaluation.py:185-198)
- quality metrics incl. spectral MSE            (ref new_evaluation.py:200-209; loss ref
                                                 core/downsampling_algorithm2.py:397-402)

Filter banks are the public Daubechies coefficients. The DWT convention matches
PyWavelets' documented one: symmetric (half-sample) signal extension by
``len(filter)-1`` on each side, full convolution with the decomposition filter,
stride-2 downsampling; ``len(cA) = len(cD) = floor((n + F - 1) / 2)``.
"""

from __future__ import annotations

import numpy as np

# Public Daubechies scaling (lowpass reconstruction) filters, ascending order.
_REC_LO = {
    "haar": np.array([0.7071067811865476, 0.7071067811865476]),
    "db1": np.array([0.7071067811865476, 0.7071067811865476]),
    "db2": np.array(
        [0.48296291314469025, 0.836516303737469, 0.22414386804185735, -0.12940952255092145]
    ),
    "db3": np.array(
        [
            0.3326705529509569,
            0.8068915093133388,
            0.4598775021193313,
            -0.13501102001039084,
            -0.08544127388224149,
            0.035226291882100656,
        ]
    ),
    "db4": np.array(
        [
            0.23037781330885523,
            0.7148465705525415,
            0.6308807679295904,
            -0.02798376941698385,
            -0.18703481171888114,
            0.030841381835986965,
            0.032883011666982945,
            -0.010597401784997278,
        ]
    ),
    # Symlets (least-asymmetric Daubechies): sym2/sym3 coincide with db2/db3
    # by construction; sym4 is the published 8-tap least-asymmetric filter.
    "sym4": np.array(
        [
            0.0322231006040427,
            -0.012603967262037833,
            -0.09921954357684722,
            0.29785779560527736,
            0.8037387518059161,
            0.49761866763201545,
            -0.02963552764599851,
            -0.07576571478927333,
        ]
    ),
    # Coiflet-1 (published 6-tap filter with vanishing moments on phi too)
    "coif1": np.array(
        [
            -0.01565572813546454,
            -0.0727326195128539,
            0.38486484686420286,
            0.8525720202122554,
            0.3378976624578092,
            -0.0727326195128539,
        ]
    ),
}
_REC_LO["sym2"] = _REC_LO["db2"]
_REC_LO["sym3"] = _REC_LO["db3"]

_MAX_DB = 20


def _daubechies_rec_lo(N: int) -> np.ndarray:
    """Compute the minimum-phase Daubechies-N scaling filter (length 2N) by
    spectral factorization of the Daubechies polynomial (Daubechies, "Ten
    Lectures on Wavelets", ch. 6 — the standard public construction):
    P(y) = sum_k C(N-1+k, k) y^k; map each y-root through
    z^2 - (2 - 4y) z + 1 = 0, keep |z| < 1 (minimum phase), and expand
    h(z) = c (1+z)^N prod(z - z_k) with sum(h) = sqrt(2).

    Reproduces the published db1-db4 tables to ~1e-13 (pinned in
    tests/test_wavelet.py); lets the engine accept any dbN like the
    reference's pywt surface (core/downsampling_algorithm2.py:245-257)."""
    from math import comb

    if N == 1:
        return np.array([1.0, 1.0]) / np.sqrt(2)
    P = [comb(N - 1 + k, k) for k in range(N)]
    yroots = np.roots(P[::-1])
    poly = np.array([1.0 + 0j])
    for _ in range(N):
        poly = np.convolve(poly, [1.0, 1.0])
    for y in yroots:
        b = 2 - 4 * y
        disc = np.sqrt(b * b - 4 + 0j)
        z1, z2 = (b + disc) / 2, (b - disc) / 2
        poly = np.convolve(poly, [1.0, -(z1 if abs(z1) < 1 else z2)])
    h = poly.real
    return h * (np.sqrt(2) / h.sum())


def filter_bank(wavelet: str) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(dec_lo, dec_hi, rec_lo, rec_hi) for a named wavelet.

    Standard orthogonal QMF relations: rec_lo = h; dec_lo = h reversed;
    rec_hi[k] = (-1)**k * dec_lo[k]; dec_hi = rec_hi reversed.

    db1-db4 / sym2-sym4 / coif1 come from the published tables above; any
    other ``dbN`` (N <= 20) is computed on first use by spectral
    factorization and cached.
    """
    h = _REC_LO.get(wavelet)
    if h is None and wavelet.startswith("db") and wavelet[2:].isdigit():
        N = int(wavelet[2:])
        if 1 <= N <= _MAX_DB:
            h = _REC_LO[wavelet] = _daubechies_rec_lo(N)
    if h is None:
        raise ValueError(
            f"unsupported wavelet {wavelet!r}; choose from "
            f"{sorted(_REC_LO)} or any db1..db{_MAX_DB}"
        )
    rec_lo = h
    dec_lo = h[::-1].copy()
    signs = np.where(np.arange(len(h)) % 2 == 0, 1.0, -1.0)
    rec_hi = signs * dec_lo
    dec_hi = rec_hi[::-1].copy()
    return dec_lo, dec_hi, rec_lo, rec_hi


def coeff_len(n: int, wavelet: str, mode: str = "symmetric", level: int = 1) -> int:
    """len(cA_level) == len(cD_level) (ref core/downsampling_algorithm2.py:8-23;
    for level > 1 the reference keeps only coeffs[0]/coeffs[1] of wavedec, so
    the relevant length is the level-fold composition of the level-1 rule)."""
    F = len(filter_bank(wavelet)[0])
    for _ in range(max(1, level)):
        n = (n + 1) // 2 if mode == "periodization" else (n + F - 1) // 2
    return n


def wavedec_cAcD(
    x: np.ndarray, wavelet: str = "db4", mode: str = "symmetric", level: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Level-``level`` decomposition returning (cA_level, cD_level) — the
    reference's multi-level semantics keep ONLY ``coeffs[0]`` and ``coeffs[1]``
    of ``pywt.wavedec`` and discard the finer detail levels
    (ref core/downsampling_algorithm2.py:357-365); iterating the level-1 DWT
    on cA reproduces pywt.wavedec's cascade exactly."""
    if level < 1:
        raise ValueError(f"dwt level must be >= 1, got {level}")
    cA, cD = dwt1(x, wavelet, mode)
    for _ in range(level - 1):
        cA, cD = dwt1(cA, wavelet, mode)
    return cA, cD


def _symmetric_ext_indices(n: int, pad: int) -> np.ndarray:
    """Index map for half-sample symmetric extension: [... x1 x0 | x0..xn-1 | xn-1 xn-2 ...].

    Handles signals shorter than the pad via repeated reflection (period 2n).
    """
    idx = np.arange(-pad, n + pad)
    m = np.mod(idx, 2 * n)
    return np.where(m >= n, 2 * n - 1 - m, m)


def dwt1(x: np.ndarray, wavelet: str = "db4", mode: str = "symmetric") -> tuple[np.ndarray, np.ndarray]:
    """Level-1 DWT of a batch of signals, vectorized over rows.

    x: (B, n) float array  ->  (cA, cD) each (B, coeff_len(n)).
    Mirrors the reference's per-row ``pywt.wavedec(row, 'db4', level=1,
    mode='symmetric')`` loop (ref core/downsampling_algorithm2.py:348-365) but
    runs the whole batch at once.
    """
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    dec_lo, dec_hi, _, _ = filter_bank(wavelet)
    F = len(dec_lo)
    n = x.shape[1]
    if n == 0:
        z = np.zeros((x.shape[0], 0))
        return z, z
    if mode == "periodization":
        out = (n + 1) // 2
        if n % 2:  # odd: pywt periodization pads by wrap to even length
            x = np.concatenate([x, x[:, -1:]], axis=1)
            n = n + 1
        pad = F  # wrap-around extension
        idx = np.mod(np.arange(-pad, n + pad), n)
        ext = x[:, idx]
    else:
        out = (n + F - 1) // 2
        pad = F - 1
        ext = x[:, _symmetric_ext_indices(n, pad)]
    # Both modes downsample the convolution at odd output phase (PyWavelets'
    # convention, verified by haar parity + db4 perfect reconstruction): keep
    # y[m] for m = 1, 3, 5, ...  With windows win[s] = ext[s:s+F] · f[::-1]
    # = y[s + pad - (F-1)], odd m maps to start = 1 + pad - (F-1).
    start = 1 + pad - (F - 1)
    win = np.lib.stride_tricks.sliding_window_view(ext, F, axis=1)
    sel = win[:, start : start + 2 * out : 2, :]
    cA = sel @ dec_lo[::-1]
    cD = sel @ dec_hi[::-1]
    return cA[:, :out], cD[:, :out]


def idwt1_periodization(cA: np.ndarray, cD: np.ndarray, wavelet: str, n: int) -> np.ndarray:
    """Inverse level-1 DWT for periodization mode — used to property-test the
    filter bank (perfect reconstruction), not in the data path (the engine's
    reconstruction is linear interpolation of kept points, like the reference's
    ``reconstruct_signal``, new_evaluation.py:185-198)."""
    cA = np.atleast_2d(cA)
    cD = np.atleast_2d(cD)
    _, _, rec_lo, rec_hi = filter_bank(wavelet)
    F = len(rec_lo)
    L = cA.shape[1]
    m = 2 * L
    # upsample (zero-stuff) then circular convolution with rec filters
    up_a = np.zeros((cA.shape[0], m))
    up_d = np.zeros((cD.shape[0], m))
    up_a[:, ::2] = cA
    up_d[:, ::2] = cD
    rec = np.zeros((cA.shape[0], m))
    for t in range(F):
        rec += rec_lo[t] * np.roll(up_a, t - (F - 2), axis=1)
        rec += rec_hi[t] * np.roll(up_d, t - (F - 2), axis=1)
    return rec[:, :n]


# ---------------------------------------------------------------------------
# The engine's downsampling kernel
# ---------------------------------------------------------------------------

def approx_pool(cA: np.ndarray, factor: int) -> tuple[np.ndarray, np.ndarray]:
    """Approx branch: non-overlapping mean pool (VALID) + kept coeff indices.

    Ref core/downsampling_algorithm2.py:304-320 (avg_pool1d ksize=stride=factor,
    VALID padding; kept indices are the window starts). The reference emits
    ``range(0, len_cA, factor)`` which can be one longer than the pooled values
    when ``len_cA % factor != 0``; the engine truncates indices to the pooled
    length so indices and values always align.
    """
    B, L = cA.shape
    if factor <= 1:
        return cA.copy(), np.arange(L, dtype=np.int32)
    n_pool = (L - factor) // factor + 1
    vals = cA[:, : n_pool * factor].reshape(B, n_pool, factor).mean(axis=2)
    idx = np.arange(0, n_pool * factor, factor, dtype=np.int32)
    return vals, idx


# Registered importance scorers — the engine's analog of the reference's
# swappable detail-selection head (ref core/downsampling_algorithm.py:50,90-100
# learned Dense scorer vs downsampling_algorithm2.py attention scorer): a
# function cD -> importance selected by name in RollupConfig, OR a class whose
# instance is the scorer (constructed once per process — weights load in
# __init__, the ST1 per-worker-once pattern; WaveletStage.__init__ warms it).
SCORERS: dict = {
    "abs": lambda cD: np.abs(cD),
    "energy": lambda cD: cD * cD,
}

_SCORER_INSTANCES: dict = {}


def get_scorer(name: str):
    """Resolve a scorer entry; class entries are instantiated once per process
    (weight files load exactly once per worker)."""
    fn = SCORERS[name]
    if isinstance(fn, type):
        if name not in _SCORER_INSTANCES:
            _SCORER_INSTANCES[name] = fn()
        return _SCORER_INSTANCES[name]
    return fn


def register_scorer(name: str, fn) -> None:
    SCORERS[name] = fn


class MLPScorer:
    """K4/K6/M8: the learned-importance-head option — a tiny fixed-weight MLP
    over local |cD| context features, the engine's deterministic stand-in for
    the reference's attention/Dense importance scorer
    (ref core/downsampling_algorithm2.py:26-151, core/downsampling_algorithm.py:50,90-100).

    Weights ship with the repo (``tsrollup/assets/mlp_scorer.npz``) and load
    ONCE per process in ``__init__`` (per actor via
    ``stages.WaveletStage.__init__`` -> :func:`get_scorer`). Rows are scored
    independently, so results are invariant to batching/parallelism."""

    def __init__(self, weights_path: str | None = None):
        import os

        path = weights_path or os.path.join(
            os.path.dirname(__file__), "assets", "mlp_scorer.npz"
        )
        w = np.load(path)
        self.w1 = w["w1"].astype(np.float64)  # (4, H)
        self.b1 = w["b1"].astype(np.float64)
        self.w2 = w["w2"].astype(np.float64)  # (H, 1)
        self.b2 = w["b2"].astype(np.float64)

    def __call__(self, cD: np.ndarray) -> np.ndarray:
        a = np.abs(np.asarray(cD, dtype=np.float64))
        pad = np.pad(a, ((0, 0), (2, 2)), mode="edge")
        win = np.lib.stride_tricks.sliding_window_view(pad, 5, axis=1)
        feats = np.stack([a, a * a, win.mean(-1), win.max(-1)], axis=-1)  # (B, L, 4)
        h = np.tanh(feats @ self.w1 + self.b1)
        z = (h @ self.w2 + self.b2)[..., 0]
        return np.log1p(np.exp(np.clip(z, -30.0, 30.0)))  # softplus: importance > 0


SCORERS["mlp"] = MLPScorer


def detail_adaptive_k(
    cD: np.ndarray,
    target_cumulative_importance: float = 0.99,
    min_retention_rate: float = 0.1,
    scorer: str = "abs",
) -> list[tuple[np.ndarray, np.ndarray]]:
    """K7 adaptive-k variant (ref core/downsampling_algorithm3.py:146-171):
    normalize importances to sum 1, keep k = #{i : cumulative_importance_i <=
    target} largest coefficients (exactly the reference's
    ``sum(cumulative_importance <= target)`` — no inclusive +1), clamped to
    [round(L * min_retention_rate), L] (the reference uses tf.round, i.e.
    banker's rounding — np.round matches). Output is RAGGED -> list of
    (values, indices) per row (Arrow list columns downstream). Vectorized
    scoring; per-row cut is a searchsorted."""
    B, L = cD.shape
    imp = get_scorer(scorer)(cD).astype(np.float64)
    out = []
    min_k = max(1, int(np.round(L * min_retention_rate)))
    order = np.argsort(-imp, axis=1, kind="stable")
    sorted_imp = np.take_along_axis(imp, order, axis=1)
    totals = sorted_imp.sum(axis=1)
    for b in range(B):
        if totals[b] <= 0:
            k = min_k
        else:
            cum = np.cumsum(sorted_imp[b] / totals[b])
            # searchsorted(side='right') == count of cum entries <= target
            k = int(np.searchsorted(cum, target_cumulative_importance, side="right"))
            k = max(min_k, min(k, L))
        sel = np.sort(order[b, :k]).astype(np.int32)
        out.append((cD[b, sel], sel))
    return out


def detail_topk(
    cD: np.ndarray, retention_rate: float, scorer: str = "abs"
) -> tuple[np.ndarray, np.ndarray]:
    """Detail branch: keep the k = floor(len_cD * retention) largest-|cD|
    coefficients per row, ties broken toward the lower index, kept indices
    sorted ascending (ref core/downsampling_algorithm2.py:114-121 semantics via
    the deterministic |cD| scorer of new_evaluation.py:139-152).

    Returns (values (B,k), indices (B,k) int32).
    """
    if not 0.0 < retention_rate <= 1.0:
        # ref Test/downsampling-UnitTest.py:120-133 invalid-retention contract
        raise ValueError(f"retention_rate must be in (0, 1], got {retention_rate}")
    B, L = cD.shape
    k = int(np.floor(L * retention_rate))
    k = max(0, min(k, L))
    if k == 0:
        return np.zeros((B, 0)), np.zeros((B, 0), dtype=np.int32)
    order = np.argsort(-get_scorer(scorer)(cD), axis=1, kind="stable")  # stable => lowest index wins ties
    sel = np.sort(order[:, :k], axis=1).astype(np.int32)
    vals = np.take_along_axis(cD, sel, axis=1)
    return vals, sel


def downsample_coeffs(
    x: np.ndarray,
    wavelet: str = "db4",
    mode: str = "symmetric",
    retention_rate: float = 0.8,
    approx_ds_factor: int = 2,
    *,
    level: int = 1,
) -> dict:
    """Reference-model-shaped output: combined [pooled-approx ∥ top-k-detail]
    coefficient vector + per-branch kept coefficient indices.

    Mirrors the contract of ``WaveletDownsamplingModel.call(return_indices=True)``
    (ref core/downsampling_algorithm2.py:288-342): for n=200/db4/level1/symmetric/
    retention 0.8/factor 2 the combined length is 51 + 82 = 133.
    """
    x = np.atleast_2d(x)
    cA, cD = wavedec_cAcD(x, wavelet, mode, level)
    a_vals, a_idx = approx_pool(cA, approx_ds_factor)
    d_vals, d_idx = detail_topk(cD, retention_rate)
    return {
        "combined": np.concatenate([a_vals, d_vals], axis=1),
        "approx_indices": a_idx,
        "detail_indices": d_idx,
        "len_cA": cA.shape[1],
        "len_cD": cD.shape[1],
    }


def downsample_points(
    x: np.ndarray,
    wavelet: str = "db4",
    mode: str = "symmetric",
    retention_rate: float = 0.8,
    approx_ds_factor: int = 2,
    detail_selector: str = "topk",
    scorer: str = "abs",
    target_cumulative_importance: float = 0.99,
    min_retention_rate: float = 0.1,
    *,
    level: int = 1,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Point-space downsampling (the engine's primary tier output).

    Exactly the reference's deterministic ``wavelet_thresholding`` recipe
    (new_evaluation.py:139-152) generalized to its model's knobs: kept original
    positions = unique(strided-approx positions ∪ selected-detail positions
    mapped back by ``idx * n / len_c``), values gathered from the ORIGINAL
    signal. ``detail_selector``: "topk" (fixed k = floor(len*retention)) or
    "adaptive" (K7 cumulative-importance cut, ragged k per row).
    Output per row is ragged -> list of (kept_idx int32 ascending, values f64).
    """
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    B, n = x.shape
    cA, cD = wavedec_cAcD(x, wavelet, mode, level)
    _, a_idx = approx_pool(cA, approx_ds_factor)
    if detail_selector == "adaptive":
        d_idx_list = [
            idx
            for _, idx in detail_adaptive_k(
                cD, target_cumulative_importance, min_retention_rate, scorer
            )
        ]
    else:
        _, d_idx = detail_topk(cD, retention_rate, scorer)
        d_idx_list = [d_idx[b] for b in range(B)]
    len_cA, len_cD = cA.shape[1], cD.shape[1]
    a_pos = np.clip((a_idx.astype(np.float64) * (n / len_cA)).astype(np.int64), 0, n - 1)
    out = []
    for b in range(B):
        d_pos = np.clip(
            (d_idx_list[b].astype(np.float64) * (n / len_cD)).astype(np.int64), 0, n - 1
        )
        kept = np.unique(np.concatenate([a_pos, d_pos])).astype(np.int32)
        out.append((kept, x[b, kept]))
    return out


# ---------------------------------------------------------------------------
# Baseline downsampler library (ref new_evaluation.py:66-183). All take
# (signal 1-D, target_length) -> (indices int64 ascending-ish, values).
# ---------------------------------------------------------------------------

def uniform_downsample(signal: np.ndarray, target_length: int):
    """B1, ref new_evaluation.py:66-72."""
    n = len(signal)
    step = max(1, n // target_length)
    idx = np.arange(0, n, step)[:target_length]
    idx = np.clip(idx, 0, n - 1)
    return idx, signal[idx]


def average_pool_downsample(signal: np.ndarray, target_length: int):
    """B2, ref new_evaluation.py:74-83 — non-overlapping window mean."""
    n = len(signal)
    w = max(1, n // target_length)
    idx = np.clip(np.arange(0, n, w)[:target_length], 0, n - 1)
    vals = np.array([signal[i : i + w].mean() if len(signal[i : i + w]) else signal[i] for i in idx])
    return idx, vals


def max_pool_downsample(signal: np.ndarray, target_length: int):
    """B3, ref new_evaluation.py:85-94."""
    n = len(signal)
    w = max(1, n // target_length)
    idx = np.clip(np.arange(0, n, w)[:target_length], 0, n - 1)
    vals = np.array([signal[i : i + w].max() if len(signal[i : i + w]) else signal[i] for i in idx])
    return idx, vals


def random_downsample(signal: np.ndarray, target_length: int, seed: int = 42):
    """B4, ref new_evaluation.py:96-101 — engine seeds explicitly for determinism."""
    n = len(signal)
    rng = np.random.default_rng(seed)
    idx = np.sort(rng.choice(n, size=min(target_length, n), replace=False))
    return idx, signal[idx]


def lttb_downsample(signal: np.ndarray, target_length: int):
    """B5 Largest-Triangle-Three-Buckets (ref new_evaluation.py:103-115 uses the
    tsdownsample lib; here the public LTTB algorithm in NumPy, x = sample index)."""
    n = len(signal)
    if target_length >= n:
        return np.arange(n), np.asarray(signal, dtype=np.float64)
    if target_length < 3:
        idx = np.array([0]) if target_length < 2 else np.array([0, n - 1])
        return idx, signal[idx]
    x = np.arange(n, dtype=np.float64)
    y = np.asarray(signal, dtype=np.float64)
    # bucket boundaries for the interior points
    bounds = np.linspace(1, n - 1, target_length - 1).astype(np.int64)
    idx_out = np.empty(target_length, dtype=np.int64)
    idx_out[0] = 0
    idx_out[-1] = n - 1
    a = 0
    for i in range(target_length - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = hi, bounds[i + 2] if i + 2 < len(bounds) else n
        if nhi <= nlo:
            nhi = nlo + 1
        avg_x = x[nlo:nhi].mean()
        avg_y = y[nlo:nhi].mean()
        ax, ay = x[a], y[a]
        areas = np.abs((ax - avg_x) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (avg_y - ay))
        a = lo + int(np.argmax(areas))
        idx_out[i + 1] = a
    return idx_out, y[idx_out]


def minmax_downsample(signal: np.ndarray, target_length: int):
    """B6, ref new_evaluation.py:117-137 — per-window min & max points (window
    order: [min, max] unless the same position; truncated to target)."""
    n = len(signal)
    w = max(1, n // target_length)
    idx_list: list[int] = []
    val_list: list[float] = []
    for i in range(0, n, w):
        win = signal[i : i + w]
        if len(win) == 0:
            continue
        mi = i + int(np.argmin(win))
        ma = i + int(np.argmax(win))
        if mi == ma:
            idx_list.append(mi)
            val_list.append(float(win[0]))
        else:
            idx_list.extend([mi, ma])
            val_list.extend([float(win.min()), float(win.max())])
    idx = np.array(idx_list[:target_length], dtype=np.int64)
    return idx, np.array(val_list[:target_length])


def pip_downsample(signal: np.ndarray, target_length: int):
    """B8 Perceptually-Important-Points (ref new_evaluation.py:154-183): greedy
    insertion of the point with max perpendicular distance to its enclosing
    segment. O(n * target) here (vectorized inner scan vs the reference's
    O(n^2 * target) Python loops)."""
    n = len(signal)
    y = np.asarray(signal, dtype=np.float64)
    if target_length >= n:
        return np.arange(n), y
    idx = [0, n - 1]
    while len(idx) < target_length:
        best_d, best_i = -1.0, -1
        for j in range(len(idx) - 1):
            x1, x2 = idx[j], idx[j + 1]
            if x2 - x1 < 2:
                continue
            y1, y2 = y[x1], y[x2]
            xs = np.arange(x1 + 1, x2)
            d = np.abs((y2 - y1) * xs - (x2 - x1) * y[xs] + x2 * y1 - x1 * y2) / np.hypot(
                y2 - y1, x2 - x1
            )
            m = int(np.argmax(d))
            if d[m] > best_d:
                best_d, best_i = float(d[m]), int(xs[m])
        if best_i < 0:
            break
        import bisect

        bisect.insort(idx, best_i)
    idx = np.array(idx[:target_length], dtype=np.int64)
    return idx, y[idx]


def wavelet_threshold_downsample(signal: np.ndarray, target_length: int, wavelet: str = "db4"):
    """B7 / K9, ref new_evaluation.py:139-152 — the deterministic blueprint:
    top ``target//2`` detail coeffs by |cD| + strided approx coeffs, both mapped
    to original positions, unioned, values from the original signal."""
    y = np.asarray(signal, dtype=np.float64)
    n = len(y)
    cA, cD = dwt1(y[None, :], wavelet, "symmetric")
    cA, cD = cA[0], cD[0]
    order = np.argsort(-np.abs(cD), kind="stable")
    sel = np.sort(order[: target_length // 2])
    mapped = np.clip((sel * (n / len(cD))).astype(np.int64), 0, n - 1)
    a_idx = np.arange(0, len(cA), max(1, len(cA) // (target_length // 2)))
    a_pos = np.clip((a_idx * (n / len(cA))).astype(np.int64), 0, n - 1)
    kept = np.unique(np.concatenate([a_pos, mapped]))[:target_length]
    return kept, y[kept]


def reconstruct_signal(indices: np.ndarray, values: np.ndarray, original: np.ndarray) -> np.ndarray:
    """B9, ref new_evaluation.py:185-198 — sorted-index linear interpolation back
    to full length, endpoints force-included from the original signal."""
    n = len(original)
    order = np.argsort(indices)
    idx = np.asarray(indices)[order]
    vals = np.asarray(values, dtype=np.float64)[order]
    if idx[0] != 0:
        idx = np.insert(idx, 0, 0)
        vals = np.insert(vals, 0, original[0])
    if idx[-1] != n - 1:
        idx = np.append(idx, n - 1)
        vals = np.append(vals, original[-1])
    return np.interp(np.arange(n), idx, vals)


def compute_metrics(original: np.ndarray, reconstructed: np.ndarray) -> dict:
    """B10 + K8, ref new_evaluation.py:200-209 and the loss at
    core/downsampling_algorithm2.py:397-402: MSE/RMSE/MAE/R²/corr/spectral-MSE."""
    o = np.asarray(original, dtype=np.float64)
    r = np.asarray(reconstructed, dtype=np.float64)
    err = o - r
    mse = float(np.mean(err**2))
    var = float(np.var(o))
    corr = float(np.corrcoef(o, r)[0, 1]) if np.std(o) > 0 and np.std(r) > 0 else 0.0
    spec = float(np.mean((np.abs(np.fft.fft(o)) - np.abs(np.fft.fft(r))) ** 2))
    return {
        "mse": mse,
        "rmse": float(np.sqrt(mse)),
        "mae": float(np.mean(np.abs(err))),
        "r2": 1.0 - mse / var if var > 0 else 0.0,
        "corr": corr,
        "spectral_mse": spec,
    }
