"""K7 adaptive-k detail selection (ref core/downsampling_algorithm3.py:146-171)
and the registered-scorer hook."""

import numpy as np
import pytest

from tsrollup import oracle, wavelet as wv
from tsrollup.config import RollupConfig
from tsrollup.synth import synth_table


def test_adaptive_k_cumulative_cut():
    # one dominant coefficient -> adaptive keeps far fewer than topk would
    cD = np.zeros((1, 100))
    cD[0, 7] = 100.0
    cD[0, 20] = 0.5
    out = wv.detail_adaptive_k(cD, target_cumulative_importance=0.99, min_retention_rate=0.05)
    vals, idx = out[0]
    assert 7 in idx and len(idx) <= 6  # floor = 5, dominant coeff caught
    np.testing.assert_array_equal(vals, cD[0, idx])


def test_adaptive_k_ragged_and_sorted():
    rng = np.random.default_rng(0)
    cD = rng.standard_normal((5, 103)) * (rng.random((5, 103)) < 0.3)
    out = wv.detail_adaptive_k(cD)
    ks = {len(idx) for _, idx in out}
    for _, idx in out:
        assert (np.diff(idx) > 0).all()
        assert idx.min() >= 0 and idx.max() < 103
    assert len(ks) > 1  # genuinely ragged across rows


def test_adaptive_k_floor_on_flat_importance():
    cD = np.ones((1, 40))
    out = wv.detail_adaptive_k(cD, target_cumulative_importance=0.99, min_retention_rate=0.25)
    _, idx = out[0]
    assert len(idx) >= 10  # floor(40 * 0.25)


def test_adaptive_k_zero_signal():
    cD = np.zeros((2, 50))
    for _, idx in wv.detail_adaptive_k(cD, min_retention_rate=0.1):
        assert len(idx) == 5


def test_scorer_registry():
    cD = np.array([[3.0, -4.0, 1.0]])
    _, i_abs = wv.detail_topk(cD, 0.34, scorer="abs")
    _, i_en = wv.detail_topk(cD, 0.34, scorer="energy")
    np.testing.assert_array_equal(i_abs, i_en)  # monotone transforms agree
    wv.register_scorer("inverse", lambda c: -np.abs(c))
    _, i_inv = wv.detail_topk(cD, 0.34, scorer="inverse")
    np.testing.assert_array_equal(i_inv, [[2]])  # smallest |cD| first
    with pytest.raises(KeyError):
        wv.detail_topk(cD, 0.5, scorer="missing")


def test_downsample_points_adaptive_selector():
    x = np.random.default_rng(1).standard_normal((2, 200))
    pts_ad = wv.downsample_points(x, detail_selector="adaptive")
    for b, (kept, vals) in enumerate(pts_ad):
        assert (np.diff(kept) > 0).all()
        np.testing.assert_array_equal(vals, x[b, kept])


def test_oracle_pipeline_with_adaptive_config():
    """The oracle composes the adaptive variant end-to-end (engine parity for
    this config is covered by the same shared-kernel path as topk golden)."""
    t = synth_table(seed=42, n_sources=2, base_span=2048)
    cfg = RollupConfig(detail_selector="adaptive", tiers=("1m",))
    out = oracle.pipeline(t, cfg)
    pts = out["points_1m"]
    assert len(pts) > 0
    for r in pts.itertuples(index=False):
        kept = np.asarray(r.kept_idx)
        assert (np.diff(kept) > 0).all() if len(kept) > 1 else True


def test_adaptive_k_exact_cut_semantics():
    """Round-2 regression (ADVICE wavelet.py:207): k must equal the count of
    cumulative importances <= target (ref downsampling_algorithm3
    ``sum(cumulative_importance <= target)`` — no inclusive +1), floored at
    round(L * min_retention_rate)."""
    # importances 4,3,2,1 -> normalized cum = .4, .7, .9, 1.0
    cD = np.array([[4.0, 3.0, 2.0, 1.0]])
    for target, exp_k in ((0.39, 1), (0.4, 1), (0.7, 2), (0.95, 3), (1.0, 4)):
        _, idx = wv.detail_adaptive_k(
            cD, target_cumulative_importance=target, min_retention_rate=0.25
        )[0]
        assert len(idx) == exp_k, (target, len(idx))
    # floor uses round (banker's), not floor: L=4, rate 0.4 -> round(1.6) = 2
    _, idx = wv.detail_adaptive_k(
        cD, target_cumulative_importance=0.01, min_retention_rate=0.4
    )[0]
    assert len(idx) == 2


def test_mlp_scorer_loads_weights_and_is_deterministic():
    """K4/K6/M8: the learned-scorer option — fixed weights from the shipped
    file, batch-invariant scoring, usable by both selectors."""
    rng = np.random.default_rng(3)
    cD = rng.standard_normal((6, 64))
    s = wv.get_scorer("mlp")
    imp = s(cD)
    assert imp.shape == cD.shape and (imp > 0).all()
    # row-independent: scoring rows separately matches the batch
    for b in range(6):
        np.testing.assert_allclose(s(cD[b : b + 1])[0], imp[b], rtol=0, atol=0)
    # selectable end-to-end
    _, idx = wv.detail_topk(cD, 0.5, scorer="mlp")
    assert idx.shape == (6, 32)
    out = wv.detail_adaptive_k(cD, scorer="mlp")
    assert len(out) == 6


def test_multilevel_wavedec():
    """dwt_level > 1 follows the reference's wavedec semantics: iterate the
    level-1 DWT on cA; coeff_len composes the per-level rule."""
    x = np.random.default_rng(5).standard_normal((3, 200))
    cA1, cD1 = wv.wavedec_cAcD(x, "db4", "symmetric", 1)
    a, d = wv.dwt1(x, "db4", "symmetric")
    np.testing.assert_array_equal(cA1, a)
    np.testing.assert_array_equal(cD1, d)
    cA2, cD2 = wv.wavedec_cAcD(x, "db4", "symmetric", 2)
    a2, d2 = wv.dwt1(cA1, "db4", "symmetric")
    np.testing.assert_array_equal(cA2, a2)
    np.testing.assert_array_equal(cD2, d2)
    assert cA2.shape[1] == wv.coeff_len(200, "db4", "symmetric", 2) == 55
    import pytest as _pt

    with _pt.raises(ValueError):
        wv.wavedec_cAcD(x, "db4", "symmetric", 0)
    from tsrollup.config import RollupConfig

    with _pt.raises(ValueError):
        RollupConfig(dwt_level=0)
