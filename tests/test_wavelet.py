"""Kernel tests mirroring the reference's unit suite
(ref Test/downsampling-UnitTest.py:52-133) plus perfect-reconstruction and
determinism properties the reference lacks (SURVEY §5, §7.8)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsrollup import wavelet as wv


def test_coeff_lengths_db4_l200():
    # ref core/downsampling_algorithm2.py:8-23 — len_cA == len_cD == 103
    assert wv.coeff_len(200, "db4") == 103
    cA, cD = wv.dwt1(np.zeros((2, 200)), "db4", "symmetric")
    assert cA.shape == (2, 103) and cD.shape == (2, 103)


@pytest.mark.parametrize("n,w,expect", [(4, "haar", 2), (7, "haar", 4), (200, "db2", 101)])
def test_coeff_lengths_other(n, w, expect):
    assert wv.coeff_len(n, w) == expect


def test_haar_known_values():
    cA, cD = wv.dwt1(np.array([[1.0, 2, 3, 4]]), "haar", "symmetric")
    np.testing.assert_allclose(cA[0], [3 / np.sqrt(2), 7 / np.sqrt(2)])
    np.testing.assert_allclose(cD[0], [-1 / np.sqrt(2), -1 / np.sqrt(2)])


@pytest.mark.parametrize("w", ["haar", "db2", "db4"])
@pytest.mark.parametrize("n", [8, 16, 50, 200])
def test_perfect_reconstruction_periodization(w, n):
    x = np.random.default_rng(0).standard_normal((3, n))
    cA, cD = wv.dwt1(x, w, "periodization")
    xr = wv.idwt1_periodization(cA, cD, w, n)
    np.testing.assert_allclose(xr, x, atol=1e-10)


def test_batch_matches_rowwise():
    x = np.random.default_rng(1).standard_normal((8, 64))
    cA, cD = wv.dwt1(x, "db4", "symmetric")
    for i in range(8):
        a1, d1 = wv.dwt1(x[i : i + 1], "db4", "symmetric")
        np.testing.assert_array_equal(cA[i], a1[0])
        np.testing.assert_array_equal(cD[i], d1[0])


def test_combined_length_matches_reference_arithmetic():
    # ref-derived: L=200, db4, level1, symmetric, factor 2, retention 0.8 -> 51+82=133
    out = wv.downsample_coeffs(np.random.default_rng(2).standard_normal((4, 200)))
    assert out["combined"].shape == (4, 133)
    assert out["len_cA"] == out["len_cD"] == 103
    assert len(out["approx_indices"]) == 51
    assert out["detail_indices"].shape == (4, 82)


def test_topk_index_bounds_and_sortedness():
    # ref Test/downsampling-UnitTest.py:118-119 property: 0 <= idx < seq_len, ascending
    cD = np.random.default_rng(3).standard_normal((5, 103))
    vals, idx = wv.detail_topk(cD, 0.8)
    assert idx.shape == (5, 82)
    assert (idx >= 0).all() and (idx < 103).all()
    assert (np.diff(idx, axis=1) > 0).all()
    np.testing.assert_array_equal(vals, np.take_along_axis(cD, idx, axis=1))


def test_topk_tie_break_lowest_index():
    cD = np.array([[1.0, -1.0, 1.0, 0.5]])
    _, idx = wv.detail_topk(cD, 0.5)  # k=2 -> ties on |1.0| broken to indices 0,1
    np.testing.assert_array_equal(idx, [[0, 1]])


def test_approx_pool_truncates_odd_tail():
    cA = np.arange(10.0).reshape(1, 10)[:, :7]  # len 7, factor 2 -> 3 pooled
    vals, idx = wv.approx_pool(cA, 2)
    np.testing.assert_allclose(vals, [[0.5, 2.5, 4.5]])
    np.testing.assert_array_equal(idx, [0, 2, 4])
    assert len(idx) == vals.shape[1]  # indices always align with values


def test_downsample_points_invariants():
    x = np.random.default_rng(4).standard_normal((3, 200))
    for kept, vals in wv.downsample_points(x):
        assert (np.diff(kept) > 0).all()
        assert kept.min() >= 0 and kept.max() < 200
        assert len(kept) == len(vals)
    # values come from the original signal
    [(kept, vals)] = wv.downsample_points(x[:1])
    np.testing.assert_array_equal(vals, x[0, kept])


def test_baselines_contract():
    sig = np.sin(np.linspace(0, 10, 200)) + np.random.default_rng(5).standard_normal(200) * 0.1
    for fn in (
        wv.uniform_downsample,
        wv.average_pool_downsample,
        wv.max_pool_downsample,
        wv.lttb_downsample,
        wv.minmax_downsample,
        wv.wavelet_threshold_downsample,
    ):
        idx, vals = fn(sig, 40)
        assert len(idx) == len(vals) <= 42
        assert (idx >= 0).all() and (idx < 200).all()
    idx, vals = wv.pip_downsample(sig, 10)
    assert len(idx) == 10 and idx[0] == 0 and idx[-1] == 199
    idx, vals = wv.random_downsample(sig, 40, seed=1)
    idx2, _ = wv.random_downsample(sig, 40, seed=1)
    np.testing.assert_array_equal(idx, idx2)  # seeded => deterministic


def test_lttb_keeps_endpoints_and_improves_on_uniform():
    rng = np.random.default_rng(6)
    sig = np.cumsum(rng.standard_normal(500))
    idx, vals = wv.lttb_downsample(sig, 50)
    assert idx[0] == 0 and idx[-1] == 499 and len(idx) == 50
    rec_l = wv.reconstruct_signal(idx, vals, sig)
    iu, vu = wv.uniform_downsample(sig, 50)
    rec_u = wv.reconstruct_signal(iu, vu, sig)
    assert wv.compute_metrics(sig, rec_l)["mse"] <= wv.compute_metrics(sig, rec_u)["mse"] * 1.5


def test_reconstruct_endpoints_forced():
    # ref new_evaluation.py:190-195 — endpoints included from the original
    sig = np.arange(10.0)
    rec = wv.reconstruct_signal(np.array([3, 6]), np.array([3.0, 6.0]), sig)
    assert rec[0] == sig[0] and rec[-1] == sig[-1]
    np.testing.assert_allclose(rec, sig)  # linear signal reconstructs exactly


def test_metrics_identical_signals():
    # ref Test/downsampling-UnitTest.py:199-211 analog: loss ~ 0 on identity
    sig = np.random.default_rng(7).standard_normal(128)
    m = wv.compute_metrics(sig, sig.copy())
    assert m["mse"] == 0 and m["spectral_mse"] < 1e-20 and m["r2"] == 1.0


def test_invalid_wavelet_raises():
    with pytest.raises(ValueError):
        wv.filter_bank("nope")


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=16, max_value=256),
    retention=st.floats(min_value=0.1, max_value=1.0),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_downsample_points_property(n, retention, seed):
    x = np.random.default_rng(seed).standard_normal((1, n)) * 100
    [(kept, vals)] = wv.downsample_points(x, retention_rate=retention)
    assert (np.diff(kept) > 0).all()
    assert 0 <= kept.min() and kept.max() < n
    np.testing.assert_array_equal(vals, x[0, kept])


import pytest as _pt


@_pt.mark.parametrize("family", ["haar", "db2", "db3", "db4", "sym2", "sym3", "sym4", "coif1"])
def test_filter_bank_properties_all_families(family):
    """Round-2: the extended family table (db3/sym/coif, public coefficients)
    must satisfy the orthogonal-filter axioms and perfectly reconstruct
    through the engine's own DWT."""
    import numpy as np

    from tsrollup import wavelet as wv

    h = wv._REC_LO[family]
    assert abs(h.sum() - np.sqrt(2)) < 1e-10
    assert abs((h * h).sum() - 1.0) < 1e-10
    for m in range(1, len(h) // 2):
        assert abs(np.dot(h[:-2 * m], h[2 * m:])) < 1e-10, (family, m)
    x = np.random.default_rng(2).standard_normal((3, 96))
    cA, cD = wv.dwt1(x, family, "periodization")
    rec = wv.idwt1_periodization(cA, cD, family, 96)
    np.testing.assert_allclose(rec, x, atol=1e-9)
    # symmetric mode shapes
    cA2, cD2 = wv.dwt1(x, family, "symmetric")
    assert cA2.shape[1] == wv.coeff_len(96, family, "symmetric")


@_pt.mark.parametrize("N", [5, 6, 8, 10, 16, 20])
def test_generated_daubechies_families(N):
    """dbN beyond the stored tables is computed by spectral factorization;
    it must satisfy the same orthogonal-filter axioms (length 2N, sum sqrt2,
    unit energy, even-shift orthogonality) and perfectly reconstruct."""
    import numpy as np

    from tsrollup import wavelet as wv

    h = wv.filter_bank(f"db{N}")[2]  # rec_lo
    assert len(h) == 2 * N
    assert abs(h.sum() - np.sqrt(2)) < 1e-8
    assert abs((h * h).sum() - 1.0) < 1e-8
    for m in range(1, N):
        assert abs(np.dot(h[:-2 * m], h[2 * m:])) < 1e-7, (N, m)
    x = np.random.default_rng(3).standard_normal((2, 128))
    cA, cD = wv.dwt1(x, f"db{N}", "periodization")
    rec = wv.idwt1_periodization(cA, cD, f"db{N}", 128)
    np.testing.assert_allclose(rec, x, atol=1e-7)


def test_generated_daubechies_matches_published_tables():
    """The spectral-factorization construction reproduces the published
    db2/db3/db4 coefficient tables (so stored and generated families agree)."""
    import numpy as np

    from tsrollup import wavelet as wv

    for N in (2, 3, 4):
        np.testing.assert_allclose(
            wv._daubechies_rec_lo(N), wv._REC_LO[f"db{N}"], atol=1e-12
        )


def test_unknown_wavelet_rejected_fast():
    import pytest

    from tsrollup.config import RollupConfig

    with pytest.raises(ValueError, match="unsupported wavelet"):
        RollupConfig(wavelet="nope2")
    with pytest.raises(ValueError, match="unsupported wavelet"):
        RollupConfig(wavelet="db99")
