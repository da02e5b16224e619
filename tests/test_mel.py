"""Mel filterbank tests against the Slaney-scale definition."""

import numpy as np

from neural_sound_generation_tpu.ops import mel as mel_lib


def test_hz_mel_roundtrip():
    f = np.array([0.0, 125.0, 440.0, 999.0, 1000.0, 4000.0, 7600.0, 11025.0])
    np.testing.assert_allclose(mel_lib.mel_to_hz(mel_lib.hz_to_mel(f)), f, rtol=1e-10)


def test_slaney_linear_below_1khz():
    f = np.array([200.0, 500.0, 999.0])
    np.testing.assert_allclose(mel_lib.hz_to_mel(f), f * 3 / 200, rtol=1e-12)


def test_slaney_log_above_1khz():
    # mel(6400 Hz) = 15 + 27 by construction of logstep
    np.testing.assert_allclose(mel_lib.hz_to_mel(np.array([6400.0])), [42.0], rtol=1e-9)


def test_basis_shape_and_nonneg():
    W = mel_lib.mel_basis(22050, 1024, 80, 125.0, 7600.0)
    assert W.shape == (80, 513)
    assert (W >= 0).all()
    # every filter must have some support
    assert (W.sum(axis=1) > 0).all()


def test_basis_band_edges():
    W = mel_lib.mel_basis(22050, 1024, 80, 125.0, 7600.0, np.float64)
    freqs = mel_lib.fft_frequencies(22050, 1024)
    centers = mel_lib.mel_frequencies(82, 125.0, 7600.0)
    # filter i must be zero outside (centers[i], centers[i+2])
    for i in (0, 10, 40, 79):
        support = freqs[W[i] > 0]
        assert support.min() > centers[i] - 22050 / 1024
        assert support.max() < centers[i + 2] + 22050 / 1024


def test_slaney_normalization():
    """Slaney norm: sampled filter peak is <= the triangle apex 2/bw and
    within one FFT-bin of it."""
    W = mel_lib.mel_basis(22050, 1024, 80, 125.0, 7600.0, np.float64)
    centers = mel_lib.mel_frequencies(82, 125.0, 7600.0)
    bin_hz = 22050 / 1024
    for i in (5, 40, 70):
        lo, c, hi = centers[i], centers[i + 1], centers[i + 2]
        apex = 2.0 / (hi - lo)
        peak = W[i].max()
        assert peak <= apex + 1e-12
        # worst case: nearest bin is bin_hz/... one bin away from the apex
        slope = apex / min(c - lo, hi - c)
        assert peak >= apex - slope * bin_hz


def test_pinv_basis():
    W = mel_lib.mel_basis(22050, 1024, 80, 125.0, 7600.0, np.float64)
    Winv = mel_lib.inv_mel_basis(22050, 1024, 80, 125.0, 7600.0, np.float64)
    assert Winv.shape == (513, 80)
    # W @ pinv(W) ~ identity on the mel space
    np.testing.assert_allclose(W @ Winv, np.eye(80), atol=1e-6)


def test_golden_dot_against_brute_force_triangles():
    """Re-derive one filter row by brute force triangle evaluation."""
    sr, n_fft, n_mels, fmin, fmax = 22050, 1024, 80, 125.0, 7600.0
    W = mel_lib.mel_basis(sr, n_fft, n_mels, fmin, fmax, np.float64)
    freqs = mel_lib.fft_frequencies(sr, n_fft)
    edges = mel_lib.mel_frequencies(n_mels + 2, fmin, fmax)
    i = 33
    lo, c, hi = edges[i], edges[i + 1], edges[i + 2]
    tri = np.where(
        freqs < c,
        (freqs - lo) / (c - lo),
        (hi - freqs) / (hi - c),
    )
    tri = np.maximum(0.0, tri) * (2.0 / (hi - lo))
    np.testing.assert_allclose(W[i], tri, atol=1e-12)
