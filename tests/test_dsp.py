"""DSP parity tests: JAX ops vs independent numpy/scipy references.

The numpy reference implementations below are written directly from the
transform definitions the reference repo uses (reflect-padded centered
STFT with a periodic Hann window, Slaney mel basis, dB scaling and
normalization from src/audio_tacotron.py:221-254), NOT from our JAX code —
they are the spec the JAX ops must match at fp32 tolerance.
"""

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.config import AudioConfig
from neural_sound_generation_tpu.ops import dsp, mel as mel_lib

CFG = AudioConfig()


def _np_hann(n):
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def _np_stft(y, n_fft, hop):
    """Independent centered STFT (librosa convention)."""
    pad = n_fft // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(yp) - n_fft) // hop
    win = _np_hann(n_fft)
    frames = np.stack(
        [yp[i * hop : i * hop + n_fft] * win for i in range(n_frames)]
    )
    return np.fft.rfft(frames, axis=-1)  # (frames, freq)


def _np_amp_to_db(x, min_level_db):
    min_level = np.exp(min_level_db / 20 * np.log(10))
    return 20 * np.log10(np.maximum(min_level, x))


def _np_normalize(S, cfg):
    m, mdb = cfg.max_abs_value, cfg.min_level_db
    if cfg.symmetric_mels:
        return np.clip((2 * m) * ((S - mdb) / (-mdb)) - m, -m, m)
    return np.clip(m * ((S - mdb) / (-mdb)), 0, m)


def _tone(sr=22050, seconds=0.5, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    rng = np.random.default_rng(0)
    return (
        0.5 * np.sin(2 * np.pi * freq * t)
        + 0.1 * np.sin(2 * np.pi * 3 * freq * t)
        + 0.01 * rng.standard_normal(len(t))
    ).astype(np.float32)


# ---------------------------------------------------------------------------


def test_hann_window_matches_scipy():
    ours = np.asarray(dsp.hann_window(1024))
    ref = scipy.signal.get_window("hann", 1024, fftbins=True)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_stft_matches_numpy_reference():
    y = _tone()
    ours = np.asarray(dsp.stft(jnp.asarray(y), 1024, 256))
    ref = _np_stft(y.astype(np.float64), 1024, 256)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-2)
    # magnitudes tight relative to spectral peak
    err = np.abs(np.abs(ours) - np.abs(ref)).max() / np.abs(ref).max()
    assert err < 1e-5


def test_stft_frame_count():
    y = _tone(seconds=1.0)
    D = dsp.stft(jnp.asarray(y), 1024, 256)
    assert D.shape[0] == dsp.num_stft_frames(len(y), 1024, 256)
    assert D.shape[1] == 513


def test_istft_roundtrip():
    y = _tone()
    D = dsp.stft(jnp.asarray(y), 1024, 256)
    y2 = np.asarray(dsp.istft(D, 1024, 256, length=len(y)))
    assert len(y2) == len(y)
    # hann @ 4x overlap satisfies COLA; interior samples (excluding the
    # final partial frame, unreconstructible by any centered ISTFT)
    # reconstruct exactly
    n = 256 * (D.shape[0] - 1)  # librosa reconstructible length
    np.testing.assert_allclose(y2[512 : n - 512], y[512 : n - 512], atol=1e-4)


def test_preemphasis_matches_scipy_lfilter():
    y = _tone()
    ours = np.asarray(dsp.preemphasis(jnp.asarray(y), 0.97))
    ref = scipy.signal.lfilter([1, -0.97], [1], y.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_inv_preemphasis_matches_scipy_lfilter():
    y = _tone(seconds=0.2)
    ours = np.asarray(dsp.inv_preemphasis(jnp.asarray(y), 0.97))
    ref = scipy.signal.lfilter([1], [1, -0.97], y.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_preemphasis_roundtrip():
    y = _tone(seconds=0.2)
    z = dsp.inv_preemphasis(dsp.preemphasis(jnp.asarray(y), 0.97), 0.97)
    np.testing.assert_allclose(np.asarray(z), y, atol=1e-4)


def test_preemphasis_disabled_passthrough():
    y = jnp.asarray(_tone(seconds=0.05))
    assert np.allclose(dsp.preemphasis(y, 0.97, preemphasize=False), y)
    assert np.allclose(dsp.inv_preemphasis(y, 0.97, inv_preemphasize=False), y)


def test_amp_db_roundtrip():
    x = np.abs(np.random.default_rng(0).standard_normal(100)).astype(np.float32) + 0.01
    db = dsp.amp_to_db(jnp.asarray(x), -100.0)
    np.testing.assert_allclose(np.asarray(db), _np_amp_to_db(x, -100.0), atol=1e-4)
    back = dsp.db_to_amp(db)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4)


@pytest.mark.parametrize("symmetric", [False, True])
@pytest.mark.parametrize("max_abs", [1.0, 4.0])
def test_normalize_denormalize(symmetric, max_abs):
    cfg = AudioConfig(symmetric_mels=symmetric, max_abs_value=max_abs)
    S = np.random.default_rng(1).uniform(-120, 0, size=(80, 50)).astype(np.float32)
    ours = np.asarray(dsp.normalize_spectrogram(jnp.asarray(S), cfg))
    ref = _np_normalize(S, cfg)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # denormalize inverts for in-range values
    S_in = np.clip(S, cfg.min_level_db, 0)
    rt = np.asarray(
        dsp.denormalize_spectrogram(
            dsp.normalize_spectrogram(jnp.asarray(S_in), cfg), cfg
        )
    )
    np.testing.assert_allclose(rt, S_in, atol=1e-3)


def test_mulaw_formula_and_roundtrip():
    x = np.linspace(-1, 1, 101).astype(np.float32)
    for mu in (256, 65536):
        ours = np.asarray(dsp.mulaw(jnp.asarray(x), mu))
        ref = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        back = np.asarray(dsp.inv_mulaw(jnp.asarray(ours), mu))
        np.testing.assert_allclose(back, x, atol=1e-4)


def test_mulaw_quantize_range_and_midpoint():
    x = np.linspace(-0.999, 0.999, 1001).astype(np.float32)
    q = np.asarray(dsp.mulaw_quantize(jnp.asarray(x), 256))
    assert q.min() >= 0 and q.max() <= 256
    # reference quirk: mulaw_quantize(0, 256) == 128 (not 127)
    assert int(dsp.mulaw_quantize(jnp.asarray(0.0), 256)) == 128
    back = np.asarray(dsp.inv_mulaw_quantize(jnp.asarray(q), 256))
    assert np.abs(back - x).max() < 0.05  # quantization error bound


def test_start_and_end_indices_matches_python_scan():
    rng = np.random.default_rng(2)
    q = np.full(1000, 127, dtype=np.int32)
    q[100:900] = rng.integers(0, 256, 800)
    q[:100] = 127
    q[900:] = 128  # within threshold 2 of 127

    def ref_scan(quantized, silence_threshold=2):
        for start in range(quantized.size):
            if abs(int(quantized[start]) - 127) > silence_threshold:
                break
        for end in range(quantized.size - 1, 1, -1):
            if abs(int(quantized[end]) - 127) > silence_threshold:
                break
        return start, end

    s_ref, e_ref = ref_scan(q)
    s, e = dsp.start_and_end_indices(jnp.asarray(q), 2)
    assert (int(s), int(e)) == (s_ref, e_ref)


def test_lws_pad_math():
    # formulas from src/audio_tacotron.py:122-140
    for length in (12345, 16384, 100000, 255, 257):
        fsize, fshift = 1024, 256
        pad = fsize - fshift
        if length % fshift == 0:
            M = (length + pad * 2 - fsize) // fshift + 1
        else:
            M = (length + pad * 2 - fsize) // fshift + 2
        assert dsp.lws_num_frames(length, fsize, fshift) == M
        l, r = dsp.lws_pad_lr(length, fsize, fshift)
        assert l == pad
        assert (length + l + r) % fshift == 0
        T = length + 2 * pad
        assert r == pad + ((M - 1) * fshift + fsize - T)


def test_librosa_pad_alignment():
    # padded audio truncated to n_frames*hop aligns with mel frames
    for length in (9999, 22050, 4097):
        l, r = dsp.librosa_pad_lr(length, 1024, 256)
        n_frames = dsp.num_stft_frames(length, 1024, 256)
        assert (length + l + r) >= n_frames * 256


def test_melspectrogram_matches_numpy_chain():
    y = _tone()
    cfg = CFG
    ours = np.asarray(dsp.melspectrogram(jnp.asarray(y), cfg))
    # independent numpy chain
    yp = scipy.signal.lfilter([1, -cfg.preemphasis], [1], y.astype(np.float64))
    D = _np_stft(yp, cfg.fft_size, cfg.hop_size)
    basis = mel_lib.mel_basis(
        cfg.sample_rate, cfg.fft_size, cfg.num_mels, cfg.fmin, cfg.fmax, np.float64
    )
    S = _np_amp_to_db(basis @ np.abs(D).T, cfg.min_level_db) - cfg.ref_level_db
    ref = _np_normalize(S, cfg)
    assert ours.shape == ref.shape == (cfg.num_mels, dsp.num_stft_frames(len(y), 1024, 256))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_melspectrogram_batch_jit():
    y = np.stack([_tone(freq=440), _tone(freq=880)])
    out = np.asarray(dsp.melspectrogram_batch(jnp.asarray(y), CFG))
    single = np.asarray(dsp.melspectrogram(jnp.asarray(y[1]), CFG))
    np.testing.assert_allclose(out[1], single, atol=1e-5)


def test_griffin_lim_reconstructs_magnitude():
    y = _tone(seconds=0.4)
    cfg = AudioConfig(griffin_lim_iters=60)
    D = dsp.stft(jnp.asarray(dsp.preemphasis(jnp.asarray(y), 0.97)), 1024, 256)
    S = jnp.abs(D)
    rec = dsp.griffin_lim(S, cfg, jax.random.PRNGKey(0))
    S2 = jnp.abs(dsp.stft(rec, 1024, 256))
    # interior frames only: edge frames are partial and unreconstructible
    rel = float(
        jnp.linalg.norm(S2[3:-3] - S[3:-3]) / jnp.linalg.norm(S[3:-3])
    )
    assert rel < 0.15  # GL converges to matched magnitudes


def test_inv_mel_spectrogram_end_to_end():
    """mel -> waveform -> mel must land near the original mel (the
    reference's per-epoch reconstruction path, src/main.py:183-197)."""
    y = _tone(seconds=0.4)
    cfg = AudioConfig(griffin_lim_iters=30)
    mel = dsp.melspectrogram(jnp.asarray(y), cfg)
    wav = dsp.inv_mel_spectrogram(mel, cfg, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(wav)).all()
    mel2 = dsp.melspectrogram(wav[: len(y)], cfg)
    n = min(mel.shape[1], mel2.shape[1])
    # normalized mel in [0,1]; GL+pinv roundtrip keeps gross structure
    err = float(jnp.mean(jnp.abs(mel[:, :n] - mel2[:, :n])))
    assert err < 0.15


def test_adjust_time_resolution():
    q = jnp.asarray(np.random.default_rng(0).integers(0, 256, 1024), jnp.int32)
    mel = jnp.asarray(np.random.default_rng(1).normal(size=(4, 80)), jnp.float32)
    q2, mel_up, start, end = dsp.adjust_time_resolution(q, mel)
    assert mel_up.shape == (1024, 80)
    assert q2.shape == (1024,)


def test_save_load_wav_roundtrip(tmp_path):
    y = _tone(seconds=0.1)
    path = str(tmp_path / "x.wav")
    dsp.save_wav(y, path, 22050)
    back = dsp.load_wav(path, 22050)
    # save_wav peak-rescales; compare after matching scale
    scale = np.abs(y).max() / np.abs(back).max()
    np.testing.assert_allclose(back * scale, y, atol=2e-3)


def test_load_wav_resamples(tmp_path):
    y = _tone(sr=44100, seconds=0.1)
    path = str(tmp_path / "x44.wav")
    dsp.save_wav(y, path, 44100)
    back = dsp.load_wav(path, 22050)
    assert abs(len(back) - len(y) // 2) <= 2


def test_fast_griffin_lim_converges_faster():
    """Momentum GL at 15 iters should match or beat plain GL at 30 iters
    in spectral error (and default momentum=0 stays reference-exact)."""
    y = _tone(seconds=0.4)
    cfg = AudioConfig()
    D = dsp.stft(jnp.asarray(dsp.preemphasis(jnp.asarray(y), 0.97)), 1024, 256)
    S = jnp.abs(D)
    key = jax.random.PRNGKey(0)

    def spectral_err(rec):
        S2 = jnp.abs(dsp.stft(rec, 1024, 256))
        return float(jnp.linalg.norm(S2[3:-3] - S[3:-3]) / jnp.linalg.norm(S[3:-3]))

    plain30 = spectral_err(dsp.griffin_lim(S, cfg, key, 30))
    fast15 = spectral_err(dsp.griffin_lim(S, cfg, key, 15, momentum=0.99))
    assert fast15 <= plain30 * 1.05  # at half the iterations
    # momentum=0 path identical to the original implementation
    a = dsp.griffin_lim(S, cfg, key, 5)
    b = dsp.griffin_lim(S, cfg, key, 5, momentum=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_golden_regression():
    """Frozen outputs of the verified round-1 implementation — guards the
    DSP/VQ numerics against accidental changes in later rounds. If a test
    here fails after an *intentional* change, regenerate the fixture and
    document why in the commit."""
    import os

    from neural_sound_generation_tpu.ops.vq import vq

    path = os.path.join(os.path.dirname(__file__), "golden", "dsp_golden.npz")
    g = np.load(path)
    mel = np.asarray(dsp.melspectrogram(jnp.asarray(g["wav"]), AudioConfig()))
    np.testing.assert_allclose(mel, g["mel"], atol=1e-5)
    basis = mel_lib.mel_basis(22050, 1024, 80, 125.0, 7600.0, np.float64)
    np.testing.assert_allclose(
        basis[33].astype(np.float32), g["mel_basis_row33"], atol=1e-7
    )
    q = np.asarray(dsp.mulaw_quantize(jnp.asarray(g["wav"][:1000]), 256))
    np.testing.assert_array_equal(q, g["mulaw_q"])
    idx = np.asarray(vq(jnp.asarray(g["vq_x"]), jnp.asarray(g["vq_cb"])))
    np.testing.assert_array_equal(idx, g["vq_idx"])


@pytest.mark.parametrize("sr,fft,hop,mels,fmax", [
    (16000, 1024, 256, 80, 7600.0),
    (22050, 1024, 256, 40, 7600.0),   # hparams_tacotron num_mels=40
    (24000, 2048, 300, 80, 11000.0),
    (48000, 2048, 512, 128, 20000.0),
])
def test_mel_chain_config_grid(sr, fft, hop, mels, fmax):
    """Shape/bound invariants of the mel chain across sample-rate / FFT /
    mel-count configurations (the reference's presets span several)."""
    cfg = AudioConfig(sample_rate=sr, fft_size=fft, hop_size=hop,
                      num_mels=mels, fmax=fmax)
    y = jnp.asarray(_tone(sr=sr, seconds=0.3))
    S = dsp.melspectrogram(y, cfg)
    assert S.shape == (mels, dsp.num_stft_frames(y.shape[0], fft, hop))
    s_np = np.asarray(S)
    assert np.isfinite(s_np).all()
    assert s_np.min() >= 0.0 and s_np.max() <= cfg.max_abs_value + 1e-6
    # inversion runs and stays finite at this config
    wav = dsp.inv_mel_spectrogram(S, AudioConfig(
        sample_rate=sr, fft_size=fft, hop_size=hop, num_mels=mels,
        fmax=fmax, griffin_lim_iters=5), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(wav)).all()


def test_stft_matches_torch(rng):
    """Cross-library parity: torch.stft with librosa-convention settings
    (centered, reflect pad, periodic hann) is an independent third
    implementation; our JAX STFT must agree at fp32 tolerance."""
    import torch

    y = _tone(seconds=0.4)
    ours = np.asarray(dsp.stft(jnp.asarray(y), 1024, 256))  # (frames, freq)
    t = torch.stft(
        torch.tensor(y),
        n_fft=1024,
        hop_length=256,
        window=torch.hann_window(1024, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy().T  # torch gives (freq, frames)
    assert ours.shape == t.shape
    err = np.abs(ours - t).max() / np.abs(t).max()
    assert err < 1e-5


def test_mel_chain_matches_torch_pipeline(rng):
    """Full mel chain vs a torch-built pipeline (torch stft + our numpy
    Slaney basis + reference normalization formulas)."""
    import torch

    cfg = AudioConfig()
    y = _tone()
    ours = np.asarray(dsp.melspectrogram(jnp.asarray(y), cfg))

    yp = scipy.signal.lfilter([1, -cfg.preemphasis], [1], y.astype(np.float64))
    D = torch.stft(
        torch.tensor(yp.astype(np.float32)),
        n_fft=1024, hop_length=256,
        window=torch.hann_window(1024, periodic=True),
        center=True, pad_mode="reflect", return_complex=True,
    ).abs().numpy()  # (freq, frames)
    basis = mel_lib.mel_basis(22050, 1024, 80, 125.0, 7600.0, np.float64)
    S = _np_amp_to_db(basis @ D, cfg.min_level_db) - cfg.ref_level_db
    ref = _np_normalize(S, cfg)
    np.testing.assert_allclose(ours, ref, atol=2e-3)
