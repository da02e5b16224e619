"""On-device DSP ops: the parity-critical transform chain.

Rebuilds the reference audio chain (``src/audio_tacotron.py`` /
``src/audio.py``: preemphasis -> STFT -> mel -> amp_to_db -> normalize,
plus mu-law encode/decode/quantize and Griffin-Lim inversion) as pure JAX
functions with static shapes, so whole shards of utterances run batched on
TPU via ``jax.vmap`` + ``jit`` instead of the reference's per-utterance
numpy on a CPU process pool (``src/ljspeech.py:16-27``).

Conventions:
  * Core functions take a 1-D float32 signal and an ``AudioConfig``; all are
    jittable and vmappable. ``*_batch`` helpers provide the jitted batched
    entry points.
  * Spectrogram layout matches the reference API: ``melspectrogram`` returns
    ``(num_mels, n_frames)`` like ``src/audio_tacotron.py:70-78``; corpus
    preprocessors store the transpose (time-major), like the reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_sound_generation_tpu.config import AudioConfig
from neural_sound_generation_tpu.ops import mel as mel_lib

# ---------------------------------------------------------------------------
# Windows and framing
# ---------------------------------------------------------------------------


def hann_window(win_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (scipy get_window('hann', N, fftbins=True))."""
    n = jnp.arange(win_size, dtype=jnp.float32)
    return (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_size)).astype(dtype)


def num_stft_frames(length: int, fft_size: int, hop_size: int) -> int:
    """Frame count of a centered STFT (librosa convention)."""
    return 1 + (length + 2 * (fft_size // 2) - fft_size) // hop_size


def frame_signal(y: jnp.ndarray, frame_length: int, hop_size: int) -> jnp.ndarray:
    """Slice an already-padded signal into overlapping frames.

    Returns (n_frames, frame_length). Shapes are static so XLA tiles the
    downstream matmuls/FFTs onto the MXU.
    """
    n_frames = 1 + (y.shape[-1] - frame_length) // hop_size
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_size
        + jnp.arange(frame_length, dtype=jnp.int32)[None, :]
    )
    return y[idx]


# ---------------------------------------------------------------------------
# STFT / ISTFT (librosa-convention: centered, reflect padding, hann)
# ---------------------------------------------------------------------------


def stft(
    y: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_size: int | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Centered STFT; returns complex64 (n_frames, 1 + fft_size//2).

    Matches ``librosa.stft(y, n_fft, hop_length)`` defaults as used by
    ``src/audio_tacotron.py:154-158`` (modulo the (freq, time) transpose —
    we keep frames time-major, the TPU-friendly layout).

    ``center=False`` skips the internal reflect padding — for callers that
    pre-pad on host (e.g. the batched preprocessing engine, where padding
    is shift-variant and must use the true signal, not batch zero-fill).
    """
    win_size = win_size or fft_size
    if center:
        pad = fft_size // 2
        y = jnp.pad(y, (pad, pad), mode="reflect")
    frames = frame_signal(y, fft_size, hop_size)
    window = hann_window(win_size)
    if win_size < fft_size:
        lpad = (fft_size - win_size) // 2
        window = jnp.pad(window, (lpad, fft_size - win_size - lpad))
    return jnp.fft.rfft(frames * window[None, :], axis=-1)


def istft(
    spec: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_size: int | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add with window-sum-square
    normalization (librosa.istft convention, centered).

    ``spec``: complex (n_frames, 1 + fft_size//2). Returns float32 signal of
    ``length`` samples (default: hop_size * (n_frames - 1), the librosa
    centered-trim length).
    """
    win_size = win_size or fft_size
    n_frames = spec.shape[0]
    window = hann_window(win_size)
    if win_size < fft_size:
        lpad = (fft_size - win_size) // 2
        window = jnp.pad(window, (lpad, fft_size - win_size - lpad))

    frames = jnp.fft.irfft(spec, n=fft_size, axis=-1) * window[None, :]

    full_len = fft_size + hop_size * (n_frames - 1)
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_size
        + jnp.arange(fft_size, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    y = jnp.zeros(full_len, dtype=frames.dtype).at[idx].add(frames.reshape(-1))

    wss = (
        jnp.zeros(full_len, dtype=jnp.float32)
        .at[idx]
        .add(jnp.tile(window**2, (n_frames,)))
    )
    y = jnp.where(wss > 1e-10, y / jnp.maximum(wss, 1e-10), y)

    pad = fft_size // 2
    y = y[pad : full_len - pad]
    if length is not None:
        if length > y.shape[0]:
            y = jnp.pad(y, (0, length - y.shape[0]))
        else:
            y = y[:length]
    return y


# ---------------------------------------------------------------------------
# Pre-emphasis (src/audio_tacotron.py:23-31)
# ---------------------------------------------------------------------------


def preemphasis(wav: jnp.ndarray, k: float, preemphasize: bool = True) -> jnp.ndarray:
    """FIR pre-emphasis: y[n] = x[n] - k*x[n-1] (scipy lfilter([1,-k],[1],x))."""
    if not preemphasize:
        return wav
    shifted = jnp.concatenate([jnp.zeros_like(wav[:1]), wav[:-1]])
    return wav - k * shifted


def inv_preemphasis(
    wav: jnp.ndarray, k: float, inv_preemphasize: bool = True
) -> jnp.ndarray:
    """IIR de-emphasis y[n] = x[n] + k*y[n-1] (scipy lfilter([1],[1,-k],x)).

    First-order linear recurrence evaluated as a parallel associative scan
    (log-depth on device) instead of a sequential host loop.
    """
    if not inv_preemphasize:
        return wav
    a = jnp.full_like(wav, k)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_l * a_r + b_r

    _, y = jax.lax.associative_scan(combine, (a, wav))
    return y


# ---------------------------------------------------------------------------
# dB scaling and normalization (src/audio_tacotron.py:221-254)
# ---------------------------------------------------------------------------


def amp_to_db(x: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    min_level = np.exp(min_level_db / 20 * np.log(10))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize_spectrogram(S: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """dB spectrogram -> normalized range (audio_tacotron.py:228-240)."""
    m = cfg.max_abs_value
    mdb = cfg.min_level_db
    if cfg.symmetric_mels:
        scaled = (2 * m) * ((S - mdb) / (-mdb)) - m
        return jnp.clip(scaled, -m, m) if cfg.allow_clipping_in_normalization else scaled
    scaled = m * ((S - mdb) / (-mdb))
    return jnp.clip(scaled, 0, m) if cfg.allow_clipping_in_normalization else scaled


def denormalize_spectrogram(D: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Inverse of normalize_spectrogram (audio_tacotron.py:242-254)."""
    m = cfg.max_abs_value
    mdb = cfg.min_level_db
    if cfg.symmetric_mels:
        if cfg.allow_clipping_in_normalization:
            D = jnp.clip(D, -m, m)
        return ((D + m) * -mdb / (2 * m)) + mdb
    if cfg.allow_clipping_in_normalization:
        D = jnp.clip(D, 0, m)
    return (D * -mdb / m) + mdb


# ---------------------------------------------------------------------------
# Mu-law (nnmnkwii.preprocessing semantics, as called by src/ljspeech.py:42-53)
# ---------------------------------------------------------------------------


def mulaw(x: jnp.ndarray, mu: int = 256) -> jnp.ndarray:
    """Mu-law companding to [-1, 1].

    NOTE: the reference passes ``mu = quantize_channels`` (256 or 65536),
    not ``quantize_channels - 1`` — we preserve that calling convention
    (``src/ljspeech.py:42``) for parity.
    """
    mu = float(mu)
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)


def inv_mulaw(y: jnp.ndarray, mu: int = 256) -> jnp.ndarray:
    mu = float(mu)
    return jnp.sign(y) * (1.0 / mu) * ((1.0 + mu) ** jnp.abs(y) - 1.0)


def mulaw_quantize(x: jnp.ndarray, mu: int = 256) -> jnp.ndarray:
    """Mu-law + quantize to integers in [0, mu] (truncation toward zero)."""
    y = mulaw(x, mu)
    return ((y + 1) / 2 * mu).astype(jnp.int32)


def inv_mulaw_quantize(y: jnp.ndarray, mu: int = 256) -> jnp.ndarray:
    return inv_mulaw(2.0 * y.astype(jnp.float32) / mu - 1.0, mu)


# ---------------------------------------------------------------------------
# Silence trimming
# ---------------------------------------------------------------------------


def start_and_end_indices(
    quantized: jnp.ndarray, silence_threshold: int = 2, midpoint: int = 127
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First/last sample where |q - midpoint| > threshold.

    Vectorized equivalent of the reference's Python scan
    (``src/audio_tacotron.py:34-45``). The reference hard-codes midpoint 127
    even though ``mulaw_quantize(0, 256) == 128`` (SURVEY.md §8 quirk); we
    default to 127 for behavioral parity but expose the midpoint.
    """
    loud = jnp.abs(quantized.astype(jnp.int32) - midpoint) > silence_threshold
    n = quantized.shape[0]
    start = jnp.argmax(loud)
    end = n - 1 - jnp.argmax(loud[::-1])
    return start, end


def trim_silence(wav: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Energy-based leading/trailing silence trim.

    Equivalent of ``librosa.effects.trim(wav, top_db, frame_length,
    hop_length)`` as used by ``src/audio_tacotron.py:47-52``: frame RMS
    power in dB relative to peak, keep [first, last] non-silent frames.
    Host-side (numpy): runs on ragged raw wavs before static-shape batching.
    """
    frame_length = cfg.trim_fft_size
    hop_length = cfg.trim_hop_size
    y = np.asarray(wav)
    if len(y) < frame_length:
        return y
    # Centered RMS frames (librosa.feature.rms convention: constant padding)
    pad = frame_length // 2
    yp = np.pad(y, (pad, pad), mode="constant")
    n_frames = 1 + (len(yp) - frame_length) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    mse = np.mean(yp[idx] ** 2, axis=-1)
    ref = mse.max()
    db = 10.0 * np.log10(np.maximum(mse, 1e-20) / max(ref, 1e-20))
    nonsilent = np.flatnonzero(db > -cfg.trim_top_db)
    if len(nonsilent) == 0:
        return y[:0]
    start = int(nonsilent[0] * hop_length)
    end = min(len(y), int((nonsilent[-1] + 1) * hop_length))
    return y[start:end]


# ---------------------------------------------------------------------------
# LWS-compatible frame padding math (src/audio_tacotron.py:122-140)
# ---------------------------------------------------------------------------


def lws_num_frames(length: int, fsize: int, fshift: int) -> int:
    """Frame count of an LWS spectrogram (pure integer math)."""
    pad = fsize - fshift
    if length % fshift == 0:
        return (length + pad * 2 - fsize) // fshift + 1
    return (length + pad * 2 - fsize) // fshift + 2


def lws_pad_lr(length: int, fsize: int, fshift: int) -> Tuple[int, int]:
    """Left/right padding that LWS applies internally; used to align the
    quantized waveform with mel frames (src/ljspeech.py:66-82)."""
    m = lws_num_frames(length, fsize, fshift)
    pad = fsize - fshift
    t = length + 2 * pad
    r = (m - 1) * fshift + fsize - t
    return pad, pad + r


def librosa_pad_lr(length: int, fsize: int, fshift: int) -> Tuple[int, int]:
    """Padding for the librosa centered-STFT convention: the mel chain here
    uses center padding of fft_size//2, so audio/mel alignment needs
    (fsize//2, fsize//2 + r) with r completing the final frame."""
    pad = fsize // 2
    m = num_stft_frames(length, fsize, fshift)
    r = (m - 1) * fshift + fsize - (length + 2 * pad)
    return pad, pad + r


# ---------------------------------------------------------------------------
# Spectrogram chains (src/audio_tacotron.py:62-116)
# ---------------------------------------------------------------------------


def _mel_matrix(cfg: AudioConfig) -> jnp.ndarray:
    return jnp.asarray(
        mel_lib.mel_basis(
            cfg.sample_rate, cfg.fft_size, cfg.num_mels, cfg.fmin, cfg.fmax
        )
    )


def _inv_mel_matrix(cfg: AudioConfig) -> jnp.ndarray:
    return jnp.asarray(
        mel_lib.inv_mel_basis(
            cfg.sample_rate, cfg.fft_size, cfg.num_mels, cfg.fmin, cfg.fmax
        )
    )


def _analysis_stft(y: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """STFT under the configured convention: librosa-centered by default,
    or the LWS speech-mode framing when ``cfg.use_lws``
    (``src/audio_tacotron.py:154-158`` dispatches the same way)."""
    if cfg.use_lws:
        from neural_sound_generation_tpu.ops.lws import lws_stft

        return lws_stft(y, cfg.fft_size, cfg.effective_hop_size)
    return stft(y, cfg.fft_size, cfg.effective_hop_size, cfg.effective_win_size)


@functools.partial(jax.jit, static_argnums=(1,))
def linearspectrogram(wav: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Normalized linear dB spectrogram, (1 + fft_size//2, n_frames)."""
    y = preemphasis(wav, cfg.preemphasis, cfg.preemphasize)
    D = _analysis_stft(y, cfg)
    S = amp_to_db(jnp.abs(D), cfg.min_level_db) - cfg.ref_level_db
    if cfg.signal_normalization:
        S = normalize_spectrogram(S, cfg)
    return S.T


@functools.partial(jax.jit, static_argnums=(1,))
def melspectrogram(wav: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Normalized mel dB spectrogram, (num_mels, n_frames).

    Parity target: ``src/audio_tacotron.py:70-78``. Default is the librosa
    centered STFT (the reference tacotron default, use_lws=False,
    hparams_tacotron.py:77); ``cfg.use_lws`` switches to the LWS
    speech-mode framing used by the wavenet-variant chain
    (``src/audio.py:95-101``, cmu_arctic/jsut/librivox).
    """
    y = preemphasis(wav, cfg.preemphasis, cfg.preemphasize)
    D = _analysis_stft(y, cfg)
    # |D|: (n_frames, n_freq); mel basis: (n_mels, n_freq) -> MXU matmul
    mel_mag = jnp.abs(D) @ _mel_matrix(cfg).T
    S = amp_to_db(mel_mag, cfg.min_level_db) - cfg.ref_level_db
    if cfg.signal_normalization:
        S = normalize_spectrogram(S, cfg)
    return S.T


@functools.partial(jax.jit, static_argnums=(1, 3, 4))
def griffin_lim(
    S: jnp.ndarray,
    cfg: AudioConfig,
    key: jax.Array,
    n_iters: int | None = None,
    momentum: float = 0.0,
) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction, fully on device.

    ``S``: magnitude spectrogram (n_frames, n_freq). The reference runs 60
    numpy iterations per utterance on host (``src/audio_tacotron.py:142-152``,
    a hot CPU loop per SURVEY §3.1); here the iteration is a
    ``lax.fori_loop`` of batched FFTs on the TPU.

    ``momentum`` > 0 enables fast Griffin-Lim (Perraudin et al. 2013):
    the projection is extrapolated by ``momentum``/(1+``momentum``).
    Measured on TPU (PERF.md): momentum 0.99 matches 60 plain iterations
    in ~30, and at equal 60 iterations halves the STFT-consistency error
    (0.091 vs 0.170). Default 0 keeps exact reference parity.
    """
    n_iters = cfg.griffin_lim_iters if n_iters is None else n_iters
    fft_size, hop = cfg.fft_size, cfg.effective_hop_size
    angles = jnp.exp(
        2j * jnp.pi * jax.random.uniform(key, S.shape, dtype=jnp.float32)
    ).astype(jnp.complex64)
    S_complex = jnp.abs(S).astype(jnp.complex64)
    y = istft(S_complex * angles, fft_size, hop)

    if momentum <= 0.0:
        def body(_, y):
            D = stft(y, fft_size, hop)
            angles = jnp.exp(1j * jnp.angle(D)).astype(jnp.complex64)
            return istft(S_complex * angles, fft_size, hop)

        return jax.lax.fori_loop(0, n_iters, body, y)

    alpha = momentum / (1.0 + momentum)
    D0 = stft(y, fft_size, hop)

    def fast_body(_, carry):
        y, t_prev = carry
        t = stft(y, fft_size, hop)
        t_ex = t + alpha * (t - t_prev)
        angles = jnp.exp(1j * jnp.angle(t_ex)).astype(jnp.complex64)
        y = istft(S_complex * angles, fft_size, hop)
        return y, t

    y, _ = jax.lax.fori_loop(0, n_iters, fast_body, (y, D0))
    return y


def _phase_reconstruct(S_pow: jnp.ndarray, cfg: AudioConfig, key: jax.Array):
    """Waveform from a linear magnitude**power spectrogram (n_freq, T):
    LWS phase estimation + LWS synthesis when ``cfg.use_lws``
    (``src/audio_tacotron.py:109-112`` / ``src/audio.py:86-92``),
    Griffin-Lim otherwise (``audio_tacotron.py:113-116``)."""
    if cfg.use_lws:
        from neural_sound_generation_tpu.ops.lws import lws_istft, run_lws

        D = run_lws(S_pow.T, cfg.fft_size, cfg.effective_hop_size,
                    iterations=cfg.lws_iterations, k_radius=cfg.lws_k_radius)
        return lws_istft(D, cfg.fft_size, cfg.effective_hop_size)
    return griffin_lim(S_pow.T, cfg, key, momentum=cfg.griffin_lim_momentum)


@functools.partial(jax.jit, static_argnums=(1,))
def inv_mel_spectrogram(
    mel_spectrogram: jnp.ndarray, cfg: AudioConfig, key: jax.Array
) -> jnp.ndarray:
    """Mel dB spectrogram (num_mels, n_frames) -> waveform.

    Parity target: ``src/audio_tacotron.py:99-116``: denormalize ->
    db_to_amp -> pinv mel basis -> power -> phase reconstruction (LWS when
    cfg.use_lws, else Griffin-Lim) -> inverse preemphasis.
    """
    D = mel_spectrogram
    if cfg.signal_normalization:
        D = denormalize_spectrogram(D, cfg)
    amp = db_to_amp(D + cfg.ref_level_db)  # (n_mels, T)
    S = jnp.maximum(1e-10, _inv_mel_matrix(cfg) @ amp)  # (n_freq, T)
    y = _phase_reconstruct(S**cfg.power, cfg, key)
    return inv_preemphasis(y, cfg.preemphasis, cfg.preemphasize)


@functools.partial(jax.jit, static_argnums=(1,))
def inv_linear_spectrogram(
    linear_spectrogram: jnp.ndarray, cfg: AudioConfig, key: jax.Array
) -> jnp.ndarray:
    """Linear dB spectrogram (n_freq, n_frames) -> waveform
    (src/audio_tacotron.py:80-96)."""
    D = linear_spectrogram
    if cfg.signal_normalization:
        D = denormalize_spectrogram(D, cfg)
    S = db_to_amp(D + cfg.ref_level_db)
    y = _phase_reconstruct(S**cfg.power, cfg, key)
    return inv_preemphasis(y, cfg.preemphasis, cfg.preemphasize)


# ---------------------------------------------------------------------------
# Time-resolution adjustment (src/audio.py:30-52)
# ---------------------------------------------------------------------------


def adjust_time_resolution(
    quantized: jnp.ndarray, mel: jnp.ndarray, silence_threshold: int = 2
):
    """Repeat mel frames to sample rate and align lengths with the waveform.

    Returns (quantized, upsampled_mel, start, end) — the caller slices with
    (start, end) host-side to keep shapes static under jit.
    """
    assert quantized.ndim == 1 and mel.ndim == 2
    upsample_factor = quantized.shape[0] // mel.shape[0]
    mel_up = jnp.repeat(mel, upsample_factor, axis=0)
    n_pad = quantized.shape[0] - mel_up.shape[0]
    if n_pad > 0:
        mel_up = jnp.pad(mel_up, [(0, n_pad), (0, 0)])
    start, end = start_and_end_indices(quantized, silence_threshold)
    return quantized, mel_up, start, end


# ---------------------------------------------------------------------------
# Batched jitted entry points (the TPU replacement for the reference's
# per-utterance ProcessPoolExecutor fan-out)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def melspectrogram_batch(wavs: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """(B, T) padded waveforms -> (B, num_mels, n_frames)."""
    return jax.vmap(lambda w: melspectrogram(w, cfg))(wavs)


@functools.partial(jax.jit, static_argnums=(1,))
def linearspectrogram_batch(wavs: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    return jax.vmap(lambda w: linearspectrogram(w, cfg))(wavs)


@functools.partial(jax.jit, static_argnums=(1,))
def inv_mel_spectrogram_batch(
    mels: jnp.ndarray, cfg: AudioConfig, keys: jax.Array
) -> jnp.ndarray:
    """(B, num_mels, T) -> (B, samples)."""
    return jax.vmap(lambda m, k: inv_mel_spectrogram(m, cfg, k))(mels, keys)


# ---------------------------------------------------------------------------
# Host-side WAV I/O (src/audio_tacotron.py:12-21 semantics, sans librosa)
# ---------------------------------------------------------------------------


def save_wav(wav: np.ndarray, path: str, sample_rate: int) -> None:
    """Peak-scale to int16 and write (src/audio_tacotron.py:15-18)."""
    from scipy.io import wavfile

    wav = np.asarray(wav, dtype=np.float32)
    wav = wav * (32767 / max(0.01, float(np.max(np.abs(wav)))))
    wavfile.write(path, sample_rate, wav.astype(np.int16))


def _decode_pcm(file_sr: int, data: np.ndarray, sample_rate: int) -> np.ndarray:
    """PCM array (any WAV dtype) -> mono float32 in [-1, 1] at
    ``sample_rate`` (polyphase resample when the file rate differs)."""
    from scipy.signal import resample_poly

    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if file_sr != sample_rate:
        g = np.gcd(int(file_sr), int(sample_rate))
        data = resample_poly(data, sample_rate // g, file_sr // g).astype(np.float32)
    return data


def load_wav(path: str, sample_rate: int) -> np.ndarray:
    """Read a WAV as float32 in [-1, 1]; resamples with polyphase filtering
    if the file rate differs (librosa.core.load semantics, scipy backend)."""
    from scipy.io import wavfile

    file_sr, data = wavfile.read(path)
    return _decode_pcm(file_sr, data, sample_rate)


def load_wav_bytes(wav_bytes: bytes, sample_rate: int) -> np.ndarray:
    """RIFF bytes -> mono float32 in [-1, 1] at ``sample_rate`` — the
    in-memory twin of ``load_wav`` (same dtype scaling and resampling)."""
    import io

    from scipy.io import wavfile

    file_sr, data = wavfile.read(io.BytesIO(wav_bytes))
    return _decode_pcm(file_sr, data, sample_rate)
