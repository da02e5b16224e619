"""Device-side LWS: the lws STFT framing convention and Local Weighted
Sums phase estimation, on TPU.

Parity target: the reference's wavenet-variant audio chain is LWS-only
(``src/audio.py:112-127`` — ``lws.lws(fft_size, hop_size, mode="speech")``;
``spectrogram``/``melspectrogram`` analyze with ``processor.stft``,
``inv_spectrogram`` reconstructs phase with ``processor.run_lws`` and
inverts with ``processor.istft``), feeding the cmu_arctic/jsut/librivox
preprocessors. Round 1 substituted the librosa centered convention +
Griffin-Lim everywhere; this module closes that deviation with a native
implementation of both halves:

- **Framing convention**: the signal is zero-padded by ``fsize - fshift``
  on the left and enough on the right to complete the last frame — the
  exact integer math of ``lws_num_frames``/``lws_pad_lr``
  (``src/audio.py:119-140``), already mirrored in ``ops.dsp``. Every real
  sample therefore sits under full window overlap (that is *why* lws
  pads), so a dual-window pair gives perfect reconstruction end to end,
  no window-sum-square division.
- **Windows**: analysis = periodic sqrt-Hann (the lws default for a
  scalar ``awin_or_fsize``), synthesis = its canonical dual
  ``awin / sum_q awin^2(t - q*fshift)`` (constant ``fsize/(2*fshift)``
  in the interior for hop-divisible sqrt-Hann).
- **Phase estimation**: Le Roux, Kameoka, Ono & Sagayama, "Fast signal
  reconstruction from magnitude STFT spectrogram based on spectrogram
  consistency" (DAFx 2010) — the algorithm the lws package implements.
  The consistency projection G = STFT o ISTFT is expanded analytically
  into local weighted sums over (frame offset q, frequency offset k)
  neighborhoods:

      (Gz)[m, w] = sum_{q,k} W[q, k] * exp(-2i*pi*(w-k)*q*H/N) * z[m+q, w-k]
      W[q, k]    = (1/N) * sum_u awin[u] * swin[u - q*H] * exp(-2i*pi*k*u/N)

  truncated to |k| <= k_radius (lws's ``L = 2*k_radius + 1``, default
  L=5) — for the sqrt-Hann pair the q=0 row is *exactly* 3 taps, and
  |q|>0 rows decay fast. Each iteration snaps magnitudes back to the
  target: z <- |S| * phase(Gz).

  TPU-native deviation (documented): updates are synchronous (Jacobi),
  evaluated for all bins in parallel on the VPU, where the C library
  updates bins sequentially in-place (Gauss-Seidel, magnitude-sorted).
  Both iterate toward the same spectrogram-consistency fixed point; the
  sequential order only changes the path. Tests bound the truncated
  kernel against the exact projection and the end-to-end reconstruction
  quality (tests/test_lws.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.ops.dsp import (
    frame_signal,
    lws_num_frames,
    lws_pad_lr,
)

__all__ = [
    "lws_windows",
    "lws_stft",
    "lws_istft",
    "lws_kernel_weights",
    "lws_apply_kernel",
    "run_lws",
]


@functools.lru_cache(maxsize=None)
def _windows_np(fsize: int, fshift: int) -> Tuple[np.ndarray, np.ndarray]:
    assert fsize % fshift == 0, "lws requires fshift | fsize"
    n = np.arange(fsize)
    awin = np.sqrt(0.5 * (1.0 - np.cos(2.0 * np.pi * n / fsize)))
    # canonical dual: swin = awin / sum_q awin^2(t - q*fshift); for the
    # periodic sqrt-Hann with fshift | fsize the denominator is the
    # constant fsize / (2 * fshift) at every t
    ola = np.zeros(fsize)
    for q in range(-(fsize // fshift) + 1, fsize // fshift):
        lo, hi = max(0, q * fshift), min(fsize, fsize + q * fshift)
        src = awin[lo - q * fshift : hi - q * fshift]
        ola[lo:hi] += src**2
    swin = awin / ola
    return awin.astype(np.float64), swin.astype(np.float64)


def lws_windows(fsize: int, fshift: int) -> Tuple[np.ndarray, np.ndarray]:
    """(analysis, synthesis) window pair of the speech-mode processor."""
    return _windows_np(fsize, fshift)


@functools.partial(jax.jit, static_argnums=(1, 2))
def lws_stft(y: jnp.ndarray, fsize: int, fshift: int) -> jnp.ndarray:
    """LWS-convention STFT: (lws_num_frames(len(y)), 1 + fsize//2)."""
    pad_l, pad_r = lws_pad_lr(y.shape[0], fsize, fshift)
    y = jnp.pad(y, (pad_l, pad_r))
    frames = frame_signal(y, fsize, fshift)
    awin = jnp.asarray(_windows_np(fsize, fshift)[0], dtype=y.dtype)
    return jnp.fft.rfft(frames * awin[None, :], axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def lws_stft_prepadded(p: jnp.ndarray, fsize: int, fshift: int) -> jnp.ndarray:
    """LWS STFT of a signal already padded on host (the batched
    preprocessing engine pre-pads per utterance; trailing zero-fill to the
    bucket length is harmless because the LWS convention pads with zeros)."""
    frames = frame_signal(p, fsize, fshift)
    awin = jnp.asarray(_windows_np(fsize, fshift)[0], dtype=p.dtype)
    return jnp.fft.rfft(frames * awin[None, :], axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def lws_istft(
    spec: jnp.ndarray, fsize: int, fshift: int, length: int | None = None
) -> jnp.ndarray:
    """Linear inverse of ``lws_stft``: synthesis-windowed overlap-add,
    then the lws left-pad crop. Perfect reconstruction for any signal
    (the padding guarantees full overlap over all real samples)."""
    n_frames = spec.shape[0]
    swin = jnp.asarray(_windows_np(fsize, fshift)[1], dtype=jnp.float32)
    frames = jnp.fft.irfft(spec, n=fsize, axis=-1).astype(jnp.float32)
    frames = frames * swin[None, :]
    full_len = fsize + fshift * (n_frames - 1)
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * fshift
        + jnp.arange(fsize, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    y = jnp.zeros(full_len, jnp.float32).at[idx].add(frames.reshape(-1))
    pad = fsize - fshift
    y = y[pad:]
    if length is not None:
        y = y[:length]
    return y


@functools.lru_cache(maxsize=None)
def _kernel_np(fsize: int, fshift: int, k_radius: int) -> np.ndarray:
    """W[q, k]: complex weights, shape (2*Q+1, 2*k_radius+1) with
    Q = fsize//fshift - 1 (window overlap reach). Derived exactly from
    the analysis/synthesis window pair; no tuning constants."""
    awin, swin = _windows_np(fsize, fshift)
    q_max = fsize // fshift - 1
    ks = np.arange(-k_radius, k_radius + 1)
    u = np.arange(fsize)
    weights = np.zeros((2 * q_max + 1, 2 * k_radius + 1), np.complex128)
    for qi, q in enumerate(range(-q_max, q_max + 1)):
        # swin shifted by q*fshift, zero outside [0, fsize)
        sh = np.zeros(fsize)
        lo, hi = max(0, q * fshift), min(fsize, fsize + q * fshift)
        sh[lo:hi] = swin[lo - q * fshift : hi - q * fshift]
        prod = awin * sh
        for ki, k in enumerate(ks):
            weights[qi, ki] = np.sum(prod * np.exp(-2j * np.pi * k * u / fsize)) / fsize
    return weights.astype(np.complex64)


def lws_kernel_weights(fsize: int, fshift: int, k_radius: int = 2) -> np.ndarray:
    return _kernel_np(fsize, fshift, k_radius)


def _freq_shift(v: jnp.ndarray, k: int) -> jnp.ndarray:
    """(shift_k v)[w] = v[w - k] over the half-spectrum of a real signal,
    extending past the edges by conjugate symmetry (v[-j] = conj(v[j]),
    v[N/2 + j] = conj(v[N/2 - j]))."""
    if k == 0:
        return v
    F = v.shape[-1]  # 1 + N/2
    if k > 0:
        head = jnp.conj(v[..., 1 : k + 1])[..., ::-1]  # v[-k..-1]
        return jnp.concatenate([head, v[..., : F - k]], axis=-1)
    k = -k
    tail = jnp.conj(v[..., F - 1 - k : F - 1])[..., ::-1]  # past Nyquist
    return jnp.concatenate([v[..., k:], tail], axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def lws_apply_kernel(
    z: jnp.ndarray, fsize: int, fshift: int, k_radius: int = 2
) -> jnp.ndarray:
    """Truncated consistency projection (Gz) via local weighted sums.

    ``z``: complex (n_frames, 1 + fsize//2). Out-of-range frames are
    zero (the lws boundary convention)."""
    M, F = z.shape
    H = fshift
    W = jnp.asarray(_kernel_np(fsize, fshift, k_radius))
    q_max = fsize // fshift - 1
    w_idx = jnp.arange(F)
    zp = jnp.pad(z, ((q_max, q_max), (0, 0)))
    out = jnp.zeros_like(z)
    for qi, q in enumerate(range(-q_max, q_max + 1)):
        # ramp_q[w] = exp(-2i pi w q H / N); applied at index w-k, so fold
        # it into v BEFORE the frequency shift
        ramp = jnp.exp(-2j * jnp.pi * w_idx * q * H / fsize).astype(z.dtype)
        v = ramp[None, :] * zp[q_max + q : q_max + q + M]
        for ki, k in enumerate(range(-k_radius, k_radius + 1)):
            out = out + W[qi, ki] * _freq_shift(v, k)
    return out


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def run_lws(
    S: jnp.ndarray,
    fsize: int,
    fshift: int,
    iterations: int = 100,
    k_radius: int = 2,
) -> jnp.ndarray:
    """Phase estimation from a magnitude spectrogram (``processor.run_lws``
    surface): returns complex (n_frames, 1 + fsize//2) with the input
    magnitudes and LWS-estimated phases. Zero-phase init, ``iterations``
    Jacobi sweeps of z <- |S| * phase(Gz)."""
    mag = jnp.abs(S).astype(jnp.float32)
    z0 = mag.astype(jnp.complex64)

    def body(_, z):
        g = lws_apply_kernel(z, fsize, fshift, k_radius)
        phase = g / jnp.maximum(jnp.abs(g), 1e-12)
        return mag * phase

    return jax.lax.fori_loop(0, iterations, body, z0)
