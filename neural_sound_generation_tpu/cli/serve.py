"""Inference server: HTTP endpoints over a loaded VQ-VAE.

The framework's serving surface (the reference has none — its realtime
path is the stubbed Leap listener, src/inference.py). Stdlib-only HTTP
server exposing the batched on-device inference paths:

  POST /encode   wav bytes (RIFF) -> {"codes": [[...]], "shape": [...]}
                 (--model hiervqvae: {"codes_top", "codes_bottom", ...},
                 bottom exactly twice the top width)
  POST /reconstruct  wav bytes -> reconstructed wav bytes
  POST /decode   {"codes": [[...]]} JSON -> wav bytes
                 (--model hiervqvae: {"codes_top": ..., "codes_bottom": ...})
                 Synthesis runs through Griffin-Lim by default, or a
                 trained WaveNet vocoder with --vocoder wavenet
                 --vocoder-ckpt (the reference's intended mel -> WaveNet
                 pipeline, src/hparams.py:12)
  POST /sample   {"n": 1, "label": 0, "seed": 0} -> wav bytes — ancestral
                 sampling from a loaded PixelCNN prior (--prior-ckpt;
                 hiervqvae needs --bottom-ckpt too)
  POST /sample_stream  same payload -> chunked raw s16le PCM as the
                 WaveNet vocoder emits it (requires --vocoder wavenet):
                 TTFB is prior+decode+first chunk instead of the full
                 n-utterance synthesis; X-Sample-Rate/X-PCM-Format
                 headers carry the framing
  GET  /health   -> {"status": "ok", "backend": ...}
  GET  /metrics  -> per-endpoint request/error counts + latency
                 percentiles, stream-mux occupancy

Model compilation happens once at startup; each request runs jitted
device programs (shapes are padded/cropped to the serving window).
With ``--batch-window-ms`` the server coalesces concurrent /reconstruct
requests into one vmapped device launch per length bucket (dynamic
batching): per-request results are unchanged, aggregate throughput under
load scales with the coalesced batch size.
"""

from __future__ import annotations

import argparse
import io
import itertools
import json
import logging
import queue
import sys
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.serving import MuxOverloaded


class _MicroBatcher:
    """Cross-request dynamic batching (--batch-window-ms).

    Handler threads ``submit()`` and block; one worker thread collects
    requests for up to ``window_ms`` after the first arrival (or until
    ``max_batch``), runs them through ``run_batch`` as ONE vmapped
    device program per length bucket, and wakes each caller with its own
    result. On an accelerator the batched program costs barely more than
    a single request, so aggregate throughput under concurrent load
    scales with the batch size instead of being pinned at 1/latency.
    """

    def __init__(self, run_batch, window_ms: float, max_batch: int = 8):
        self._run_batch = run_batch
        self._window = max(0.0, float(window_ms)) / 1000.0
        self._max = max(1, int(max_batch))
        self._q: queue.Queue = queue.Queue()
        threading.Thread(
            target=self._worker, daemon=True, name="nsg-microbatch"
        ).start()

    def submit(self, request):
        done = threading.Event()
        box = [done, None]  # [event, result-or-exception]
        self._q.put((request, box))
        done.wait()
        if isinstance(box[1], Exception):
            raise box[1]
        return box[1]

    def _worker(self):
        while True:
            batch = [self._q.get()]
            deadline = time.monotonic() + self._window
            while len(batch) < self._max:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                results = self._run_batch([req for req, _ in batch])
            except Exception as e:  # noqa: BLE001 — wake every caller
                results = [e] * len(batch)
            for (_, box), result in zip(batch, results):
                box[1] = result
                box[0].set()


class _Metrics:
    """Thread-safe per-endpoint request counters + latency reservoirs
    (last ``window`` observations) for GET /metrics."""

    def __init__(self, window: int = 512):
        self._lock = threading.Lock()
        self._lat: dict = {}
        self._count: dict = {}
        self._errors: dict = {}
        self._window = window
        self._t0 = time.time()

    def observe(self, path: str, seconds: float, ok: bool):
        from collections import deque

        with self._lock:
            d = self._lat.setdefault(path, deque(maxlen=self._window))
            d.append(seconds)
            self._count[path] = self._count.get(path, 0) + 1
            if not ok:
                self._errors[path] = self._errors.get(path, 0) + 1

    def snapshot(self) -> dict:
        with self._lock:
            out = {
                "uptime_s": round(time.time() - self._t0, 1),
                "endpoints": {},
            }
            for path, d in self._lat.items():
                lat = sorted(d)
                n = len(lat)
                out["endpoints"][path] = {
                    "requests": self._count.get(path, 0),
                    "errors": self._errors.get(path, 0),
                    "latency_ms": {
                        "p50": round(1e3 * lat[n // 2], 1),
                        "p99": round(1e3 * lat[min(n - 1, int(n * 0.99))], 1),
                        "mean": round(1e3 * sum(lat) / n, 1),
                    },
                }
            return out


class InferenceService:
    """Holds the model + jitted programs; thread-safe (JAX dispatch is)."""

    def __init__(self, cfg, model, variables, frames: int = 84,
                 vocoder=None, default_speaker=None):
        from neural_sound_generation_tpu.models import VQVAE, HierVQVAE
        from neural_sound_generation_tpu.ops import dsp

        self.cfg = cfg
        self.model = model
        self.variables = variables
        # multispeaker checkpoints (gin_channels > 0): decode paths need
        # a speaker embedding; /reconstruct and /decode use this default
        # (--speaker-id), /sample conditions on the request label
        n_spk = int(getattr(model, "n_speakers", 0) or 0)
        if n_spk > 0 and (
            default_speaker is None
            or not 0 <= int(default_speaker) < n_spk
        ):
            # fail at construction, not at the first jit trace deep in
            # /reconstruct (int(None) TypeError / silent embed clamp)
            raise ValueError(
                f"speaker-conditioned model ({n_spk} speakers) needs "
                f"default_speaker in [0, {n_spk}), got {default_speaker}"
            )
        self.default_speaker = default_speaker
        # (wavenet_model, wavenet_variables) or None for Griffin-Lim
        self._vocoder = vocoder
        self._gen_cache: dict = {}
        self.hier = isinstance(model, HierVQVAE)
        if self.hier and frames % 8:
            raise ValueError(
                f"hiervqvae serving window must be a multiple of 8, "
                f"got frames={frames}"
            )
        self.frames = frames
        self.dsp = dsp
        self._lock = threading.Lock()
        self.metrics = _Metrics()

        if self.hier:

            @jax.jit
            def encode(mels):
                return model.apply(
                    variables, mels, train=False, method=HierVQVAE.encode
                )

            @jax.jit
            def reconstruct(mels):
                x_tilde, _, _ = model.apply(variables, mels, train=False)
                return x_tilde

            @jax.jit
            def decode(idx_t, idx_b):
                return model.apply(
                    variables, idx_t, idx_b, train=False,
                    method=HierVQVAE.decode,
                )
        else:
            speakered = getattr(model, "n_speakers", 0) > 0

            def _g(n):
                # per-window speaker ids (broadcast of the default) for
                # a speaker-conditioned decoder; None otherwise
                if not speakered:
                    return None
                return jnp.full((n,), int(self.default_speaker), jnp.int32)

            @jax.jit
            def encode(mels):
                return model.apply(
                    variables, mels, train=False, method=VQVAE.encode
                )

            @jax.jit
            def reconstruct(mels):
                x_tilde, _, _ = model.apply(
                    variables, mels, train=False, g=_g(mels.shape[0])
                )
                return x_tilde

            @jax.jit
            def decode(codes):
                return model.apply(
                    variables, codes, train=False, g=_g(codes.shape[0]),
                    method=VQVAE.decode,
                )

        self._encode = encode
        self._reconstruct = reconstruct
        self._decode = decode

        n_mels = cfg.audio.num_mels
        win = self.frames
        audio_cfg = cfg.audio

        def reconstruct_wav(samples):
            # the whole /reconstruct round trip as ONE device program:
            # mel analysis -> windowing -> VQ reconstruct -> stitch ->
            # Griffin-Lim -> waveform. Through the tunnel each separate
            # launch pays a host round-trip; fusing 3 launches into 1
            # roughly halves end-to-end serving latency (PERF.md).
            mel = dsp.melspectrogram(samples, audio_cfg)  # (n_mels, T')
            n_win_pad = mel.shape[1] // win  # static per input length
            mel = mel[:, : n_win_pad * win]
            windows = mel.reshape(n_mels, n_win_pad, win)
            windows = jnp.transpose(windows, (1, 0, 2))[..., None]
            mels_out = reconstruct(windows)[..., 0]  # (n, n_mels, win)
            full = jnp.transpose(mels_out, (1, 0, 2)).reshape(
                n_mels, n_win_pad * win
            )
            return dsp.inv_mel_spectrogram(
                full, audio_cfg, jax.random.PRNGKey(0)
            )

        self._reconstruct_wav = jax.jit(reconstruct_wav)

        @jax.jit
        def reconstruct_wav_batch(samples):  # (B, L) same-bucket requests
            # cross-request dynamic batching: requests FOLD INTO the
            # model's window batch dim (B requests x n_win windows ->
            # one (B*n_win, ...) conv batch) rather than vmapping the
            # whole model — the Pallas VQ kernel only lowers at its
            # native rank, and a bigger window batch is the faster
            # shape anyway. Analysis and Griffin-Lim are vmapped
            # (pure FFT/conv math, no Pallas). Per-request results are
            # identical to the unbatched path: eval-mode BatchNorm uses
            # running stats and every window is independent.
            mels = dsp.melspectrogram_batch(samples, audio_cfg)
            n_win_pad = mels.shape[2] // win
            mels = mels[:, :, : n_win_pad * win]
            b = samples.shape[0]
            windows = mels.reshape(b, n_mels, n_win_pad, win)
            windows = jnp.transpose(windows, (0, 2, 1, 3)).reshape(
                b * n_win_pad, n_mels, win
            )[..., None]
            mels_out = reconstruct(windows)[..., 0]
            mels_out = mels_out.reshape(b, n_win_pad, n_mels, win)
            full = jnp.transpose(mels_out, (0, 2, 1, 3)).reshape(
                b, n_mels, n_win_pad * win
            )
            # the unbatched program uses PRNGKey(0) for every request
            keys = jnp.tile(jax.random.PRNGKey(0)[None], (b, 1))
            return dsp.inv_mel_spectrogram_batch(full, audio_cfg, keys)

        self._reconstruct_wav_batch = reconstruct_wav_batch
        self._prior = None  # set by attach_prior (serving /sample)
        self.batcher = None  # set by enable_batching
        self._stream_mux = None  # set by enable_stream_mux

    def attach_prior(self, prior, prior_vars, bottom=None, bottom_vars=None):
        """Enable POST /sample: a trained PixelCNN prior over this
        model's code grids (both priors for the hierarchical family)."""
        if self.hier and (bottom is None or bottom_vars is None):
            raise ValueError("hiervqvae sampling needs top AND bottom priors")
        self._prior = (prior, prior_vars, bottom, bottom_vars)

    def _sample_mels(self, payload: dict):
        """Shared front half of /sample and /sample_stream: validate the
        payload, run the prior(s), decode code grids to mels. Returns
        (mels (n, n_mels, frames), seed, k_gl)."""
        if self._prior is None:
            raise ValueError(
                "no prior loaded on this server (start with --prior-ckpt)"
            )
        if not isinstance(payload, dict):
            raise ValueError("payload must be a JSON object")
        n = int(payload.get("n", 1))
        if not 1 <= n <= 16:
            raise ValueError(f"n must be in [1, 16], got {n}")
        label = int(payload.get("label", 0))
        n_classes = int(self._prior[0].n_classes)
        if not 0 <= label < n_classes:
            # out-of-range labels would be silently clamped by the gather
            raise ValueError(
                f"label must be in [0, {n_classes}), got {label}"
            )
        n_speakers = int(getattr(self.model, "n_speakers", 0) or 0)
        if n_speakers > 0 and label >= n_speakers:
            # multispeaker decoders use the label AS the speaker id —
            # the 7-row speaker embedding would silently clamp ids the
            # n_classes check alone lets through
            raise ValueError(
                f"label is the speaker id for this multispeaker model: "
                f"must be in [0, {n_speakers}), got {label}"
            )
        seed = int(payload.get("seed", 0))
        labels = jnp.full((n,), label, jnp.int32)
        key = jax.random.PRNGKey(seed)
        prior, pv, bottom, bv = self._prior
        # sample the prior(s) and decode ONCE to mels; the synthesis
        # backend (trained WaveNet vs Griffin-Lim) is chosen by the
        # caller for BOTH model families — key splits mirror
        # sample_*_audio so the GL path stays bit-identical to the
        # pre-split behavior
        if self.hier:
            from neural_sound_generation_tpu.inference import (
                sample_hier_mels,
            )

            shape_top = (self.cfg.audio.num_mels // 8, self.frames // 8)
            _, _, mels = sample_hier_mels(
                self.model, self.variables, prior, pv, bottom, bv,
                labels, shape_top, key,
            )
            _, _, k_gl = jax.random.split(key, 3)
        else:
            from neural_sound_generation_tpu.inference import (
                sample_prior_mels,
            )

            code_shape = (
                self.cfg.audio.num_mels // self.STRIDE,
                self.frames // self.STRIDE,
            )
            k_codes, k_gl = jax.random.split(key)
            _, mels = sample_prior_mels(
                self.model, self.variables, prior, pv, labels,
                code_shape, k_codes,
                # multispeaker decoder: the class label IS the speaker
                g=labels if getattr(self.model, "n_speakers", 0) > 0
                else None,
            )
        return mels, seed, k_gl

    def sample(self, payload: dict) -> bytes:
        """Ancestral sampling as a service: prior samples code grids ->
        decoder -> Griffin-Lim -> wav bytes (n samples concatenated in
        time). The reference's generative chain, reachable over HTTP."""
        mels, seed, k_gl = self._sample_mels(payload)
        n = mels.shape[0]
        if self._vocoder is not None:
            # synthesize through the trained WaveNet
            mels_np = np.asarray(mels)
            if self._stream_mux is not None:
                opens = self._mux_open_all(mels_np, seed)
                try:
                    wavs = [
                        np.concatenate([self._post_np(c) for c in g])
                        for g in opens
                    ]
                finally:
                    for g in opens:
                        g.close()  # cancels any session left running
            else:
                wavs = [
                    self._vocode(jnp.asarray(m), seed=seed + i)
                    for i, m in enumerate(mels_np)
                ]
        else:
            from neural_sound_generation_tpu.ops import dsp

            keys = jax.random.split(k_gl, n)
            wavs = dsp.inv_mel_spectrogram_batch(
                jnp.asarray(mels), self.cfg.audio, keys
            )
        wav = np.concatenate([np.asarray(w) for w in np.asarray(wavs)])
        return self._encode_wav_bytes(wav)

    #: encoder time-axis downsampling (two stride-2 convs)
    STRIDE = 4

    def _wav_to_mel(self, wav_bytes: bytes):
        """Window the full utterance into (n, n_mels, frames, 1) batches.

        Long inputs are tiled over serving windows instead of silently
        cropped; returns (windows, t) where t is the true mel frame count
        so callers can trim the stitched output. The window batch is
        padded to the next power of two so the jitted encode/reconstruct
        functions compile for O(log n) distinct shapes, not one per
        request length. Codes near window boundaries can differ slightly
        from a single full-length encode (conv receptive fields are cut
        at window edges) — inherent to tiling with a fixed-shape model.
        """
        data = self._decode_wav_bytes(wav_bytes)
        # zero-pad the SAMPLES to the power-of-two window grid BEFORE
        # analysis: dsp.melspectrogram is jitted on the raw sample-count
        # shape, so analyzing unpadded audio compiles one program per
        # distinct upload length (tens of seconds each through the
        # tunnel). t is the true input's frame count for output trimming;
        # the last frames see zeros instead of the reflect tail — the
        # same tradeoff the fused _pad_for_reconstruct path documents.
        from neural_sound_generation_tpu.ops.dsp import num_stft_frames

        a = self.cfg.audio
        hop = a.effective_hop_size
        t = num_stft_frames(len(data), a.fft_size, hop)
        n_win = max(1, -(-t // self.frames))
        n_pad = 1 << (n_win - 1).bit_length()
        total = n_pad * self.frames * hop
        buf = np.zeros(total, np.float32)
        buf[: min(len(data), total)] = data[:total]
        mel = np.asarray(self.dsp.melspectrogram(jnp.asarray(buf), a))
        padded = mel[:, : n_pad * self.frames]
        windows = padded.reshape(mel.shape[0], n_pad, self.frames)
        windows = np.transpose(windows, (1, 0, 2))[..., None]
        return jnp.asarray(windows), t, n_win

    def _decode_wav_bytes(self, wav_bytes: bytes) -> np.ndarray:
        # full load_wav semantics: int16/int32/uint8/float scaling, mono
        # mixdown, AND resampling to the server's rate — a 16 kHz or
        # 32-bit upload must be analyzed correctly, not silently mangled
        return self.dsp.load_wav_bytes(wav_bytes, self.cfg.audio.sample_rate)

    def _encode_wav_bytes(self, wav_np: np.ndarray) -> bytes:
        buf = io.BytesIO()
        from scipy.io import wavfile

        wav_np = wav_np * (32767 / max(0.01, float(np.abs(wav_np).max())))
        wavfile.write(buf, self.cfg.audio.sample_rate, wav_np.astype(np.int16))
        return buf.getvalue()

    def _vocode_stream(self, mel: jnp.ndarray, seed: int = 0):
        """(n_mels, T') normalized mel -> generator of waveform chunks
        from the WaveNet streaming sampler (requires --vocoder wavenet).

        ONE compiled chunk program serves every request length (the
        monolithic sampler compiles per length — ~30 s each through a
        cold cache), and callers can forward audio downstream while
        later chunks are still being generated. bf16 sampling matmuls:
        1.8x realtime single-stream on v5e (f32 is 0.8x — below
        realtime); the MoL head and sampling stay f32 (PERF.md
        "single-stream generation"). The inverse mu-law maps are
        memoryless, so per-chunk application equals whole-utterance
        application."""
        from neural_sound_generation_tpu.models.wavenet import (
            make_chunked_generate_fn,
        )
        from neural_sound_generation_tpu.ops import dsp

        if self._stream_mux is not None:
            # shared multiplexer: this session occupies one slot of the
            # always-batched chunk program, so N concurrent requests
            # synthesize simultaneously at ~the cost of one (PERF.md
            # "stream multiplexer"). Output postprocessing is memoryless
            # numpy — the chunks are already host-side.
            c = jnp.transpose(jnp.asarray(mel))  # (T', n_mels)
            for chunk in self._stream_mux.open(
                c, jax.random.PRNGKey(seed)
            ):
                yield self._post_np(chunk)
            return
        wn_model, wn_vars = self._vocoder
        with self._lock:
            # two concurrent first requests must not BOTH build the
            # chunked generator (~30 s compile each on a cold server)
            stream = self._gen_cache.get("stream")
            if stream is None:
                _, _, stream = make_chunked_generate_fn(
                    wn_model, chunk=4096, dtype=jnp.bfloat16
                )
                self._gen_cache["stream"] = stream
            post = self._gen_cache.get("post")
            if post is None:
                # one jitted program instead of a handful of eager ops per
                # chunk — eager ops each pay a dispatch round trip over the
                # TPU tunnel (~100 ms/chunk of pure overhead before this)
                q = self.cfg.audio.quantize_channels
                if self.cfg.audio.is_mulaw_quantize:
                    post = jax.jit(lambda y: dsp.inv_mulaw_quantize(y, q))
                elif self.cfg.audio.is_mulaw:
                    post = jax.jit(lambda y: dsp.inv_mulaw(y, q))
                else:
                    post = lambda y: y
                self._gen_cache["post"] = post
        c = jnp.transpose(jnp.asarray(mel))[None]  # (1, T', n_mels)
        # one-chunk lookahead: dispatch chunk i+1 (async) before
        # materializing chunk i, so the host readback of each chunk
        # overlaps the next chunk's device compute. copy_to_host_async
        # starts each chunk's D2H as soon as its compute is enqueued —
        # np.asarray alone would only BEGIN the transfer when it blocks,
        # and over the tunnel that serial fetch costs ~40-60 ms/chunk.
        prev = None
        for blk in stream(
            wn_vars, c, None, jax.random.PRNGKey(seed), batch_size=1
        ):
            cur = post(blk[0])
            try:
                cur.copy_to_host_async()
            except AttributeError:
                pass
            if prev is not None:
                yield np.asarray(prev)
            prev = cur
        if prev is not None:
            yield np.asarray(prev)

    def _vocode(self, mel: jnp.ndarray, seed: int = 0) -> np.ndarray:
        """(n_mels, T') normalized mel -> waveform, via the configured
        vocoder: Griffin-Lim (default) or the trained WaveNet
        (--vocoder wavenet)."""
        if self._vocoder is None:
            return np.asarray(self.dsp.inv_mel_spectrogram(
                mel, self.cfg.audio, jax.random.PRNGKey(seed)
            ))
        return np.concatenate(list(self._vocode_stream(mel, seed)))

    def _mel_to_wav_bytes(self, mel: jnp.ndarray) -> bytes:
        return self._encode_wav_bytes(self._vocode(mel))

    @staticmethod
    def _stitch(codes, t, stride):
        """(n, H', W') window code grids -> one (H', cols) grid trimmed to
        the true mel length t."""
        valid = max(1, -(-t // stride))
        return np.concatenate(list(codes), axis=-1)[:, :valid]

    def encode(self, wav_bytes: bytes) -> dict:
        windows, t, n_win = self._wav_to_mel(wav_bytes)
        if self.hier:
            idx_t, idx_b = self._encode(windows)
            top = self._stitch(np.asarray(idx_t)[:n_win], t, 8)
            # bottom trims to exactly 2x the top width (not ceil(t/4),
            # which can be one column short): decode requires alignment
            bottom = np.concatenate(list(np.asarray(idx_b)[:n_win]), axis=-1)
            bottom = bottom[:, : 2 * top.shape[-1]]
            return {
                "codes_top": top.tolist(), "shape_top": list(top.shape),
                "codes_bottom": bottom.tolist(),
                "shape_bottom": list(bottom.shape),
            }
        codes = np.asarray(self._encode(windows))[:n_win]  # (n, H', W')
        # stitch window code grids along time, trim to the true length
        stitched = self._stitch(codes, t, self.STRIDE)
        return {"codes": stitched.tolist(), "shape": list(stitched.shape)}

    def reconstruct(self, wav_bytes: bytes) -> bytes:
        """One fused device launch (see ``reconstruct_wav``): the input
        is zero-padded to the serving-window grid on the host, the whole
        analysis->VQ->synthesis chain runs on device, and the returned
        waveform is trimmed to the input length. Griffin-Lim runs over
        the padded tail too (silence), which can shift the tail samples
        slightly vs a pre-trimmed inversion — inherent to fusing.

        With a WaveNet vocoder attached, synthesis instead runs the
        autoregressive sampler over the stitched reconstructed mel."""
        if self._vocoder is not None:
            full = self._reconstruct_full_mel(wav_bytes)
            wav = self._vocode(jnp.asarray(full))
            return self._encode_wav_bytes(wav)
        if self.batcher is not None:
            return self.batcher.submit(wav_bytes)
        padded, n_data = self._pad_for_reconstruct(wav_bytes)
        wav = np.asarray(self._reconstruct_wav(jnp.asarray(padded)))
        wav = wav[: min(n_data, len(wav))]
        return self._encode_wav_bytes(wav)

    def _reconstruct_full_mel(self, wav_bytes: bytes) -> np.ndarray:
        """Window -> reconstruct -> stitch along time -> trim to the true
        frame count: the shared mel pipeline for every vocoder-backed
        endpoint (one place to fix window-boundary handling)."""
        windows, t, n_win = self._wav_to_mel(wav_bytes)
        mels_out = np.asarray(self._reconstruct(windows))[..., 0]
        return np.concatenate(list(mels_out[:n_win]), axis=-1)[:, :t]

    def _pad_for_reconstruct(self, wav_bytes: bytes):
        """Decode + zero-pad input samples to the power-of-two serving
        window grid (the compile-shape bucket). Returns (padded, n_data)."""
        data = self._decode_wav_bytes(wav_bytes)
        hop = self.cfg.audio.effective_hop_size
        t_est = len(data) // hop + 1
        n_win = max(1, -(-t_est // self.frames))
        n_pad = 1 << (n_win - 1).bit_length()
        total = n_pad * self.frames * hop + self.cfg.audio.fft_size
        padded = np.zeros(total, np.float32)
        padded[: min(len(data), total)] = data[:total]
        return padded, len(data)

    def reconstruct_batched(self, requests: list) -> list:
        """One device launch for MANY /reconstruct requests: group the
        decoded+padded inputs by length bucket, run the vmapped fused
        program per group (request batch zero-padded to the next power
        of two so the compile set stays O(log n) x O(log n)), and trim
        each request's waveform individually.

        Returns one ``bytes`` result or ``Exception`` per request, index
        aligned — a malformed upload fails alone, never its batchmates."""
        slots: list = [None] * len(requests)
        groups: dict = {}
        for i, wb in enumerate(requests):
            try:
                padded, n_data = self._pad_for_reconstruct(wb)
                groups.setdefault(len(padded), []).append((i, padded, n_data))
            except Exception as e:  # noqa: BLE001 — isolate per request
                slots[i] = e
        for total, items in groups.items():
            b = len(items)
            b_pad = 1 << (b - 1).bit_length()
            stacked = np.zeros((b_pad, total), np.float32)
            for j, (_, padded, _) in enumerate(items):
                stacked[j] = padded
            try:
                wavs = np.asarray(
                    self._reconstruct_wav_batch(jnp.asarray(stacked))
                )
                for j, (i, _, n_data) in enumerate(items):
                    wav = wavs[j][: min(n_data, wavs.shape[1])]
                    slots[i] = self._encode_wav_bytes(wav)
            except Exception as e:  # noqa: BLE001
                for i, _, _ in items:
                    slots[i] = e
        return slots

    def enable_batching(self, window_ms: float, max_batch: int = 8):
        """Attach a request micro-batcher to /reconstruct (GL path)."""
        self.batcher = _MicroBatcher(
            self.reconstruct_batched, window_ms, max_batch
        )

    def enable_stream_mux(self, slots: int, max_seconds: float = 30.0,
                          max_pending=None):
        """Route WaveNet synthesis through a shared stream multiplexer:
        up to ``slots`` concurrent sessions generate through ONE batched
        chunk program (--stream-slots). ``max_pending`` bounds the
        admission queue — an overloaded mux raises MuxOverloaded, which
        the HTTP layer answers with 503 + Retry-After instead of growing
        per-stream latency without bound."""
        if self._vocoder is None:
            raise ValueError("--stream-slots requires --vocoder wavenet")
        from neural_sound_generation_tpu.serving import WaveNetStreamMux

        wn_model, wn_vars = self._vocoder
        self._stream_mux = WaveNetStreamMux(
            wn_model, wn_vars, chunk=4096, slots=slots,
            dtype=jnp.bfloat16, max_seconds=max_seconds,
            sample_rate=self.cfg.audio.sample_rate,
            max_pending=max_pending,
        )

    @staticmethod
    def _pcm_s16le(chunk: np.ndarray) -> bytes:
        """The fixed-scaling s16le conversion both streaming endpoints
        share (x in [-1,1] -> x*32767 — streaming cannot know the
        future peak, so no peak normalization)."""
        return (np.clip(chunk, -1.0, 1.0) * 32767.0).astype(
            "<i2"
        ).tobytes()

    def _mux_open_all(self, mels_np, seed: int) -> list:
        """Open one mux session per mel up front so all n utterances
        synthesize CONCURRENTLY through the slots (shared by /sample
        and /sample_stream). If a later open() fails — MuxOverloaded on
        session k — the k already-admitted sessions are CLOSED (which
        cancels them at the next chunk boundary) instead of left
        synthesizing full utterances nothing will drain."""
        opens: list = []
        try:
            for i, m in enumerate(mels_np):
                opens.append(
                    self._stream_mux.open(
                        jnp.transpose(jnp.asarray(m)),
                        jax.random.PRNGKey(seed + i),
                    )
                )
            return opens
        except BaseException:
            for g in opens:
                g.close()
            raise

    def _post_np(self, chunk: np.ndarray) -> np.ndarray:
        """Memoryless inverse mu-law on host-side sample chunks (the
        dsp.* versions are device math; mux chunks are already numpy)."""
        mu = float(self.cfg.audio.quantize_channels)
        if self.cfg.audio.is_mulaw_quantize:
            y = 2.0 * chunk.astype(np.float64) / mu - 1.0
            return (np.sign(y) / mu * ((1.0 + mu) ** np.abs(y) - 1.0)
                    ).astype(np.float32)
        if self.cfg.audio.is_mulaw:
            y = chunk.astype(np.float64)
            return (np.sign(y) / mu * ((1.0 + mu) ** np.abs(y) - 1.0)
                    ).astype(np.float32)
        return np.asarray(chunk, np.float32)

    def reconstruct_stream(self, wav_bytes: bytes):
        """Streaming /reconstruct: yields raw s16le PCM pieces as the
        WaveNet vocoder emits them (one 4096-sample chunk at a time) —
        a client can start playback after the first ~0.19 s of audio
        instead of waiting for the whole utterance. Requires
        --vocoder wavenet.

        PCM scaling is fixed (x in [-1, 1] -> x * 32767) rather than
        the peak normalization /reconstruct applies — streaming cannot
        know the future peak."""
        if self._vocoder is None:
            raise ValueError(
                "streaming reconstruct requires --vocoder wavenet"
            )
        full = self._reconstruct_full_mel(wav_bytes)
        for chunk in self._vocode_stream(jnp.asarray(full)):
            yield self._pcm_s16le(chunk)

    def sample_stream(self, payload: dict):
        """Streaming /sample: the prior->decode->vocoder chain is the
        longest serving path, and the buffered /sample holds the client
        until EVERY utterance has fully synthesized. This yields raw
        s16le PCM pieces as the WaveNet emits them (the
        /reconstruct_stream discipline applied to the generative chain):
        TTFB = prior sampling + decode + the FIRST vocoder chunk, and
        the n utterances stream back-to-back in order. Requires
        --vocoder wavenet. Fixed PCM scaling (x*32767) — streaming
        cannot know the future peak."""
        if self._vocoder is None:
            raise ValueError(
                "streaming sample requires --vocoder wavenet"
            )
        mels, seed, _ = self._sample_mels(payload)
        mels_np = np.asarray(mels)
        pcm = self._pcm_s16le

        if self._stream_mux is not None:
            opens = self._mux_open_all(mels_np, seed)
            try:
                # drain in order so the client hears sample 0 first
                for g in opens:
                    for chunk in g:
                        yield pcm(self._post_np(chunk))
            finally:
                # a client that disconnects mid-stream must not leave
                # the remaining sessions synthesizing into the void
                for g in opens:
                    g.close()
        else:
            for i, m in enumerate(mels_np):
                for chunk in self._vocode_stream(
                    jnp.asarray(m), seed=seed + i
                ):
                    yield pcm(chunk)

    @staticmethod
    def _check_codes(arr: np.ndarray, limit: int, name: str):
        # out-of-range indices would be silently CLAMPED by the device
        # gather and return wrong-but-valid audio with HTTP 200 (the
        # same reason /sample validates labels)
        if arr.size and (int(arr.min()) < 0 or int(arr.max()) >= limit):
            raise ValueError(f"{name} entries must be in [0, {limit})")

    def decode(self, payload: dict) -> bytes:
        if self.hier:
            top_np = np.asarray(payload["codes_top"], np.int32)
            bot_np = np.asarray(payload["codes_bottom"], np.int32)
            self._check_codes(top_np, int(self.model.k_top), "codes_top")
            self._check_codes(bot_np, int(self.model.z_dim), "codes_bottom")
            idx_t = jnp.asarray(top_np)[None, ...]
            idx_b = jnp.asarray(bot_np)[None, ...]
            if 2 * idx_t.shape[-1] != idx_b.shape[-1]:
                raise ValueError(
                    "codes_bottom must be exactly twice as wide as "
                    f"codes_top, got {idx_b.shape[-1]} vs {idx_t.shape[-1]}"
                )
            mel = self._decode(idx_t, idx_b)[0, :, :, 0]
        else:
            idx_np = np.asarray(payload["codes"], np.int32)
            self._check_codes(idx_np, int(self.model.z_dim), "codes")
            mel = self._decode(jnp.asarray(idx_np)[None, ...])[0, :, :, 0]
        return self._mel_to_wav_bytes(mel)


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 for chunked transfer encoding on /reconstruct_stream;
        # every fixed response still sets Content-Length, so keep-alive
        # connections stay well-framed
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):
            pass

        def _send_chunked(self, pieces, ctype, headers=()):
            """Stream an iterable of byte pieces with chunked framing.
            The iterable is created by the CALLER before headers go out,
            so validation errors still produce a clean 400; failures
            mid-stream can only drop the connection (do_POST checks
            ``_streaming_started`` and never writes a second response
            into the chunked body)."""
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Transfer-Encoding", "chunked")
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self._streaming_started = True
            for piece in pieces:
                if piece:
                    self.wfile.write(
                        f"{len(piece):x}\r\n".encode() + piece + b"\r\n"
                    )
            self.wfile.write(b"0\r\n\r\n")

        def _send_pcm_stream(self, gen):
            """The chunked raw-PCM response both streaming endpoints
            share: pull the FIRST piece before any headers go out (so
            validation errors still produce a clean 400), then stream
            with the s16le framing headers."""
            try:
                first = next(gen, b"")
                self._send_chunked(
                    itertools.chain([first], gen),
                    "application/octet-stream",
                    headers=(
                        ("X-Sample-Rate",
                         str(service.cfg.audio.sample_rate)),
                        ("X-PCM-Format", "s16le"),
                    ),
                )
            finally:
                gen.close()  # release abandoned upstream resources

        def _send(self, code, body: bytes, ctype="application/json",
                  headers=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, json.dumps(
                    {"status": "ok", "backend": jax.default_backend()}
                ).encode())
            elif self.path == "/metrics":
                m = getattr(service, "metrics", None)
                snap = m.snapshot() if m is not None else {}
                snap["backend"] = jax.default_backend()
                mux = getattr(service, "_stream_mux", None)
                if mux is not None:
                    snap["stream_mux"] = {
                        "slots": mux.slots,
                        "active": mux.active,
                        "pending": mux.pending,
                        "max_pending": mux.max_pending,
                    }
                self._send(200, json.dumps(snap).encode())
            else:
                self._send(404, b'{"error": "not found"}')

        # malformed input from the client: safe to describe in the response
        _CLIENT_ERRORS = (
            ValueError, KeyError, TypeError, OverflowError,
            json.JSONDecodeError,
        )

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            self._streaming_started = False
            t0 = time.perf_counter()
            ok = False
            try:
                ok = self._dispatch(body)
            finally:
                m = getattr(service, "metrics", None)
                if m is not None:
                    m.observe(self.path, time.perf_counter() - t0, ok)

        def _dispatch(self, body) -> bool:
            """Route one POST; returns True when the request was served
            successfully (2xx), False for every error response/drop."""
            try:
                if self.path == "/encode":
                    self._send(200, json.dumps(service.encode(body)).encode())
                elif self.path == "/reconstruct":
                    self._send(200, service.reconstruct(body), "audio/wav")
                elif self.path == "/reconstruct_stream":
                    self._send_pcm_stream(service.reconstruct_stream(body))
                elif self.path == "/decode":
                    self._send(
                        200, service.decode(json.loads(body)), "audio/wav"
                    )
                elif self.path == "/sample":
                    payload = json.loads(body) if body else {}
                    self._send(200, service.sample(payload), "audio/wav")
                elif self.path == "/sample_stream":
                    payload = json.loads(body) if body else {}
                    self._send_pcm_stream(service.sample_stream(payload))
                else:
                    self._send(404, b'{"error": "not found"}')
                    return False
                return True
            except MuxOverloaded:
                if self._streaming_started:
                    self.close_connection = True
                    return False
                # overload is retryable, not a client error: 503 tells a
                # well-behaved client to back off instead of re-POSTing
                self._send(503, json.dumps(
                    {"error": "stream slots exhausted; retry later"}
                ).encode(), headers=(("Retry-After", "1"),))
                return False
            except self._CLIENT_ERRORS as e:
                if self._streaming_started:
                    # chunked headers already sent: a status line here
                    # would land inside the body and poison the framing —
                    # the only correct signal is dropping the connection
                    # (the client sees a truncated, unterminated stream)
                    logging.getLogger("nsg.serve").warning(
                        "mid-stream client error on %s: %s", self.path, e
                    )
                    self.close_connection = True
                    return False
                self._send(400, json.dumps(
                    {"error": f"bad request: {type(e).__name__}: {e}"}
                ).encode())
                return False
            except Exception:
                # unexpected: log the traceback server-side under an opaque
                # id; never echo internals (paths, shapes, stack) to clients
                err_id = uuid.uuid4().hex[:12]
                logging.getLogger("nsg.serve").exception(
                    "internal error %s on %s", err_id, self.path
                )
                if self._streaming_started:
                    self.close_connection = True
                    return False
                self._send(500, json.dumps(
                    {"error": "internal error", "id": err_id}
                ).encode())
                return False

    return Handler


def build_service(args):
    from neural_sound_generation_tpu.config import Config, load_preset
    from neural_sound_generation_tpu.models import VQVAE, HierVQVAE
    from neural_sound_generation_tpu.training import checkpoint, create_train_state

    cfg = load_preset(args.preset, Config()) if args.preset else Config()
    # serving production defaults: fast Griffin-Lim (momentum 0.99 at 30
    # iterations matches 60 plain iterations in STFT-consistency error,
    # PERF.md) — halves the dominant synthesis cost per request. Plain
    # reference GL is `--gl-momentum 0 --gl-iters 60`. Explicit flags win;
    # a --preset's GL settings are honored when the flags are not passed;
    # only the no-preset default picks the fast setting.
    import dataclasses as _dc

    gl_iters = getattr(args, "gl_iters", None)
    gl_momentum = getattr(args, "gl_momentum", None)
    if not args.preset:
        gl_iters = 30 if gl_iters is None else gl_iters
        gl_momentum = 0.99 if gl_momentum is None else gl_momentum
    if gl_iters is not None or gl_momentum is not None:
        cfg = _dc.replace(
            cfg,
            audio=_dc.replace(
                cfg.audio,
                **(
                    {"griffin_lim_iters": gl_iters}
                    if gl_iters is not None
                    else {}
                ),
                **(
                    {"griffin_lim_momentum": gl_momentum}
                    if gl_momentum is not None
                    else {}
                ),
            ),
        )
    hier = getattr(args, "model", "vqvae") == "hiervqvae"
    # the documented --frames default (84 flat / 80 hier) — was only in
    # the help text before; an unset --frames crashed on jnp.zeros(None)
    frames = args.frames if args.frames is not None else (80 if hier else 84)
    args.frames = frames
    if hier:
        if frames % 8:
            raise SystemExit(
                f"--frames must be a multiple of 8 for hiervqvae "
                f"(got {frames}); try {frames - frames % 8}"
            )
        if cfg.arch.gin_channels > 0:
            # the hier template carries no speaker embedding: restoring
            # a speaker-conditioned checkpoint here would silently drop
            # its embeddings and never validate --speaker-id — fail
            # loudly like the flat path does for the same preset
            raise SystemExit(
                "--model hiervqvae does not support speaker-conditioned "
                f"presets (gin_channels {cfg.arch.gin_channels}): serve "
                "the multispeaker checkpoint with the flat model, or "
                "drop the preset's gin_channels"
            )
        model = HierVQVAE(input_dim=1, dim=args.dim, z_dim=args.z_dim)
        init_kwargs = {}
    else:
        # a multispeaker preset (gin_channels > 0) serves the
        # speaker-conditioned model: the template must carry the
        # speaker embedding or restore silently drops it
        gin = cfg.arch.gin_channels
        n_speakers = cfg.arch.n_speakers if gin > 0 else 0
        model = VQVAE(
            input_dim=1, dim=args.dim, z_dim=args.z_dim,
            n_speakers=n_speakers, gin_channels=gin if n_speakers else -1,
        )
        init_kwargs = (
            {"g": jnp.zeros((1,), jnp.int32)} if n_speakers else {}
        )
        sid = getattr(args, "speaker_id", None)
        if n_speakers and sid is None:
            raise SystemExit(
                f"this preset serves a speaker-conditioned model "
                f"(gin_channels {gin}): pass --speaker-id 0.."
                f"{n_speakers - 1} as the default voice for "
                f"/reconstruct and /decode (/sample uses the request "
                f"label)"
            )
        if n_speakers and not 0 <= int(sid) < n_speakers:
            # the embedding gather would silently clamp a bad id to the
            # last speaker — refuse instead of serving the wrong voice
            raise SystemExit(
                f"--speaker-id {sid} out of range: this model has "
                f"{n_speakers} speakers (0..{n_speakers - 1})"
            )
    sample = jnp.zeros((1, cfg.audio.num_mels, frames, 1))
    variables = model.init(
        jax.random.PRNGKey(0), sample, train=False, **init_kwargs
    )
    if args.ckpt_dir:
        state = create_train_state(variables, cfg.train)
        restored, _ = checkpoint.restore(args.ckpt_dir, state)
        # --ema serves the averaged model; a checkpoint trained with EMA
        # off has no shadow — error rather than silently serving the
        # live weights the user explicitly asked to avoid
        if getattr(args, "ema", False) and restored.ema_params is None:
            raise SystemExit(
                "--ema: checkpoint has no EMA shadow (trained with "
                "exponential_moving_average=false); drop --ema or "
                "retrain with EMA on"
            )
        params = (
            restored.eval_params if getattr(args, "ema", False)
            else restored.params
        )
        # Commit restored (host numpy) leaves to the device ONCE: jit
        # re-transfers uncommitted host arrays on EVERY call, and over
        # the TPU tunnel that re-upload dominates serving latency (the
        # WaveNet path paid ~600 ms/chunk for a ~100 ms-compute chunk).
        variables = jax.device_put({
            "params": params,
            "batch_stats": restored.batch_stats,
        })
    vocoder = None
    if getattr(args, "vocoder", "griffin-lim") == "wavenet":
        if not getattr(args, "vocoder_ckpt", None):
            raise SystemExit("--vocoder wavenet requires --vocoder-ckpt")
        # serve's synthesis chain is mel -> WaveNet; a units-conditioned
        # checkpoint (cli.vocoder --condition units) would restore into
        # the mel template as a silent architecture graft
        wn_meta = checkpoint.read_extra(args.vocoder_ckpt) or {}
        if wn_meta.get("condition", "mel") != "mel":
            raise SystemExit(
                "--vocoder-ckpt was trained with --condition "
                f"{wn_meta['condition']}; serve synthesizes from mels — "
                "use a mel-conditioned vocoder checkpoint"
            )
        import types

        from neural_sound_generation_tpu.cli.vocoder import (
            build_model as build_wavenet,
        )
        from neural_sound_generation_tpu.models import WaveNet

        wn = build_wavenet(cfg, types.SimpleNamespace(
            residual_channels=getattr(args, "vocoder_residual_channels", None),
            layers=getattr(args, "vocoder_layers", None),
            stacks=getattr(args, "vocoder_stacks", None),
        ))
        scalar = cfg.audio.is_scalar_input
        x0 = WaveNet.shift_inputs(
            jnp.zeros((1, 8, 1))
            if scalar
            else jnp.zeros((1, 8), jnp.int32),
            scalar,
        )
        c0 = jnp.zeros((1, 2, cfg.arch.cin_channels))
        template = wn.init(jax.random.PRNGKey(0), x0, c0, None)
        wn_vars, _ = checkpoint.restore(args.vocoder_ckpt, template)
        vocoder = (wn, jax.device_put(wn_vars))
    service = InferenceService(cfg, model, variables, args.frames,
                               vocoder=vocoder,
                               default_speaker=getattr(
                                   args, "speaker_id", None))
    if getattr(args, "prior_ckpt", None):
        from neural_sound_generation_tpu.models import (
            GatedPixelCNN, TransformerPrior,
        )

        def build_prior(spatial_cond):
            # the bottom level routinely uses a DIFFERENT family/size
            # than the top (pixelcnn past the long-T cliff); without
            # the --bottom-prior-* overrides a mixed chain silently
            # grafted fresh-init weights into the mismatched template
            arch = getattr(args, "prior_arch", "pixelcnn")
            dim = args.prior_dim
            layers = args.prior_layers
            heads = getattr(args, "prior_heads", 8)
            if spatial_cond:
                arch = getattr(args, "bottom_prior_arch", None) or arch
                dim = getattr(args, "bottom_prior_dim", None) or dim
                layers = getattr(args, "bottom_prior_layers", None) or layers
                heads = getattr(args, "bottom_prior_heads", None) or heads
            if arch == "transformer":
                return TransformerPrior(
                    input_dim=args.z_dim, dim=dim,
                    n_layers=layers,
                    n_heads=heads,
                    n_classes=args.n_classes,
                    n_experts=getattr(args, "prior_moe_experts", 0),
                    spatial_cond=spatial_cond,
                )
            return GatedPixelCNN(
                input_dim=args.z_dim, dim=dim,
                n_layers=layers, n_classes=args.n_classes,
                spatial_cond=spatial_cond,
            )

        hier = args.model == "hiervqvae"
        if hier:
            h, w = cfg.audio.num_mels // 8, args.frames // 8
        else:
            h, w = cfg.audio.num_mels // 4, args.frames // 4
        lab0 = jnp.zeros((1,), jnp.int32)
        top = build_prior(False)
        tv = top.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w), jnp.int32), lab0
        )
        tv, _ = checkpoint.restore(args.prior_ckpt, tv)
        tv = jax.device_put(tv)
        bottom = bv = None
        if hier:
            if not args.bottom_ckpt:
                raise SystemExit("--model hiervqvae /sample needs "
                                 "--bottom-ckpt too")
            bottom = build_prior(True)
            bv = bottom.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 2 * h, 2 * w), jnp.int32), lab0,
                jnp.zeros((1, 2 * h, 2 * w, args.dim)),
            )
            bv, _ = checkpoint.restore(args.bottom_ckpt, bv)
            bv = jax.device_put(bv)
        service.attach_prior(top, tv, bottom, bv)
    if getattr(args, "batch_window_ms", 0.0) and args.batch_window_ms > 0:
        service.enable_batching(
            args.batch_window_ms, getattr(args, "batch_max", 8)
        )
    if getattr(args, "stream_slots", 0) and args.stream_slots > 0:
        service.enable_stream_mux(
            args.stream_slots, getattr(args, "stream_max_seconds", 30.0),
            max_pending=getattr(args, "stream_max_pending", None),
        )
    return service


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="VQ-VAE inference HTTP server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ema", action="store_true",
                   help="serve the averaged (EMA) model weights from the "
                        "--ckpt-dir train state instead of the live "
                        "params (the reference's intended inference "
                        "weights, hparams.py:116-118). Requires a "
                        "checkpoint trained with EMA on (the default). "
                        "The vocoder/prior equivalents are the *_ema "
                        "artifact dirs their train CLIs export.")
    p.add_argument("--preset", default=None)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--z-dim", type=int, default=512)
    p.add_argument("--frames", type=int, default=None,
                   help="serving mel window (default 84 flat / 80 hier)")
    p.add_argument("--model", default="vqvae",
                   choices=["vqvae", "hiervqvae"])
    p.add_argument("--gl-iters", type=int, default=None,
                   help="Griffin-Lim iterations (default: the --preset "
                        "value, or the fast serving setting 30 with "
                        "momentum when no preset is given; reference "
                        "setting: 60 with momentum 0)")
    p.add_argument("--gl-momentum", type=float, default=None,
                   help="fast Griffin-Lim momentum; 0 = plain reference "
                        "GL (default: preset value, or 0.99 w/o preset)")
    p.add_argument("--vocoder", choices=["griffin-lim", "wavenet"],
                   default="griffin-lim",
                   help="synthesis backend for /reconstruct, /decode and "
                        "/sample: Griffin-Lim, or a trained WaveNet "
                        "(--vocoder-ckpt; on TPU this runs the fused "
                        "Pallas generation kernel)")
    p.add_argument("--vocoder-ckpt", default=None,
                   help="WaveNet vocoder checkpoint dir (cli/vocoder.py "
                        "train artifact)")
    p.add_argument("--vocoder-layers", type=int, default=None)
    p.add_argument("--vocoder-stacks", type=int, default=None)
    p.add_argument("--vocoder-residual-channels", type=int, default=None)
    p.add_argument("--stream-slots", type=int, default=0,
                   help="multiplex WaveNet synthesis: up to N concurrent "
                        "streams share ONE batched generation program "
                        "(0 = per-request programs). Requires "
                        "--vocoder wavenet.")
    p.add_argument("--stream-max-seconds", type=float, default=30.0,
                   help="per-utterance cap for the stream multiplexer "
                        "(slot buffer capacity)")
    p.add_argument("--stream-max-pending", type=int, default=None,
                   help="admission control: reject (503) new streams "
                        "once this many sessions are queued for a slot "
                        "(default: unbounded)")
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help="enable cross-request dynamic batching on "
                        "/reconstruct: wait up to this long after the "
                        "first request to coalesce a device batch "
                        "(0 = off). Griffin-Lim path only.")
    p.add_argument("--batch-max", type=int, default=8,
                   help="max requests per coalesced device batch")
    p.add_argument("--prior-ckpt", default=None,
                   help="PixelCNN prior checkpoint dir: enables POST "
                        "/sample (top prior for --model hiervqvae)")
    p.add_argument("--bottom-ckpt", default=None,
                   help="bottom prior checkpoint (hiervqvae /sample)")
    p.add_argument("--bottom-prior-arch",
                   choices=["pixelcnn", "transformer"], default=None,
                   help="bottom prior family when it differs from "
                        "--prior-arch (mixed chains: transformer top, "
                        "pixelcnn bottom past the long-T cliff)")
    p.add_argument("--bottom-prior-dim", type=int, default=None,
                   help="bottom prior width (default: --prior-dim)")
    p.add_argument("--bottom-prior-layers", type=int, default=None,
                   help="bottom prior depth (default: --prior-layers)")
    p.add_argument("--bottom-prior-heads", type=int, default=None,
                   help="bottom attention heads (default: --prior-heads)")
    p.add_argument("--prior-arch", choices=["pixelcnn", "transformer"],
                   default="pixelcnn",
                   help="prior family the --prior-ckpt artifact was "
                        "trained with (cli/prior.py --arch)")
    p.add_argument("--prior-dim", type=int, default=64)
    p.add_argument("--prior-layers", type=int, default=15)
    p.add_argument("--prior-heads", type=int, default=8)
    p.add_argument("--prior-moe-experts", type=int, default=0,
                   help="transformer prior trained with --moe-experts N "
                        "(0 = dense)")
    p.add_argument("--n-classes", type=int, default=10)
    p.add_argument("--speaker-id", type=int, default=None,
                   help="default speaker for /reconstruct and /decode "
                        "when serving a speaker-conditioned "
                        "(multispeaker-preset) checkpoint; /sample "
                        "conditions on the request label instead")
    return p.parse_args(argv)


def main(argv=None):
    from neural_sound_generation_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    args = parse_args(argv)
    if args.frames is None:
        args.frames = 80 if args.model == "hiervqvae" else 84
    service = build_service(args)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"serving on http://{args.host}:{args.port} "
          f"(backend={jax.default_backend()})")
    server.serve_forever()


if __name__ == "__main__":
    main(sys.argv[1:])
