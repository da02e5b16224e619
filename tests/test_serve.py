"""Inference server tests: real HTTP requests against a live server."""

import io
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def server():
    from neural_sound_generation_tpu.cli.serve import (
        InferenceService,
        make_handler,
    )
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    service = InferenceService(cfg, model, variables, frames=16)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _wav_bytes(seconds=0.3, sr=22050):
    from scipy.io import wavfile

    t = np.arange(int(sr * seconds)) / sr
    wav = (0.5 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, sr, wav)
    return buf.getvalue()


def _post(url, data, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    return urllib.request.urlopen(req, timeout=60)


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"


def _expected_code_cols(seconds, sr=22050):
    """True mel frame count -> code columns after /4 downsampling."""
    import jax.numpy as jnp

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.ops import dsp

    t = dsp.melspectrogram(
        jnp.zeros(int(sr * seconds)), Config().audio
    ).shape[1]
    return -(-t // 4)


def test_encode_endpoint(server):
    with _post(server + "/encode", _wav_bytes()) as r:
        body = json.loads(r.read())
    assert body["shape"] == [20, _expected_code_cols(0.3)]
    codes = np.asarray(body["codes"])
    assert codes.min() >= 0 and codes.max() < 16


def test_encode_long_audio_windows(server):
    """Audio longer than the serving window is tiled and stitched, not
    silently cropped: 2 s through a 16-frame window yields the full code
    sequence."""
    with _post(server + "/encode", _wav_bytes(seconds=2.0)) as r:
        body = json.loads(r.read())
    assert body["shape"] == [20, _expected_code_cols(2.0)]


def test_reconstruct_long_audio_full_length(server):
    with _post(server + "/reconstruct", _wav_bytes(seconds=2.0)) as r:
        data = r.read()
    from scipy.io import wavfile

    sr, wav = wavfile.read(io.BytesIO(data))
    # Griffin-Lim output length tracks the stitched full-length mel
    assert len(wav) > int(22050 * 1.8)


def test_reconstruct_endpoint(server):
    with _post(server + "/reconstruct", _wav_bytes()) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    from scipy.io import wavfile

    sr, wav = wavfile.read(io.BytesIO(data))
    assert sr == 22050 and len(wav) > 0


def test_decode_endpoint(server):
    codes = np.random.default_rng(0).integers(0, 16, (20, 4)).tolist()
    payload = json.dumps({"codes": codes}).encode()
    with _post(server + "/decode", payload) as r:
        data = r.read()
    from scipy.io import wavfile

    sr, wav = wavfile.read(io.BytesIO(data))
    assert sr == 22050 and len(wav) > 0


def test_bad_request_keeps_serving(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server + "/decode", b"this is not json")
    assert err.value.code == 400
    body = json.loads(err.value.read())
    assert body["error"].startswith("bad request:")
    # server still alive
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_internal_error_is_sanitized(server):
    """Unexpected failures return 500 with an opaque id — internals
    (exception text, paths, shapes) must never reach the client."""
    import urllib.error

    # /encode expects a RIFF wav; scipy raises on garbage bytes with a
    # message mentioning its own internals -> must be masked as 500
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server + "/encode", b"\x00" * 64)
    assert err.value.code in (400, 500)
    body = json.loads(err.value.read())
    if err.value.code == 500:
        assert body["error"] == "internal error"
        assert len(body["id"]) == 12
        assert "Traceback" not in json.dumps(body)
    # still serving afterwards
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_unknown_route(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server + "/nope", b"")
    assert err.value.code == 404


def test_serve_with_trained_checkpoint(tmp_path, rng):
    """build_service restores a checkpoint and serves it (the production
    deployment path, not just fresh weights)."""
    import argparse

    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.cli.serve import build_service
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import checkpoint, create_train_state

    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    x = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    state = create_train_state(variables, Config().train)
    ckpt = str(tmp_path / "ck")
    checkpoint.save(ckpt, state, step=1)

    args = argparse.Namespace(
        preset=None, dim=8, z_dim=16, frames=16, ckpt_dir=ckpt
    )
    service = build_service(args)
    out = service.encode(_wav_bytes())
    assert out["shape"] == [20, _expected_code_cols(0.3)]
    # the served params are the checkpoint's, not a fresh init
    np.testing.assert_array_equal(
        np.asarray(service.variables["params"]["codebook"]),
        np.asarray(state.params["codebook"]),
    )
    # and they are committed device arrays — Orbax restores host numpy
    # leaves, and uncommitted numpy re-uploads through the TPU tunnel on
    # EVERY jit dispatch (~600 ms/chunk in serve-WaveNet before the fix)
    leaves = jax.tree_util.tree_leaves(service.variables)
    assert all(isinstance(l, jax.Array) for l in leaves)


def test_serve_multispeaker_checkpoint(tmp_path, rng):
    """Serving with the multispeaker preset loads the speaker-conditioned
    model (embeddings restore instead of being silently dropped),
    requires --speaker-id for the decode default, and /reconstruct
    output changes with the chosen speaker (round-4: the multi-speaker
    chain gets a serving surface)."""
    import argparse

    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.cli.serve import build_service
    from neural_sound_generation_tpu.config import Config, load_preset
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import (
        checkpoint, create_train_state,
    )

    preset = (
        "neural_sound_generation_tpu/config/presets/"
        "multispeaker_cmu_arctic_mixture.json"
    )
    cfg = load_preset(preset, Config())
    model = VQVAE(
        input_dim=1, dim=8, z_dim=16,
        n_speakers=cfg.arch.n_speakers, gin_channels=cfg.arch.gin_channels,
    )
    x = jnp.zeros((1, cfg.audio.num_mels, 16, 1))
    variables = model.init(
        jax.random.PRNGKey(3), x, train=False, g=jnp.zeros((1,), jnp.int32)
    )
    state = create_train_state(variables, cfg.train)
    ckpt = str(tmp_path / "ck")
    checkpoint.save(ckpt, state, step=1)

    base = dict(preset=preset, dim=8, z_dim=16, frames=16, ckpt_dir=ckpt)
    # speaker-conditioned model without --speaker-id is a loud error,
    # and an out-of-range id is refused rather than silently clamped
    # to the last speaker by the embedding gather
    with pytest.raises(SystemExit, match="speaker-conditioned"):
        build_service(argparse.Namespace(**base))
    with pytest.raises(SystemExit, match="out of range"):
        build_service(argparse.Namespace(**base, speaker_id=9))

    svc0 = build_service(argparse.Namespace(**base, speaker_id=0))
    assert "speaker_embed" in svc0.variables["params"]
    wav0 = svc0.reconstruct(_wav_bytes(sr=cfg.audio.sample_rate))
    svc6 = build_service(argparse.Namespace(**base, speaker_id=6))
    wav6 = svc6.reconstruct(_wav_bytes(sr=cfg.audio.sample_rate))
    a = np.frombuffer(wav0, np.int16)[100:]
    b = np.frombuffer(wav6, np.int16)[100:]
    n = min(len(a), len(b))
    assert not np.array_equal(a[:n], b[:n])  # the embedding conditions


def test_serve_ema_flag_uses_averaged_params(tmp_path):
    """--ema serves the checkpoint's averaged (EMA) weights — the
    reference's intended inference params (hparams.py:116-118) — instead
    of the live training params."""
    import argparse

    from neural_sound_generation_tpu.cli.serve import build_service
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import checkpoint, create_train_state

    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    x = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    state = create_train_state(variables, Config().train)
    # make the live params distinct from the EMA shadow (which stays at
    # the init values here), so the assertion can tell them apart
    state = state.replace(
        params=jax.tree_util.tree_map(lambda p: p + 1.0, state.params)
    )
    ckpt = str(tmp_path / "ck")
    checkpoint.save(ckpt, state, step=1)

    base = dict(preset=None, dim=8, z_dim=16, frames=16, ckpt_dir=ckpt)
    live = build_service(argparse.Namespace(**base))
    ema = build_service(argparse.Namespace(**base, ema=True))
    np.testing.assert_allclose(
        np.asarray(ema.variables["params"]["codebook"]),
        np.asarray(jax.device_get(state.eval_params)["codebook"]),
        atol=1e-6,
    )
    # and they differ from the live weights by the +1.0 we injected
    assert not np.allclose(
        np.asarray(ema.variables["params"]["codebook"]),
        np.asarray(live.variables["params"]["codebook"]),
    )

    # a checkpoint trained WITHOUT EMA has no shadow: --ema must error
    # loudly, not silently serve the live weights
    import dataclasses

    cfg_noema = dataclasses.replace(
        Config(),
        train=dataclasses.replace(
            Config().train, exponential_moving_average=False
        ),
    )
    s2 = create_train_state(variables, cfg_noema.train)
    assert s2.ema_params is None
    ck2 = str(tmp_path / "ck_noema")
    checkpoint.save(ck2, s2, step=1)
    with pytest.raises(SystemExit, match="no EMA shadow"):
        build_service(argparse.Namespace(
            preset=None, dim=8, z_dim=16, frames=16, ckpt_dir=ck2, ema=True,
        ))


# ------------------------- hierarchical serving -------------------------


@pytest.fixture(scope="module")
def hier_server():
    from neural_sound_generation_tpu.cli.serve import (
        InferenceService,
        make_handler,
    )
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import HierVQVAE

    cfg = Config()
    model = HierVQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    service = InferenceService(cfg, model, variables, frames=16)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_hier_encode_decode_roundtrip(hier_server):
    with _post(hier_server + "/encode", _wav_bytes(seconds=0.5)) as r:
        body = json.loads(r.read())
    assert body["shape_bottom"][1] == 2 * body["shape_top"][1]
    assert body["shape_top"][0] == 10 and body["shape_bottom"][0] == 20
    payload = json.dumps(
        {"codes_top": body["codes_top"], "codes_bottom": body["codes_bottom"]}
    ).encode()
    with _post(hier_server + "/decode", payload) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    from scipy.io import wavfile

    sr, wav = wavfile.read(io.BytesIO(data))
    assert sr == 22050 and len(wav) > 0


def test_hier_decode_misaligned_grids_400(hier_server):
    import urllib.error

    payload = json.dumps(
        {"codes_top": [[1] * 4] * 10, "codes_bottom": [[1] * 7] * 20}
    ).encode()
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(hier_server + "/decode", payload)
    assert err.value.code == 400
    assert "twice as wide" in json.loads(err.value.read())["error"]


def test_hier_service_rejects_unaligned_window():
    from neural_sound_generation_tpu.cli.serve import InferenceService
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import HierVQVAE

    model = HierVQVAE(input_dim=1, dim=8, z_dim=16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 16, 1)), train=False
    )
    with pytest.raises(ValueError, match="multiple of 8"):
        InferenceService(Config(), model, variables, frames=20)


def test_sample_endpoint_without_prior_is_client_error(server):
    """POST /sample on a server started without --prior-ckpt -> 400."""
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server + "/sample", b"{}",
              {"Content-Type": "application/json"})
    assert ei.value.code == 400
    assert b"prior" in ei.value.read()


@pytest.fixture(scope="module")
def sample_server():
    """Server with a (fresh-init) PixelCNN prior attached: /sample runs
    the full ancestral chain prior -> decoder -> Griffin-Lim."""
    from neural_sound_generation_tpu.cli.serve import (
        InferenceService,
        make_handler,
    )
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE, GatedPixelCNN

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    service = InferenceService(cfg, model, variables, frames=16)
    prior = GatedPixelCNN(input_dim=16, dim=8, n_layers=2, n_classes=4)
    pv = prior.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 20, 4), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    service.attach_prior(prior, pv)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_sample_endpoint_returns_wav(sample_server):
    from scipy.io import wavfile

    body = json.dumps({"n": 2, "label": 1, "seed": 3}).encode()
    with _post(sample_server + "/sample", body,
               {"Content-Type": "application/json"}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    sr, wav = wavfile.read(io.BytesIO(data))
    assert sr == 22050
    assert wav.ndim == 1 and len(wav) > 1000
    assert np.isfinite(wav.astype(np.float64)).all()


def test_sample_endpoint_moe_transformer_prior():
    """/sample through a routed TransformerPrior (--prior-arch
    transformer --prior-moe-experts): the MoE decode path (causal
    capacity counts in the KV caches) runs under the serving jit."""
    from neural_sound_generation_tpu.cli.serve import (
        InferenceService,
        make_handler,
    )
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE, TransformerPrior
    from scipy.io import wavfile

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    service = InferenceService(cfg, model, variables, frames=16)
    prior = TransformerPrior(
        input_dim=16, dim=16, n_layers=2, n_heads=2, n_classes=4,
        n_experts=2,
    )
    pv = prior.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 20, 4), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    service.attach_prior(prior, {"params": pv["params"]})
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        body = json.dumps({"n": 1, "label": 2, "seed": 5}).encode()
        with _post(url + "/sample", body,
                   {"Content-Type": "application/json"}) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            data = r.read()
        sr, wav = wavfile.read(io.BytesIO(data))
        assert sr == 22050 and wav.ndim == 1 and len(wav) > 1000
        assert np.isfinite(wav.astype(np.float64)).all()
    finally:
        httpd.shutdown()


def test_sample_endpoint_rejects_bad_n(sample_server):
    body = json.dumps({"n": 99}).encode()
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(sample_server + "/sample", body,
              {"Content-Type": "application/json"})
    assert ei.value.code == 400


def test_reconstruct_accepts_int32_and_resamples(server):
    """Non-16-bit PCM and wrong-rate uploads are decoded correctly: a
    32-bit 16 kHz file is scaled to [-1, 1] and resampled to the server
    rate instead of being silently mangled (load_wav semantics)."""
    from scipy.io import wavfile

    sr_in = 16000
    t = np.arange(int(sr_in * 0.3)) / sr_in
    wav32 = (0.5 * np.sin(2 * np.pi * 330 * t) * 2147483647).astype(np.int32)
    buf = io.BytesIO()
    wavfile.write(buf, sr_in, wav32)
    with _post(server + "/reconstruct", buf.getvalue(),
               {"Content-Type": "audio/wav"}) as r:
        data = r.read()
    sr_out, wav = wavfile.read(io.BytesIO(data))
    assert sr_out == 22050
    # correct scaling/resampling: output length tracks the 0.3 s input
    # at the server rate (not the raw sample count at the wrong rate)
    assert abs(len(wav) - int(22050 * 0.3)) < 2048
    assert np.isfinite(wav.astype(np.float64)).all()


def test_hier_reconstruct_fused_path(hier_server):
    """/reconstruct for the hierarchical family exercises the fused
    single-launch program (mel -> two-level VQ -> GL) end-to-end."""
    from scipy.io import wavfile

    with _post(hier_server + "/reconstruct", _wav_bytes(seconds=0.4),
               {"Content-Type": "audio/wav"}) as r:
        data = r.read()
    sr, wav = wavfile.read(io.BytesIO(data))
    assert sr == 22050
    assert abs(len(wav) - int(22050 * 0.4)) < 2048
    assert np.isfinite(wav.astype(np.float64)).all()


def test_build_service_honors_preset_griffin_lim(tmp_path):
    """Round-2 advisor fix: --preset Griffin-Lim settings must survive
    when --gl-iters/--gl-momentum are not passed (the flags used to
    always clobber them with 30/0.99); explicit flags still win; the
    fast serving default applies only without a preset."""
    import json as _json

    from neural_sound_generation_tpu.cli.serve import build_service, parse_args

    preset = tmp_path / "p.json"
    preset.write_text(_json.dumps(
        {"griffin_lim_iters": 7, "griffin_lim_momentum": 0.5}
    ))
    base = ["--dim", "8", "--z-dim", "16", "--frames", "16"]

    svc = build_service(parse_args(base + ["--preset", str(preset)]))
    assert svc.cfg.audio.griffin_lim_iters == 7
    assert svc.cfg.audio.griffin_lim_momentum == 0.5

    svc = build_service(parse_args(
        base + ["--preset", str(preset), "--gl-iters", "3"]
    ))
    assert svc.cfg.audio.griffin_lim_iters == 3
    assert svc.cfg.audio.griffin_lim_momentum == 0.5  # preset survives

    svc = build_service(parse_args(base))  # no preset: fast serving default
    assert svc.cfg.audio.griffin_lim_iters == 30
    assert svc.cfg.audio.griffin_lim_momentum == 0.99


def test_build_service_default_frames():
    """An unset --frames must fall back to the documented defaults
    (84 flat / 80 hier) instead of crashing on jnp.zeros(None)
    (round-3 capstone regression)."""
    from neural_sound_generation_tpu.cli.serve import build_service, parse_args

    svc = build_service(parse_args(["--dim", "8", "--z-dim", "16"]))
    assert svc.frames == 84

    svc = build_service(parse_args(
        ["--model", "hiervqvae", "--dim", "8", "--z-dim", "16"]
    ))
    assert svc.frames == 80


@pytest.fixture(scope="module")
def wavenet_server():
    """Server with a (tiny, untrained) WaveNet vocoder attached:
    /reconstruct, /decode and /sample synthesize through the
    autoregressive sampler instead of Griffin-Lim (round-3 verdict
    item #4)."""
    from neural_sound_generation_tpu.cli.serve import (
        InferenceService,
        make_handler,
    )
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE, WaveNet

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    wn = WaveNet(out_channels=30, layers=2, stacks=1, residual_channels=8,
                 gate_channels=8, skip_out_channels=8, cin_channels=80,
                 upsample_scales=(16, 16), scalar_input=True)
    x0 = WaveNet.shift_inputs(jnp.zeros((1, 8, 1)), True)
    c0 = jnp.zeros((1, 2, 80))
    wn_vars = wn.init(jax.random.PRNGKey(1), x0, c0, None)
    service = InferenceService(cfg, model, variables, frames=16,
                               vocoder=(wn, wn_vars))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_wavenet_vocoder_reconstruct_roundtrip(wavenet_server):
    """mel -> VQ -> WaveNet synthesis over live HTTP: output is a valid
    wav whose length tracks the input's mel frame count x hop."""
    import io as _io

    from scipy.io import wavfile

    with _post(wavenet_server + "/reconstruct", _wav_bytes(seconds=0.15),
               {"Content-Type": "audio/wav"}) as r:
        data = r.read()
    sr, wav = wavfile.read(_io.BytesIO(data))
    assert sr == 22050
    t_frames = int(22050 * 0.15) // 256 + 1
    assert abs(len(wav) - t_frames * 256) <= 256
    assert np.isfinite(wav.astype(np.float64)).all()


def test_wavenet_vocoder_reconstruct_stream(wavenet_server):
    """/reconstruct_stream emits chunked s16le PCM whose waveform
    matches /reconstruct (same seed) up to the peak normalization the
    non-streaming path applies."""
    import io as _io
    import urllib.request

    from scipy.io import wavfile

    body = _wav_bytes(seconds=0.15)
    req = urllib.request.Request(
        wavenet_server + "/reconstruct_stream", data=body,
        headers={"Content-Type": "audio/wav"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["X-Sample-Rate"] == "22050"
        assert r.headers["X-PCM-Format"] == "s16le"
        assert r.headers.get("Content-Length") is None  # streamed
        pcm = r.read()  # urllib reassembles the chunked body
    streamed = np.frombuffer(pcm, "<i2").astype(np.float64) / 32767.0

    with _post(wavenet_server + "/reconstruct", body,
               {"Content-Type": "audio/wav"}) as r:
        sr, wav = wavfile.read(_io.BytesIO(r.read()))
    whole = wav.astype(np.float64)

    assert len(streamed) == len(whole)
    assert np.isfinite(streamed).all()
    # undo each path's scaling (peak-norm vs fixed): compare shapes
    denom_s = max(np.abs(streamed).max(), 1e-9)
    denom_w = max(np.abs(whole).max(), 1e-9)
    np.testing.assert_allclose(
        streamed / denom_s, whole / denom_w, atol=2e-3
    )


@pytest.fixture(scope="module")
def wavenet_sample_server():
    """Server with BOTH a prior and a WaveNet vocoder: /sample and
    /sample_stream run the full generative chain prior -> decoder ->
    WaveNet (the longest serving path, round-5 streaming item)."""
    from neural_sound_generation_tpu.cli.serve import (
        InferenceService,
        make_handler,
    )
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import (
        VQVAE, GatedPixelCNN, WaveNet,
    )

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    wn = WaveNet(out_channels=30, layers=2, stacks=1, residual_channels=8,
                 gate_channels=8, skip_out_channels=8, cin_channels=80,
                 upsample_scales=(16, 16), scalar_input=True)
    x0 = WaveNet.shift_inputs(jnp.zeros((1, 8, 1)), True)
    c0 = jnp.zeros((1, 2, 80))
    wn_vars = wn.init(jax.random.PRNGKey(1), x0, c0, None)
    service = InferenceService(cfg, model, variables, frames=16,
                               vocoder=(wn, wn_vars))
    prior = GatedPixelCNN(input_dim=16, dim=8, n_layers=2, n_classes=4)
    pv = prior.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 20, 4), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    service.attach_prior(prior, pv)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_sample_stream_matches_buffered_sample(wavenet_sample_server):
    """/sample_stream emits chunked s16le PCM whose concatenated
    waveform matches the buffered /sample (same seed, WaveNet backend)
    up to the peak normalization the non-streaming path applies."""
    import io as _io
    import urllib.request

    from scipy.io import wavfile

    body = json.dumps({"n": 2, "label": 1, "seed": 3}).encode()
    req = urllib.request.Request(
        wavenet_sample_server + "/sample_stream", data=body,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["X-Sample-Rate"] == "22050"
        assert r.headers["X-PCM-Format"] == "s16le"
        assert r.headers.get("Content-Length") is None  # streamed
        pcm = r.read()
    streamed = np.frombuffer(pcm, "<i2").astype(np.float64) / 32767.0

    with _post(wavenet_sample_server + "/sample", body,
               {"Content-Type": "application/json"}) as r:
        sr, wav = wavfile.read(_io.BytesIO(r.read()))
    whole = wav.astype(np.float64)

    assert len(streamed) == len(whole)
    assert np.isfinite(streamed).all()
    denom_s = max(np.abs(streamed).max(), 1e-9)
    denom_w = max(np.abs(whole).max(), 1e-9)
    np.testing.assert_allclose(
        streamed / denom_s, whole / denom_w, atol=2e-3
    )


def test_sample_stream_without_vocoder_is_400(sample_server):
    """A prior-only server (Griffin-Lim backend) refuses /sample_stream
    cleanly — validation runs before the chunked headers go out."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        sample_server + "/sample_stream",
        data=json.dumps({"n": 1}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
    assert b"vocoder" in ei.value.read()


def test_sample_stream_bad_label_is_400(wavenet_sample_server):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        wavenet_sample_server + "/sample_stream",
        data=json.dumps({"label": 99}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400


def test_reconstruct_stream_without_vocoder_is_400(server):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        server + "/reconstruct_stream", data=_wav_bytes(seconds=0.05),
        headers={"Content-Type": "audio/wav"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400


def test_wavenet_vocoder_decode_endpoint(wavenet_server):
    import io as _io

    from scipy.io import wavfile

    codes = np.zeros((20, 4), np.int32).tolist()  # (80/4, 16/4) grid
    body = json.dumps({"codes": codes}).encode()
    with _post(wavenet_server + "/decode", body,
               {"Content-Type": "application/json"}) as r:
        data = r.read()
    sr, wav = wavfile.read(_io.BytesIO(data))
    assert sr == 22050
    assert len(wav) == 16 * 256  # 16 mel frames x hop through the sampler
    assert np.isfinite(wav.astype(np.float64)).all()


# ------------------- dynamic request batching (--batch-window-ms) ----------


@pytest.fixture(scope="module")
def batching_service():
    from neural_sound_generation_tpu.cli.serve import InferenceService
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    return InferenceService(cfg, model, variables, frames=16)


def _decode_response_wav(data):
    import io as _io

    from scipy.io import wavfile

    sr, wav = wavfile.read(_io.BytesIO(data))
    return wav.astype(np.float64)


def test_reconstruct_batched_matches_unbatched(batching_service):
    """Each request in a coalesced batch gets the same waveform the
    unbatched path produces — including across different length buckets
    and a zero-padded batch dim."""
    svc = batching_service
    reqs = [
        _wav_bytes(seconds=0.2),
        _wav_bytes(seconds=0.3),
        _wav_bytes(seconds=0.7),  # different length bucket
    ]
    singles = [svc.reconstruct(wb) for wb in reqs]
    batched = svc.reconstruct_batched(reqs)
    for single, batch in zip(singles, batched):
        assert isinstance(batch, bytes)
        a, b = _decode_response_wav(single), _decode_response_wav(batch)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2.0)  # int16 LSB jitter


def test_reconstruct_batched_isolates_errors(batching_service):
    good = _wav_bytes(seconds=0.2)
    out = batching_service.reconstruct_batched([good, b"not a wav", good])
    assert isinstance(out[0], bytes)
    assert isinstance(out[1], Exception)
    assert isinstance(out[2], bytes)
    assert out[0] == out[2]


def test_batched_reconstruct_over_http(batching_service):
    """Concurrent POSTs through a batching server all succeed and match
    the sequential (unbatched) response."""
    from http.server import ThreadingHTTPServer

    from neural_sound_generation_tpu.cli.serve import make_handler

    svc = batching_service
    reference = svc.reconstruct(_wav_bytes(seconds=0.3))
    svc.enable_batching(window_ms=50.0, max_batch=4)
    try:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        results = [None] * 4
        errors = []

        def hit(i):
            try:
                with _post(url + "/reconstruct", _wav_bytes(seconds=0.3),
                           {"Content-Type": "audio/wav"}) as r:
                    results[i] = r.read()
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        ref = _decode_response_wav(reference)
        for r in results:
            got = _decode_response_wav(r)
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, atol=2.0)
        httpd.shutdown()
    finally:
        svc.batcher = None  # don't leak batching into other fixtures


def test_sample_mux_overload_cancels_admitted_sessions():
    """Round-5: /sample with n>slots+pending on a saturated mux answers
    503 AND the already-admitted sessions of that request are cancelled
    (slots free at the next chunk boundary) instead of synthesizing
    full utterances into queues nothing drains."""
    import time as _time

    from http.server import ThreadingHTTPServer

    from neural_sound_generation_tpu.cli.serve import (
        InferenceService,
        make_handler,
    )
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import (
        VQVAE, GatedPixelCNN, WaveNet,
    )

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    wn = WaveNet(out_channels=30, layers=2, stacks=1, residual_channels=8,
                 gate_channels=8, skip_out_channels=8, cin_channels=80,
                 upsample_scales=(16, 16), scalar_input=True)
    x0 = WaveNet.shift_inputs(jnp.zeros((1, 8, 1)), True)
    c0 = jnp.zeros((1, 2, 80))
    wn_vars = wn.init(jax.random.PRNGKey(1), x0, c0, None)
    svc = InferenceService(cfg, model, variables, frames=16,
                           vocoder=(wn, wn_vars))
    prior = GatedPixelCNN(input_dim=16, dim=8, n_layers=2, n_classes=4)
    pv = prior.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 20, 4), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    svc.attach_prior(prior, pv)
    # 1 slot, zero pending: the request's second session must overload
    svc.enable_stream_mux(slots=1, max_seconds=2.0, max_pending=0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/sample",
            data=json.dumps({"n": 3, "label": 0}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=300)
        assert ei.value.code == 503
        # the admitted session was cancelled: the slot frees without
        # anyone draining it
        deadline = _time.time() + 30
        mux = svc._stream_mux
        while (mux.active or mux.pending) and _time.time() < deadline:
            _time.sleep(0.1)
        assert mux.active == 0 and mux.pending == 0
        # and the server still serves a fitting request afterwards
        req2 = urllib.request.Request(
            url + "/sample",
            data=json.dumps({"n": 1, "label": 0}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req2, timeout=300) as r:
            assert len(r.read()) > 1000
    finally:
        httpd.shutdown()


def test_stream_mux_serving(batching_service):
    """--stream-slots: concurrent /reconstruct_stream requests share one
    batched generation program and each gets a complete PCM stream."""
    from http.server import ThreadingHTTPServer

    from neural_sound_generation_tpu.cli.serve import (
        InferenceService,
        make_handler,
    )
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE, WaveNet

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    wn = WaveNet(out_channels=30, layers=2, stacks=1, residual_channels=8,
                 gate_channels=8, skip_out_channels=8, cin_channels=80,
                 upsample_scales=(16, 16), scalar_input=True)
    x0 = WaveNet.shift_inputs(jnp.zeros((1, 8, 1)), True)
    c0 = jnp.zeros((1, 2, 80))
    wn_vars = wn.init(jax.random.PRNGKey(1), x0, c0, None)
    svc = InferenceService(cfg, model, variables, frames=16,
                           vocoder=(wn, wn_vars))
    svc.enable_stream_mux(slots=4, max_seconds=2.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    body = _wav_bytes(seconds=0.15)
    results = [None] * 3
    errors = []

    def hit(i):
        try:
            req = urllib.request.Request(
                url + "/reconstruct_stream", data=body,
                headers={"Content-Type": "audio/wav"},
            )
            with urllib.request.urlopen(req, timeout=180) as r:
                results[i] = r.read()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    try:
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
    finally:
        httpd.shutdown()  # don't leak the server for the rest of the session
    assert not errors
    t_frames = int(22050 * 0.15) // 256 + 1
    for r in results:
        pcm = np.frombuffer(r, "<i2")
        # mel trimmed to the true frame count t, upsampled x256
        assert abs(len(pcm) - t_frames * 256) <= 256
        assert np.isfinite(pcm.astype(np.float64)).all()
    # identical seed + conditioning -> the same stream, up to rare
    # single-sample mixture-component flips: the serve mux runs bf16,
    # and a slot-position ulp can flip an argmax when two
    # gumbel-perturbed mixture logits land within it (discrete sampling
    # amplifies an ulp into one full sample). Exact bitwise cross-slot
    # isolation is pinned by tests/test_serving_mux.py (f32); here the
    # streams must agree everywhere except <1% component-flip samples.
    ref = np.frombuffer(results[0], "<i2").astype(np.int32)
    for r in results[1:]:
        got = np.frombuffer(r, "<i2").astype(np.int32)
        assert got.shape == ref.shape
        flipped = np.abs(got - ref) > 64  # > one bf16 ulp at full scale
        assert flipped.mean() < 0.01


def test_sample_through_stream_mux():
    """/sample with a WaveNet vocoder + mux: all n utterances synthesize
    concurrently through mux slots and come back as one valid wav."""
    import io as _io

    from scipy.io import wavfile

    from neural_sound_generation_tpu.cli.serve import InferenceService
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import (
        VQVAE,
        GatedPixelCNN,
        WaveNet,
    )

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    wn = WaveNet(out_channels=30, layers=2, stacks=1, residual_channels=8,
                 gate_channels=8, skip_out_channels=8, cin_channels=80,
                 upsample_scales=(16, 16), scalar_input=True)
    x0 = WaveNet.shift_inputs(jnp.zeros((1, 8, 1)), True)
    c0 = jnp.zeros((1, 2, 80))
    wn_vars = wn.init(jax.random.PRNGKey(1), x0, c0, None)
    svc = InferenceService(cfg, model, variables, frames=16,
                           vocoder=(wn, wn_vars))
    svc.enable_stream_mux(slots=4, max_seconds=2.0)
    prior = GatedPixelCNN(input_dim=16, dim=8, n_layers=2, n_classes=4)
    pv = prior.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 20, 4), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    svc.attach_prior(prior, pv)
    data = svc.sample({"n": 3, "label": 1, "seed": 5})
    sr, wav = wavfile.read(_io.BytesIO(data))
    assert sr == 22050
    assert len(wav) == 3 * 16 * 256  # n x frames x hop
    assert np.isfinite(wav.astype(np.float64)).all()


def test_hier_sample_routes_through_vocoder():
    """Regression: with a WaveNet vocoder attached, /sample for the
    HIERARCHICAL family synthesizes through the vocoder too — the
    re-synthesis branch used to exist only in the flat-VQVAE path, so a
    hier server silently fell back to Griffin-Lim while its /decode
    endpoint used the vocoder."""
    import io as _io

    from scipy.io import wavfile

    from neural_sound_generation_tpu.cli.serve import InferenceService
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import (
        GatedPixelCNN,
        HierVQVAE,
        WaveNet,
    )

    cfg = Config()
    model = HierVQVAE(input_dim=1, dim=8, z_dim=16, z_dim_top=12)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 16, 1)), train=False
    )
    wn = WaveNet(out_channels=30, layers=2, stacks=1, residual_channels=8,
                 gate_channels=8, skip_out_channels=8, cin_channels=80,
                 upsample_scales=(16, 16), scalar_input=True)
    x0 = WaveNet.shift_inputs(jnp.zeros((1, 8, 1)), True)
    c0 = jnp.zeros((1, 2, 80))
    wn_vars = wn.init(jax.random.PRNGKey(1), x0, c0, None)
    svc = InferenceService(cfg, model, variables, frames=16,
                           vocoder=(wn, wn_vars))
    Ht, Wt = 10, 2
    top = GatedPixelCNN(input_dim=12, dim=8, n_layers=2, n_classes=2)
    tv = top.init(
        jax.random.PRNGKey(2), jnp.zeros((1, Ht, Wt), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    bottom = GatedPixelCNN(
        input_dim=16, dim=8, n_layers=2, n_classes=2, spatial_cond=True
    )
    bv = bottom.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 2 * Ht, 2 * Wt), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2 * Ht, 2 * Wt, 8)),
    )
    svc.attach_prior(top, tv, bottom, bv)

    calls = []
    orig = svc._vocode

    def spy(mel, **kw):
        calls.append(tuple(mel.shape))
        return orig(mel, **kw)

    svc._vocode = spy
    data = svc.sample({"n": 1, "label": 0, "seed": 0})
    assert calls == [(80, 16)], "hier /sample did not reach the vocoder"
    sr, wav = wavfile.read(_io.BytesIO(data))
    assert sr == 22050
    assert len(wav) == 16 * 256  # frames x hop: the vocoder output length
    assert np.isfinite(wav.astype(np.float64)).all()


def test_mid_stream_failure_drops_connection_cleanly():
    """Regression: an exception AFTER chunked headers went out must drop
    the connection — not write a second HTTP status line into the middle
    of the chunked body (which poisons the framing and the keep-alive
    connection)."""
    import socket as _socket

    from http.server import ThreadingHTTPServer

    from neural_sound_generation_tpu.cli.serve import make_handler

    class FailingService:
        class cfg:  # noqa: N801 — minimal stand-in
            class audio:  # noqa: N801
                sample_rate = 22050

        def reconstruct_stream(self, body):
            yield b"\x01\x02" * 64
            yield b"\x03\x04" * 64
            raise RuntimeError("device fell over mid-stream")

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(FailingService()))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        s = _socket.create_connection(
            ("127.0.0.1", httpd.server_address[1]), timeout=30
        )
        s.sendall(
            b"POST /reconstruct_stream HTTP/1.1\r\n"
            b"Host: x\r\nContent-Length: 4\r\n\r\nabcd"
        )
        raw = b""
        while True:
            piece = s.recv(65536)
            if not piece:
                break  # server dropped the connection — the correct signal
            raw += piece
        s.close()
    finally:
        httpd.shutdown()
    head, _, body = raw.partition(b"\r\n\r\n")
    assert head.startswith(b"HTTP/1.1 200")
    assert b"Transfer-Encoding: chunked" in head
    # the first chunk made it out; the stream is unterminated (no 0-chunk)
    assert b"\x01\x02" in body
    assert not body.endswith(b"0\r\n\r\n")
    # and no second status line was written into the body
    assert b"HTTP/1.1 500" not in body
    assert b"HTTP/1.1 400" not in body


def test_decode_rejects_out_of_range_codes(server):
    """Regression: out-of-range code indices were silently clamped by the
    device gather (wrong-but-valid audio, HTTP 200); they must 400 like
    /sample's label validation."""
    import urllib.error

    payload = json.dumps({"codes": [[99999] * 4] * 20}).encode()
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server + "/decode", payload)
    assert err.value.code == 400
    assert "codes" in json.loads(err.value.read())["error"]


def test_analysis_compiles_per_window_bucket_not_per_length():
    """Regression: _wav_to_mel analyzed the UNPADDED samples, so every
    distinct upload length compiled a fresh melspectrogram program (tens
    of seconds each through the TPU tunnel). The samples must be padded
    to the power-of-two window grid BEFORE the jitted analysis."""
    from neural_sound_generation_tpu.cli.serve import InferenceService
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 16, 1)), train=False
    )
    svc = InferenceService(cfg, model, variables, frames=16)
    seen_shapes = set()
    orig = svc.dsp.melspectrogram

    def spy(samples, a):
        seen_shapes.add(tuple(samples.shape))
        return orig(samples, a)

    svc.dsp = _DspSpy(orig_mod=__import__(
        "neural_sound_generation_tpu.ops.dsp", fromlist=["dsp"]
    ), spy=spy)
    # three different lengths inside the same window bucket -> ONE
    # analysis shape; a longer upload -> the next power-of-two bucket
    for seconds in (0.11, 0.13, 0.15, 0.4):
        svc._wav_to_mel(_wav_bytes(seconds=seconds))
    assert len(seen_shapes) == 2, seen_shapes


class _DspSpy:
    def __init__(self, orig_mod, spy):
        self._mod = orig_mod
        self._spy = spy

    def __getattr__(self, name):
        if name == "melspectrogram":
            return self._spy
        return getattr(self._mod, name)


def test_overloaded_stream_mux_maps_to_503():
    """Admission-control overload (MuxOverloaded) answers 503 with
    Retry-After — retryable server state, not a 400/500."""
    from http.server import ThreadingHTTPServer

    from neural_sound_generation_tpu.cli.serve import make_handler
    from neural_sound_generation_tpu.serving import MuxOverloaded

    class OverloadedService:
        class cfg:  # noqa: N801
            class audio:  # noqa: N801
                sample_rate = 22050

        def reconstruct_stream(self, body):
            raise MuxOverloaded("slots exhausted")

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(OverloadedService())
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(url + "/reconstruct_stream", b"xxxx")
        assert err.value.code == 503
        assert err.value.headers["Retry-After"] == "1"
        assert "retry" in json.loads(err.value.read())["error"]
    finally:
        httpd.shutdown()


def test_metrics_endpoint(server):
    """GET /metrics: per-endpoint request/error counters with latency
    percentiles, so an operator can see serving health without external
    tooling."""
    def snap():
        with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
            return json.loads(r.read())

    def stat(s, path, field):
        return s["endpoints"].get(path, {}).get(field, 0)

    before = snap()
    with _post(server + "/encode", _wav_bytes(seconds=0.2)) as r:
        assert r.status == 200
    with pytest.raises(urllib.error.HTTPError):
        _post(server + "/decode", b"not json")
    after = snap()
    assert after["uptime_s"] >= 0
    # deltas (the module-scoped server accumulates other tests' traffic)
    assert stat(after, "/encode", "requests") == (
        stat(before, "/encode", "requests") + 1
    )
    assert stat(after, "/encode", "errors") == stat(before, "/encode", "errors")
    assert stat(after, "/decode", "errors") == (
        stat(before, "/decode", "errors") + 1
    )
    enc = after["endpoints"]["/encode"]
    assert enc["latency_ms"]["p50"] > 0
    assert enc["latency_ms"]["p99"] >= enc["latency_ms"]["p50"]
