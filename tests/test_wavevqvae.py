"""Raw-waveform VQ-VAE + new loss tests (MoL, masked CE) + inference API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.models import VQVAE, GatedPixelCNN, WaveVQVAE
from neural_sound_generation_tpu.training import create_train_state, make_train_step
from neural_sound_generation_tpu.training.losses import (
    discretized_mix_logistic_loss,
    masked_cross_entropy,
    sample_from_discretized_mix_logistic,
    sequence_mask,
)


def test_wave_vqvae_raw_shapes(rng):
    model = WaveVQVAE(dim=16, z_dim=32, num_downsample=4, input_type="raw")
    x = jnp.asarray(rng.standard_normal((2, 256, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (out, z_e, z_q), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    assert z_e.shape == (2, 16, 16)  # 256 / 2^4
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh output


def test_wave_vqvae_mulaw_quantize_logits(rng):
    model = WaveVQVAE(
        dim=16, z_dim=32, num_downsample=4,
        input_type="mulaw-quantize", quantize_channels=256,
    )
    x = jnp.asarray(rng.integers(0, 256, (2, 256)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (out, z_e, _), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 256, 256)  # logits


def test_wave_vqvae_encode_decode_roundtrip(rng):
    model = WaveVQVAE(dim=16, z_dim=32, num_downsample=4)
    x = jnp.asarray(rng.standard_normal((2, 256, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    idx = model.apply(variables, x, train=False, method=WaveVQVAE.encode)
    assert idx.shape == (2, 16)
    wav = model.apply(variables, idx, train=False, method=WaveVQVAE.decode)
    assert wav.shape == (2, 256, 1)


def test_wave_vqvae_rvq_roundtrip_and_refinement(rng):
    """Round-5: residual VQ on the waveform family (num_quantizers > 1,
    SoundStream-style). Encode emits (Q, B, T') stage indices, decode
    sums stage vectors, and the two-stage quantization error is strictly
    below stage-one alone (the refinement property, mirroring the 2-D
    family's RVQ)."""
    from neural_sound_generation_tpu.ops.vq import residual_vq

    model = WaveVQVAE(dim=16, z_dim=32, num_downsample=4, num_quantizers=2)
    x = jnp.asarray(rng.standard_normal((2, 256, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert variables["params"]["codebook"].shape == (2, 32, 16)
    (out, z_e, z_q), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == x.shape and z_q.shape == z_e.shape

    idx = model.apply(variables, x, train=False, method=WaveVQVAE.encode)
    assert idx.shape == (2, 2, 16)  # (Q, B, T')
    wav = model.apply(variables, idx, train=False, method=WaveVQVAE.decode)
    assert wav.shape == (2, 256, 1)

    # refinement: ||z_e - sum_q z_q|| < ||z_e - z_q1||
    cb = variables["params"]["codebook"]
    _, z_q2, _ = residual_vq(z_e, cb)
    from neural_sound_generation_tpu.ops.vq import codebook_lookup, vq

    idx1 = vq(z_e, cb[0])
    z_q1 = codebook_lookup(cb[0], idx1).reshape(z_e.shape)
    e2 = float(jnp.mean((z_e - z_q2) ** 2))
    e1 = float(jnp.mean((z_e - z_q1) ** 2))
    assert e2 < e1


def test_wave_vqvae_rvq_train_step(rng):
    """RVQ wavevqvae trains through the production step (3-term loss on
    the summed stage vectors) and the loss drops."""
    cfg = Config().parse("batch_size=4")
    model = WaveVQVAE(dim=8, z_dim=16, num_downsample=3, num_quantizers=2)
    x = jnp.asarray(rng.standard_normal((4, 128, 1)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = create_train_state(variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    losses = []
    for i in range(40):
        state, metrics = step(state, {"x": x}, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.75 * losses[0], losses[::8]


def test_wave_vqvae_train_step_decreases_loss(rng):
    cfg = Config().parse("batch_size=4")
    model = WaveVQVAE(dim=8, z_dim=16, num_downsample=3)
    x = jnp.asarray(rng.standard_normal((4, 128, 1)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = create_train_state(variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    batch = {"x": x}
    first = None
    for i in range(25):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first


def test_wave_vqvae_categorical_train_step(rng):
    cfg = Config().parse("batch_size=2")
    model = WaveVQVAE(
        dim=8, z_dim=16, num_downsample=3,
        input_type="mulaw-quantize", quantize_channels=64,
    )
    x = jnp.asarray(rng.integers(0, 64, (2, 128)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = create_train_state(variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    batch = {"x": x, "input_lengths": jnp.asarray([128, 100], jnp.int32)}
    losses = []
    for i in range(20):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_wave_vqvae_speaker_conditioning(rng):
    model = WaveVQVAE(dim=8, z_dim=16, num_downsample=3, n_speakers=4, gin_channels=8)
    x = jnp.asarray(rng.standard_normal((2, 128, 1)).astype(np.float32))
    g0 = jnp.zeros((2,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False, g=g0)
    a, _, _ = model.apply(variables, x, train=False, g=g0)
    b, _, _ = model.apply(variables, x, train=False, g=jnp.asarray([1, 2], jnp.int32))
    assert not np.allclose(np.asarray(a), np.asarray(b))


# --------------------------------------------------------------- new losses


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.asarray([2, 4]), 5))
    np.testing.assert_array_equal(m, [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])


def test_masked_cross_entropy_ignores_padding(rng):
    logits = jnp.asarray(rng.standard_normal((2, 6, 5)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 5, (2, 6)), jnp.int32)
    full = masked_cross_entropy(logits, targets)
    # corrupt the padded region; masked loss must not change
    lengths = jnp.asarray([4, 6], jnp.int32)
    base = masked_cross_entropy(logits, targets, lengths)
    corrupted = targets.at[0, 4:].set(0)
    same = masked_cross_entropy(logits, corrupted, lengths)
    np.testing.assert_allclose(float(base), float(same), rtol=1e-6)
    assert np.isfinite(float(full))


def test_mol_loss_peaks_at_mean(rng):
    """NLL must be lower for targets at the predicted mean than far away."""
    B, T, M = 2, 16, 10
    y_hat = np.zeros((B, T, 3 * M), np.float32)
    y_hat[..., M : 2 * M] = 0.3  # all means at 0.3
    y_hat[..., 2 * M :] = -5.0  # fairly sharp scales
    good = discretized_mix_logistic_loss(
        jnp.asarray(y_hat), jnp.full((B, T), 0.3), num_classes=256
    )
    bad = discretized_mix_logistic_loss(
        jnp.asarray(y_hat), jnp.full((B, T), -0.8), num_classes=256
    )
    assert float(good) < float(bad)
    assert np.isfinite(float(good)) and np.isfinite(float(bad))


def test_mol_loss_edge_targets():
    B, T, M = 1, 8, 4
    y_hat = jnp.zeros((B, T, 3 * M))
    for target in (-1.0, 1.0, 0.0):
        val = discretized_mix_logistic_loss(
            y_hat, jnp.full((B, T), target), num_classes=256
        )
        assert np.isfinite(float(val))


def test_mol_sampling_concentrates(rng):
    M = 5
    y_hat = np.zeros((1000, 3 * M), np.float32)
    y_hat[:, M : 2 * M] = 0.5
    y_hat[:, 2 * M :] = -6.0
    samples = np.asarray(
        sample_from_discretized_mix_logistic(jnp.asarray(y_hat), jax.random.PRNGKey(0))
    )
    assert abs(samples.mean() - 0.5) < 0.02
    assert samples.std() < 0.05


def test_mol_grad_finite(rng):
    B, T, M = 2, 8, 10
    y_hat = jnp.asarray(rng.standard_normal((B, T, 3 * M)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32))

    g = jax.grad(lambda p: discretized_mix_logistic_loss(p, y, num_classes=256))(y_hat)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------- inference


def test_inference_module_end_to_end(rng):
    from neural_sound_generation_tpu.inference import (
        codes_to_audio,
        extract_units,
        reconstruct_audio,
        sample_prior_audio,
    )

    cfg = Config().audio
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    mels = jnp.asarray(rng.uniform(0, 1, (2, 80, 16, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), mels, train=False)

    units = extract_units(model, variables, mels)
    assert units.shape == (2, 20, 4)

    mel_out, wavs = reconstruct_audio(
        model, variables, mels, cfg, jax.random.PRNGKey(1)
    )
    assert mel_out.shape == (2, 80, 16)
    assert wavs.shape[0] == 2 and np.isfinite(np.asarray(wavs)).all()

    wavs2 = codes_to_audio(model, variables, units, cfg, jax.random.PRNGKey(2))
    assert wavs2.shape[0] == 2

    prior = GatedPixelCNN(input_dim=16, dim=8, n_layers=2, n_classes=3)
    pv = prior.init(
        jax.random.PRNGKey(0), units, jnp.zeros((2,), jnp.int32)
    )
    codes, gen = sample_prior_audio(
        model, variables, prior, pv,
        jnp.asarray([0, 1], jnp.int32), (20, 4), cfg, jax.random.PRNGKey(3),
    )
    assert codes.shape == (2, 20, 4)
    assert gen.shape[0] == 2 and np.isfinite(np.asarray(gen)).all()


def test_invert_cli(tmp_path, rng, capsys):
    from neural_sound_generation_tpu.cli import invert

    mel = rng.uniform(0, 1, (30, 80)).astype(np.float32)  # time-major
    np.save(tmp_path / "ljspeech-mel-00001.npy", mel)
    out = str(tmp_path / "recon.wav")
    invert.main(
        [str(tmp_path), "22050", "1024", "256", "80", "--output", out]
    )
    assert "wrote" in capsys.readouterr().out
    from scipy.io import wavfile

    sr, data = wavfile.read(out)
    assert sr == 22050 and len(data) > 0
