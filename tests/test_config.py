"""Config core tests: typed defaults + reference-preset-schema overlay."""

import glob
import json
import os

import pytest

from neural_sound_generation_tpu.config import Config, config_debug_string, load_preset

PRESET_DIR = os.path.join(
    os.path.dirname(__file__), "..", "neural_sound_generation_tpu", "config", "presets"
)
REFERENCE_PRESETS = "/root/reference/src/presets"


def test_defaults_match_reference_vocoder_hparams():
    # Spot-check against src/hparams.py:8-129 defaults.
    cfg = Config()
    assert cfg.audio.sample_rate == 22050
    assert cfg.audio.fft_size == 1024
    assert cfg.audio.hop_size == 256
    assert cfg.audio.num_mels == 80
    assert cfg.audio.fmin == 125
    assert cfg.audio.fmax == 7600
    assert cfg.audio.min_level_db == -100
    assert cfg.audio.ref_level_db == 20
    assert cfg.audio.input_type == "raw"
    assert cfg.audio.quantize_channels == 65536
    assert cfg.audio.rescaling_max == 0.999
    assert cfg.train.batch_size == 2
    assert cfg.train.initial_learning_rate == 1e-3
    assert cfg.train.max_time_steps == 8000
    assert cfg.train.ema_decay == 0.9999
    assert cfg.data.test_size == 0.0441
    assert cfg.data.random_state == 1234
    assert cfg.arch.n_speakers == 7


def test_bundled_presets_parse():
    for path in sorted(glob.glob(os.path.join(PRESET_DIR, "*.json"))):
        cfg = load_preset(path)
        assert cfg.name == "vocoder"


def test_cmu_arctic_8bit_preset_values():
    cfg = load_preset(os.path.join(PRESET_DIR, "cmu_arctic_8bit.json"))
    assert cfg.audio.input_type == "mulaw-quantize"
    assert cfg.audio.quantize_channels == 256
    assert cfg.audio.sample_rate == 16000
    assert cfg.arch.out_channels == 256
    assert cfg.train.exponential_moving_average is False


def test_multispeaker_preset_values():
    cfg = load_preset(os.path.join(PRESET_DIR, "multispeaker_cmu_arctic_mixture.json"))
    assert cfg.arch.gin_channels == 16
    assert cfg.arch.n_speakers == 7
    assert cfg.audio.sample_rate == 16000


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_PRESETS), reason="reference not mounted"
)
def test_reference_preset_files_parse_unchanged():
    """The original reference preset JSONs must load without edits —
    the compatibility surface (src/preprocess.py:62-64)."""
    paths = sorted(glob.glob(os.path.join(REFERENCE_PRESETS, "*.json")))
    assert paths
    for path in paths:
        cfg = load_preset(path)
        assert cfg.audio.fft_size == 1024


def test_parse_overrides():
    cfg = Config().parse("batch_size=8,input_type=mulaw,sample_rate=16000")
    assert cfg.train.batch_size == 8
    assert cfg.audio.input_type == "mulaw"
    assert cfg.audio.sample_rate == 16000


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        Config().parse_json({"not_a_key": 1})


def test_invalid_input_type_raises():
    with pytest.raises(ValueError):
        Config().parse_json({"input_type": "bogus"})


def test_flat_roundtrip():
    cfg = Config().parse("batch_size=16,num_mels=40")
    flat = cfg.to_flat_dict()
    cfg2 = Config().parse_json(flat)
    assert cfg2 == cfg
    assert json.dumps(flat)  # serializable


def test_debug_string():
    s = config_debug_string(Config())
    assert s.startswith("Hyperparameters:")
    assert "sample_rate: 22050" in s


def test_mulaw_predicates():
    a = Config().parse_json({"input_type": "mulaw-quantize"}).audio
    assert a.is_mulaw_quantize and not a.is_scalar_input
    b = Config().parse_json({"input_type": "mulaw"}).audio
    assert b.is_mulaw and b.is_scalar_input
    c = Config().audio
    assert c.is_raw and c.is_scalar_input


def test_tacotron_arch_config_surface():
    """hparams_tacotron.py:120-167 field surface preserved (config-only,
    like the reference — no synthesis engine)."""
    from neural_sound_generation_tpu.config import TacotronArchConfig

    t = TacotronArchConfig()
    assert t.embedding_dim == 512
    assert t.enc_conv_num_layers == 3
    assert t.attention_dim == 128
    assert tuple(t.prenet_layers) == (256, 256)
    assert t.decoder_lstm_units == 1024
    assert t.cbhg_kernels == 8
    assert t.cross_entropy_pos_weight == 20
    assert t.tacotron_num_gpus == 1  # multi-GPU knobs: config only

