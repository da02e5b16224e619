"""Native motion stack tests: C++ build, joint-angle extraction parity,
replay/capture roundtrip, listener callbacks, PCA, and the
motion-conditioned generation path."""

import os
import time

import numpy as np
import pytest

from neural_sound_generation_tpu.motion import (
    NUM_FEATURES,
    MotionController,
    PCAProjector,
    replay_controller,
    run_pca,
    run_pca_np,
    synthetic_controller,
)
from neural_sound_generation_tpu.motion.capture import extract_features_native
from neural_sound_generation_tpu.motion.pca import load_pca

REFERENCE_CSV = "/root/reference/results/joint_angle_data.csv"


# ------------------------------------------------------------------ native


def test_native_builds_and_reports_features():
    from neural_sound_generation_tpu.motion.capture import load_library

    lib = load_library()
    assert lib.nsg_num_features() == NUM_FEATURES == 18


def test_cpp_feature_extraction_matches_numpy(rng):
    """C++ joint-angle math vs an independent numpy implementation of the
    reference formulas (inference.py:100-144): pitch=atan2(y,-z),
    yaw=atan2(x,-z) of hand direction, roll=atan2(x,-y) of palm normal,
    then adjacent-bone dots."""
    direction = rng.standard_normal(3)
    direction /= np.linalg.norm(direction)
    normal = rng.standard_normal(3)
    normal /= np.linalg.norm(normal)
    bones = rng.standard_normal((5, 4, 3))
    bones /= np.linalg.norm(bones, axis=-1, keepdims=True)

    scene = np.concatenate([direction, normal, bones.reshape(-1)])
    got = extract_features_native(scene)

    expected = [
        np.arctan2(direction[1], -direction[2]),
        np.arctan2(normal[0], -normal[1]),
        np.arctan2(direction[0], -direction[2]),
    ]
    for f in range(5):
        for b in range(1, 4):
            expected.append(float(np.dot(bones[f, b - 1], bones[f, b])))
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_synthetic_controller_deterministic():
    a = synthetic_controller(seed=7, n_frames=50)
    b = synthetic_controller(seed=7, n_frames=50)
    c = synthetic_controller(seed=8, n_frames=50)
    try:
        fa, fb, fc = a.drain(50), b.drain(50), c.drain(50)
    finally:
        a.close(); b.close(); c.close()
    assert fa.shape == (50, 18)
    np.testing.assert_array_equal(fa, fb)
    assert not np.allclose(fa, fc)
    # angles bounded, dots in [-1, 1]
    assert np.abs(fa[:, 3:]).max() <= 1.0 + 1e-9
    assert np.isfinite(fa).all()


def test_record_and_replay_roundtrip(tmp_path):
    path = str(tmp_path / "rec.csv")
    ctrl = synthetic_controller(seed=1, n_frames=40)
    try:
        got = ctrl.record_csv(path, 40)
    finally:
        ctrl.close()
    assert got == 40

    rep = replay_controller(path)
    try:
        assert len(rep) == 40
        frames = rep.drain(40)
    finally:
        rep.close()
    orig = synthetic_controller(seed=1, n_frames=40)
    try:
        expected = orig.drain(40)
    finally:
        orig.close()
    np.testing.assert_allclose(frames, expected, atol=1e-12)


def test_streaming_thread_and_poll():
    ctrl = synthetic_controller(seed=0, fps=500.0, n_frames=100)
    try:
        ctrl.start()
        deadline = time.time() + 5.0
        while ctrl.poll() is None and time.time() < deadline:
            time.sleep(0.005)
        frame = ctrl.poll()
        assert frame is not None and frame.shape == (18,)
        result = ctrl.read(after_id=0, timeout=5.0)
        assert result is not None
        fid, feats = result
        assert fid >= 1 and feats.shape == (18,)
        ctrl.stop()
        assert not ctrl.running
    finally:
        ctrl.close()


def test_listener_callbacks_from_native_thread():
    """The Controller/Listener push model (reference SWIG director
    pattern): callbacks arrive on the producer thread."""
    received = []
    ctrl = synthetic_controller(seed=0, fps=1000.0, n_frames=30)
    ctrl.add_listener(lambda f: received.append(f.copy()))
    try:
        ctrl.start()
        deadline = time.time() + 5.0
        while not ctrl.done and time.time() < deadline:
            time.sleep(0.01)
    finally:
        ctrl.stop()
        ctrl.close()
    assert len(received) >= 25  # nearly all 30 frames delivered
    assert all(f.shape == (18,) for f in received)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_CSV), reason="reference recording not mounted"
)
def test_replay_reference_recording():
    """The checked-in Leap capture (results/joint_angle_data.csv, 3209
    rows x 18 cols) replays through the native driver unchanged."""
    ctrl = replay_controller(REFERENCE_CSV)
    try:
        n = len(ctrl)
        assert n == 3209
        frames = ctrl.drain(100)
    finally:
        ctrl.close()
    assert frames.shape == (100, 18)
    raw = np.genfromtxt(REFERENCE_CSV, delimiter=",", max_rows=100)
    np.testing.assert_allclose(frames, raw, atol=1e-12)


def test_replay_missing_file():
    with pytest.raises(FileNotFoundError):
        replay_controller("/tmp/definitely-not-here.csv")


def test_replay_loop_mode(tmp_path):
    path = str(tmp_path / "small.csv")
    np.savetxt(path, np.arange(36, dtype=float).reshape(2, 18), delimiter=",")
    ctrl = replay_controller(path, loop=True)
    try:
        frames = ctrl.drain(5)
    finally:
        ctrl.close()
    assert frames.shape == (5, 18)
    np.testing.assert_array_equal(frames[0], frames[2])  # wrapped


# --------------------------------------------------------------------- PCA


def test_run_pca_matches_sklearn(rng):
    x = rng.standard_normal((100, 18))
    ours = run_pca(x, 3)
    from sklearn.decomposition import PCA
    from sklearn.preprocessing import StandardScaler

    ref = PCA(3).fit_transform(StandardScaler().fit_transform(x))
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_run_pca_np_orthogonal_projection(rng):
    x = rng.standard_normal((50, 6))
    proj = run_pca_np(x.copy())
    assert proj.shape == (50, 6)
    # projected components are decorrelated
    cov = np.cov(proj, rowvar=False)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-8
    # variance sorted descending
    variances = np.diag(cov)
    assert all(variances[i] >= variances[i + 1] - 1e-9 for i in range(5))


def test_projector_streaming_matches_batch(rng):
    x = rng.standard_normal((200, 18))
    proj = PCAProjector.fit(x, 3)
    batch = proj.project(x)
    np.testing.assert_allclose(batch, run_pca(x, 3), atol=1e-8)
    one = proj.project(x[5])
    np.testing.assert_allclose(one[0], batch[5], atol=1e-10)


def test_projector_save_load(tmp_path, rng):
    x = rng.standard_normal((50, 18))
    proj = PCAProjector.fit(x, 3)
    path = str(tmp_path / "pca.npz")
    proj.save(path)
    back = PCAProjector.load(path)
    np.testing.assert_allclose(back.project(x), proj.project(x))


def test_load_pca_from_csv(tmp_path, rng):
    path = str(tmp_path / "angles.csv")
    np.savetxt(path, rng.standard_normal((60, 18)), delimiter=",")
    proj = load_pca(path, 3)
    assert proj.n_components == 3


# ----------------------------------------------------- motion -> generation


def test_motion_driven_generation(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.motion.inference import MotionDrivenGenerator

    cfg = Config().audio
    # record a synthetic session, fit PCA on it
    csv = str(tmp_path / "session.csv")
    cap = synthetic_controller(seed=3, n_frames=128)
    try:
        cap.record_csv(csv, 128)
    finally:
        cap.close()
    proj = load_pca(csv, 3)

    model = VQVAE(input_dim=1, dim=16, z_dim=32, cond_features=3)
    sample = jnp.zeros((1, 80, 16, 1))
    variables = model.init(
        jax.random.PRNGKey(0), sample, train=False, features=jnp.zeros((1, 3))
    )
    gen = MotionDrivenGenerator(model, variables, proj, cfg, latent_hw=(20, 4))

    rep = replay_controller(csv)
    try:
        windows = list(gen.run_stream(rep, window=16, max_windows=4))
    finally:
        rep.close()
    assert len(windows) == 4
    latents, mel = windows[0]
    assert latents.shape == (16, 3)
    assert mel.shape == (80, 16)
    assert np.isfinite(mel).all()
    # different motion -> different audio frames
    assert not np.allclose(windows[0][1], windows[-1][1])


def test_motion_cli_capture_analyze_generate(tmp_path, capsys):
    from neural_sound_generation_tpu.cli import motion as motion_cli

    csv = str(tmp_path / "cap.csv")
    motion_cli.main(["capture", csv, "--frames", "64", "--seed", "2"])
    assert "recorded 64 frames" in capsys.readouterr().out

    motion_cli.main(["analyze", csv])
    out = capsys.readouterr().out
    assert "64 frames x 18 features" in out

    wav = str(tmp_path / "gen.wav")
    motion_cli.main([
        "generate", csv, wav, "--dim", "8", "--z-dim", "16",
        "--max-windows", "2",
    ])
    assert "generated 2 windows" in capsys.readouterr().out
    from scipy.io import wavfile

    sr, data = wavfile.read(wav)
    assert sr == 22050 and len(data) > 0


def test_motion_cli_watch(capsys):
    from neural_sound_generation_tpu.cli import motion as motion_cli

    motion_cli.main(["watch", "--frames", "5", "--fps", "500"])
    out = capsys.readouterr().out
    assert "watched" in out
    assert "pitch=" in out


def test_motion_golden_regression():
    """Frozen synthetic-hand features from the round-1 C++ implementation —
    guards the native scene-graph math across rounds/compilers."""
    path = os.path.join(os.path.dirname(__file__), "golden", "motion_golden.npz")
    g = np.load(path)
    c = synthetic_controller(seed=123, n_frames=16)
    try:
        frames = c.drain(16)
    finally:
        c.close()
    np.testing.assert_allclose(frames, g["frames"], atol=1e-12)
