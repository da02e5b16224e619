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


# ---------------------------------------------------------------------------
# Gesture recognition (reference: src/inference.py:170-206 consumes the Leap
# SDK recognizers — circle with clockwiseness + swept angle, swipe, key tap,
# screen tap; SDK classes src/Leap.h:1812)
# ---------------------------------------------------------------------------


def _scripted_events(fps=60.0):
    from neural_sound_generation_tpu.motion import scripted_gesture_controller

    c = scripted_gesture_controller(fps=fps)
    try:
        frames = c.drain(len(c))
        events = c.poll_gestures(max_events=2048)
    finally:
        c.close()
    return frames, events


def test_gesture_choreography_detects_all_types():
    from neural_sound_generation_tpu.motion import (
        GESTURE_STATE_START,
        GESTURE_STATE_STOP,
        GESTURE_TYPE_CIRCLE,
        GESTURE_TYPE_KEY_TAP,
        GESTURE_TYPE_SCREEN_TAP,
        GESTURE_TYPE_SWIPE,
    )

    frames, events = _scripted_events()
    assert frames.shape[1] == 18  # feature stream stays intact
    types = {e.type for e in events}
    assert types == {
        GESTURE_TYPE_CIRCLE, GESTURE_TYPE_SWIPE,
        GESTURE_TYPE_KEY_TAP, GESTURE_TYPE_SCREEN_TAP,
    }
    # exactly two circles: first clockwise, second counterclockwise
    circle_starts = [
        e for e in events
        if e.type == GESTURE_TYPE_CIRCLE and e.state == GESTURE_STATE_START
    ]
    assert len(circle_starts) == 2
    assert circle_starts[0].clockwise is True
    assert circle_starts[1].clockwise is False
    # each circle sweeps over a full turn and reports a sane radius
    circle_stops = [
        e for e in events
        if e.type == GESTURE_TYPE_CIRCLE and e.state == GESTURE_STATE_STOP
    ]
    assert len(circle_stops) == 2
    for stop in circle_stops:
        assert stop.progress > 1.0
        assert 30.0 < stop.radius < 90.0  # scripted radius is 60 mm
    # one swipe, rightward (+x), fast
    swipe_starts = [
        e for e in events
        if e.type == GESTURE_TYPE_SWIPE and e.state == GESTURE_STATE_START
    ]
    assert len(swipe_starts) == 1
    assert swipe_starts[0].direction[0] > 0.9
    assert swipe_starts[0].speed > 600.0
    # taps are discrete STATE_STOP events, one each
    assert sum(1 for e in events if e.type == GESTURE_TYPE_KEY_TAP) == 1
    assert sum(1 for e in events if e.type == GESTURE_TYPE_SCREEN_TAP) == 1


def test_gesture_event_ordering_and_states():
    """Start/update/stop discipline: every continuous gesture opens with
    START, carries UPDATEs, and closes with STOP; ids are stable."""
    from neural_sound_generation_tpu.motion import (
        GESTURE_STATE_START,
        GESTURE_STATE_STOP,
        GESTURE_STATE_UPDATE,
        GESTURE_TYPE_CIRCLE,
        GESTURE_TYPE_SWIPE,
    )

    _, events = _scripted_events()
    by_id = {}
    for e in events:
        by_id.setdefault((e.type, e.id), []).append(e)
    for (etype, _), seq in by_id.items():
        if etype in (GESTURE_TYPE_CIRCLE, GESTURE_TYPE_SWIPE):
            assert seq[0].state == GESTURE_STATE_START
            assert seq[-1].state == GESTURE_STATE_STOP
            assert all(
                e.state == GESTURE_STATE_UPDATE for e in seq[1:-1]
            )
            # circle progress is monotonic within a gesture
            if etype == GESTURE_TYPE_CIRCLE:
                progresses = [e.progress for e in seq]
                assert progresses == sorted(progresses)


def test_gesture_detection_frame_rate_invariant():
    """The recognizers track the Leap device's nominal 60-115 fps range."""
    from neural_sound_generation_tpu.motion import GESTURE_TYPE_CIRCLE

    _, ev60 = _scripted_events(fps=60.0)
    _, ev115 = _scripted_events(fps=115.0)
    kinds60 = sorted({(e.type, e.clockwise) for e in ev60
                      if e.type == GESTURE_TYPE_CIRCLE})
    kinds115 = sorted({(e.type, e.clockwise) for e in ev115
                       if e.type == GESTURE_TYPE_CIRCLE})
    assert kinds60 == kinds115 == [(GESTURE_TYPE_CIRCLE, False),
                                   (GESTURE_TYPE_CIRCLE, True)]


def test_gesture_push_callbacks_from_native_thread():
    """Gesture events also arrive via the push callback (Listener model)."""
    import threading

    from neural_sound_generation_tpu.motion import (
        GESTURE_TYPE_CIRCLE,
        scripted_gesture_controller,
    )

    got = []
    seen_circle = threading.Event()

    def on_gesture(event):
        got.append(event)
        if event.type == GESTURE_TYPE_CIRCLE:
            seen_circle.set()

    c = scripted_gesture_controller(fps=1000.0)  # fast playback
    c.add_gesture_listener(on_gesture)
    try:
        c.start()
        assert seen_circle.wait(timeout=20.0)
    finally:
        c.stop()
        c.close()
    assert any(e.type == GESTURE_TYPE_CIRCLE for e in got)


def test_gestures_absent_for_feature_only_replay(tmp_path):
    """CSV recordings carry reduced features only (no positions) — the
    detector must stay silent rather than hallucinate gestures."""
    from neural_sound_generation_tpu.motion import (
        replay_controller,
        synthetic_controller,
    )

    csv = str(tmp_path / "rec.csv")
    cap = synthetic_controller(seed=5, n_frames=64)
    try:
        cap.record_csv(csv, 64)
    finally:
        cap.close()
    rep = replay_controller(csv)
    try:
        rep.drain(64)
        assert rep.poll_gestures() == []
    finally:
        rep.close()


@pytest.mark.slow
def test_motion_cli_watch_gestures(capsys):
    from neural_sound_generation_tpu.cli import motion as motion_cli

    motion_cli.main(["watch", "--gestures", "--fps", "1000"])
    out = capsys.readouterr().out
    assert "Circle" in out and "clockwise" in out
    assert "Swipe" in out
    assert "key_tap" in out and "screen_tap" in out
    assert "degrees" in out  # swept-angle rendering (inference.py:180-184)


def test_restart_after_stream_exhaustion_does_not_abort():
    """Regression: start() after the producer thread exited on its own
    (stream exhausted, running_ already false) move-assigned onto a
    still-joinable std::thread — std::terminate killed the interpreter.
    A restart must be safe (and a no-op stream-wise: the source is
    already drained)."""
    ctrl = synthetic_controller(seed=3, fps=2000.0, n_frames=5)
    try:
        ctrl.start()
        deadline = time.time() + 20
        while not ctrl.done and time.time() < deadline:
            time.sleep(0.01)
        assert ctrl.done
        # producer exited by itself; restarting must not terminate us
        ctrl.start()
        ctrl.stop()
    finally:
        ctrl.close()


def test_closed_controller_raises_not_segfaults():
    """Regression: native calls on a closed controller dereferenced a
    NULL handle (SIGSEGV); they must raise ValueError instead."""
    ctrl = synthetic_controller(seed=1, n_frames=5)
    ctrl.close()
    with pytest.raises(ValueError, match="closed"):
        ctrl.stop()
    with pytest.raises(ValueError, match="closed"):
        _ = ctrl.running
    with pytest.raises(ValueError, match="closed"):
        ctrl.poll()
    ctrl.close()  # idempotent


@pytest.mark.filterwarnings("ignore::RuntimeWarning")  # sklearn 1-sample PCA
def test_analyze_single_row_csv(tmp_path):
    """Regression: nsg-motion analyze on a single-frame recording used to
    IndexError (1-D genfromtxt result without the load_pca guard)."""
    from neural_sound_generation_tpu.cli.motion import cmd_analyze

    row = np.linspace(0.0, 1.0, 22)
    path = tmp_path / "one.csv"
    np.savetxt(path, row[None], delimiter=",")

    class Args:
        input_csv = str(path)
        components = 1  # a 1-frame recording supports exactly 1 component

    cmd_analyze(Args)  # must not raise
