"""Motion-stack CLI: capture / analyze / generate.

Reference surfaces rebuilt:
  * ``capture`` — record joint-angle rows to CSV
    (src/MotionDataCollection2csv.py writes ./result/hand_rest.csv);
    here the synthetic C++ hand is the frame source.
  * ``analyze`` — fit PCA on a recorded CSV and print the explained
    projection (src/MotionDataAnalysis.py + src/pca.py demo).
  * ``generate`` — replay a CSV through PCA into a feature-conditioned
    decoder and write audio (the loop src/inference.py intended,
    BASELINE config #5).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Motion-conditioning tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    cap = sub.add_parser("capture", help="record synthetic hand motion to CSV")
    cap.add_argument("output_csv")
    cap.add_argument("--frames", type=int, default=600)
    cap.add_argument("--seed", type=int, default=0)

    ana = sub.add_parser("analyze", help="fit PCA on a joint-angle CSV")
    ana.add_argument("input_csv")
    ana.add_argument("--components", type=int, default=3)

    wat = sub.add_parser(
        "watch",
        help="print streamed frames to the console (the Read.py/Read.cpp "
             "sample-app capability, src/Read.cpp:56)",
    )
    wat.add_argument("--csv", default=None, help="replay this CSV; default: synthetic")
    wat.add_argument("--frames", type=int, default=20)
    wat.add_argument("--fps", type=float, default=120.0)
    wat.add_argument("--seed", type=int, default=0)
    wat.add_argument(
        "--gestures", action="store_true",
        help="stream the scripted gesture choreography and print "
             "recognized circle/swipe/tap events "
             "(src/inference.py:170-206 handling)",
    )

    gen = sub.add_parser("generate", help="replay CSV -> decoder -> wav")
    gen.add_argument("input_csv")
    gen.add_argument("output_wav")
    gen.add_argument("--ckpt-dir", default=None,
                     help="trained VQ-VAE checkpoint dir (optional; "
                          "untrained weights are used if omitted)")
    gen.add_argument("--dim", type=int, default=64)
    gen.add_argument("--z-dim", type=int, default=128)
    gen.add_argument("--components", type=int, default=3)
    gen.add_argument("--window", type=int, default=16)
    gen.add_argument("--max-windows", type=int, default=8)
    gen.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def cmd_capture(args):
    from neural_sound_generation_tpu.motion import synthetic_controller

    ctrl = synthetic_controller(seed=args.seed, n_frames=args.frames)
    try:
        got = ctrl.record_csv(args.output_csv, args.frames)
    finally:
        ctrl.close()
    print(f"recorded {got} frames -> {args.output_csv}")


def cmd_analyze(args):
    from neural_sound_generation_tpu.motion.pca import load_pca

    proj = load_pca(args.input_csv, args.components)
    data = np.genfromtxt(args.input_csv, delimiter=",")
    if data.ndim == 1:  # single-row recording (same guard as load_pca)
        data = data[None, :]
    latents = proj.project(data)
    print(f"{data.shape[0]} frames x {data.shape[1]} features "
          f"-> {latents.shape[1]} components")
    print("per-component latent std:", np.round(latents.std(axis=0), 4).tolist())


def _describe_gesture(event, last_progress):
    """Render one gesture event the way the reference's listener handles
    them (src/inference.py:170-206): circles report clockwiseness and the
    angle swept since the previous update; swipes report direction/speed;
    taps report position."""
    import math

    from neural_sound_generation_tpu.motion import (
        GESTURE_STATE_START,
        GESTURE_TYPE_CIRCLE,
        GESTURE_TYPE_SWIPE,
    )

    if event.type == GESTURE_TYPE_CIRCLE:
        clockwiseness = (
            "clockwise" if event.clockwise else "counterclockwise"
        )
        swept = 0.0
        if event.state != GESTURE_STATE_START:
            swept = (
                event.progress - last_progress.get(event.id, event.progress)
            ) * 2 * math.pi
        last_progress[event.id] = event.progress
        return (
            f"Circle id: {event.id}, {event.state_name}, progress: "
            f"{event.progress:.2f}, radius: {event.radius:.1f}, angle: "
            f"{math.degrees(swept):.1f} degrees, {clockwiseness}"
        )
    if event.type == GESTURE_TYPE_SWIPE:
        d = event.direction
        return (
            f"Swipe id: {event.id}, {event.state_name}, direction: "
            f"({d[0]:+.2f} {d[1]:+.2f} {d[2]:+.2f}), speed: {event.speed:.0f}"
        )
    p = event.position
    return (
        f"{event.type_name} id: {event.id}, {event.state_name}, position: "
        f"({p[0]:.0f} {p[1]:.0f} {p[2]:.0f})"
    )


def cmd_watch(args):
    """Stream frames through the listener-callback path and print them —
    the console sample app (src/Read.py:17-172 twin). With --gestures,
    recognized gesture events are printed as they fire."""
    import threading

    from neural_sound_generation_tpu.motion import (
        replay_controller,
        scripted_gesture_controller,
        synthetic_controller,
    )

    if args.gestures:
        ctrl = scripted_gesture_controller(fps=args.fps)
        args.frames = max(args.frames, len(ctrl))
    elif args.csv:
        ctrl = replay_controller(args.csv, fps=args.fps)
    else:
        ctrl = synthetic_controller(seed=args.seed, fps=args.fps,
                                    n_frames=args.frames)
    last_progress = {}
    if args.gestures:
        ctrl.add_gesture_listener(
            lambda e: print("  " + _describe_gesture(e, last_progress))
        )
    done = threading.Event()
    count = [0]

    def on_frame(feats):
        count[0] += 1
        if not args.gestures:  # gesture mode prints events, not frames
            print(
                f"frame {count[0]}: pitch={feats[0]:+.3f} roll={feats[1]:+.3f} "
                f"yaw={feats[2]:+.3f} joints[{feats[3]:+.2f} {feats[4]:+.2f} ...]"
            )
        if count[0] >= args.frames:
            done.set()

    ctrl.add_listener(on_frame)
    try:
        ctrl.start()
        done.wait(timeout=max(5.0, args.frames / args.fps * 4))
    finally:
        ctrl.stop()
        ctrl.close()
    print(f"watched {count[0]} frames")


def cmd_generate(args):
    import jax.numpy as jnp

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.motion import replay_controller
    from neural_sound_generation_tpu.motion.inference import MotionDrivenGenerator
    from neural_sound_generation_tpu.motion.pca import load_pca
    from neural_sound_generation_tpu.ops import dsp
    from neural_sound_generation_tpu.training import checkpoint, create_train_state

    cfg = Config()
    projector = load_pca(args.input_csv, args.components)
    model = VQVAE(
        input_dim=1, dim=args.dim, z_dim=args.z_dim,
        cond_features=args.components,
    )
    latent_hw = (cfg.audio.num_mels // 4, args.window // 4)
    sample = jnp.zeros((1, cfg.audio.num_mels, args.window, 1))
    variables = model.init(
        jax.random.PRNGKey(args.seed), sample, train=False,
        features=jnp.zeros((1, args.components)),
    )
    if args.ckpt_dir:
        state = create_train_state(variables, cfg.train)
        restored, _ = checkpoint.restore(args.ckpt_dir, state)
        variables = jax.device_put({
            "params": restored.params, "batch_stats": restored.batch_stats,
        })

    gen = MotionDrivenGenerator(model, variables, projector, cfg.audio, latent_hw)
    ctrl = replay_controller(args.input_csv)
    mels = []
    try:
        for latents, mel in gen.run_stream(
            ctrl, window=args.window, max_windows=args.max_windows
        ):
            mels.append(mel)
    finally:
        ctrl.close()
    if not mels:
        print("no frames in recording")
        return
    # each window yields one (num_mels, frames) mel; concatenate along time
    mel_full = np.concatenate(mels, axis=-1)
    wav = dsp.inv_mel_spectrogram(
        jnp.asarray(mel_full), cfg.audio, jax.random.PRNGKey(args.seed)
    )
    dsp.save_wav(np.asarray(wav), args.output_wav, cfg.audio.sample_rate)
    print(f"generated {len(mels)} windows -> {args.output_wav}")


def main(argv=None):
    from neural_sound_generation_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    args = parse_args(argv)
    {
        "capture": cmd_capture,
        "analyze": cmd_analyze,
        "watch": cmd_watch,
        "generate": cmd_generate,
    }[args.cmd](args)


if __name__ == "__main__":
    main(sys.argv[1:])
