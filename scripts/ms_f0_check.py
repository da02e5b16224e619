"""Speaker-consistency check of the multi-speaker chain's samples.

The soak corpus gives speaker s the fundamental F0_s = 100 * 1.155^s Hz
(scripts/multispeaker_soak.py). If the class(=speaker)-conditioned
prior + speaker-conditioned decoder actually condition, the audio
sampled with --label s must carry speaker s's fundamental. This script
estimates each sample's F0 via autocorrelation and reports, per label,
the median estimate vs the target — the end-to-end evidence that
conditioning matters (the swap-MSE probe is blunted by the VQ codes
themselves carrying speaker identity: the encoder is not
speaker-stripped, so recon error moves little when only g changes).
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16000


def estimate_f0(wav: np.ndarray, sr: int = SR,
                fmin: float = 60.0, fmax: float = 400.0,
                n_harm: int = 4) -> float:
    """Median harmonic-product-spectrum F0 over voiced 40 ms frames.

    Round-5 replacement for the autocorrelation-peak estimator: that
    one read the two lowest-F0 speakers an octave HIGH (PERF.md round-4
    "Multi-speaker soak" caveat — the pitch contour smears the long
    true-period peak more than its half-period alias within a frame),
    and naive octave correction over-corrects high-F0 speakers (the
    autocorrelation at 2T of any periodic frame is near-equal to T's).
    HPS resolves the ambiguity structurally: the product of the
    spectrum at k*f aligns every harmonic only at the true fundamental,
    so neither octave is favored."""
    frame = int(0.04 * sr)
    hop = frame // 2
    nfft = 8192
    freqs = np.fft.rfftfreq(nfft, 1.0 / sr)
    b_lo = int(np.searchsorted(freqs, fmin))
    b_hi = int(np.searchsorted(freqs, fmax))
    win = np.hanning(frame)
    f0s = []
    for start in range(0, len(wav) - frame, hop):
        seg = wav[start:start + frame]
        if np.sqrt(np.mean(seg ** 2)) < 0.02:
            continue
        seg = seg - seg.mean()
        spec = np.abs(np.fft.rfft(seg * win, n=nfft))
        hps = np.log(spec[b_lo:b_hi] + 1e-12).copy()
        for k in range(2, n_harm + 1):
            hps += np.log(spec[b_lo * k:b_hi * k:k][: b_hi - b_lo] + 1e-12)
        f0 = float(freqs[b_lo + int(np.argmax(hps))])
        # voicing gate (the autocorrelation estimator's confidence
        # check, kept through the HPS rewrite): loud UNVOICED frames —
        # fricatives, vocoder hiss — pass the RMS floor but are not
        # periodic; require real periodicity at the HPS-implied lag
        # before the frame may vote
        ac = np.correlate(seg, seg, "full")[frame - 1:]
        if ac[0] <= 0:
            continue
        lag = int(round(sr / f0))
        if lag >= frame:
            continue
        w0, w1 = max(1, lag - 2), min(frame - 1, lag + 3)
        if float(np.max(ac[w0:w1]) / ac[0]) <= 0.3:
            continue
        f0s.append(f0)
    return float(np.median(f0s)) if f0s else float("nan")


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nsg-ms-soak"
    from neural_sound_generation_tpu.ops import dsp

    report = {}
    hits = 0
    for spk in range(7):
        target = 100.0 * (1.155 ** spk)
        wavs = sorted(glob.glob(os.path.join(
            workdir, f"samples_spk{spk}", "*.wav")))
        ests = []
        for w in wavs:
            audio = np.asarray(dsp.load_wav(w, SR))
            ests.append(estimate_f0(audio, SR))
        med = float(np.nanmedian(ests)) if ests else float("nan")
        # credit if the median estimate lands nearer this speaker's
        # fundamental than any OTHER speaker's (nearest-target decode)
        targets = 100.0 * (1.155 ** np.arange(7))
        nearest = int(np.argmin(np.abs(targets - med))) if np.isfinite(med) else -1
        ok = nearest == spk
        hits += int(ok)
        report[spk] = {
            "target_f0": round(target, 1),
            "sample_f0_median": round(med, 1) if np.isfinite(med) else None,
            "n_wavs": len(wavs),
            "nearest_speaker": nearest,
            "match": ok,
        }
    print(json.dumps({"per_speaker": report,
                      "speakers_matched": hits, "of": 7}))


if __name__ == "__main__":
    main()
