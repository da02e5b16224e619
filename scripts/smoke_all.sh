#!/usr/bin/env bash
# Release-candidate smoke: every CLI surface in sequence on a fresh
# synthetic corpus (~2 min on CPU). Usage: scripts/smoke_all.sh [workdir]
set -euo pipefail
WORK=${1:-$(mktemp -d /tmp/nsg-smoke-XXXX)}
# absolutize BEFORE the cd: a relative workdir must not silently resolve
# under the repo root
mkdir -p "$WORK"; WORK=$(cd "$WORK" && pwd)
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
PY() { python -c "import jax; jax.config.update('jax_platforms','cpu')
$1"; }

echo "== corpus -> $WORK"
PY "
import numpy as np, os
from neural_sound_generation_tpu.ops import dsp
sr = 22050
os.makedirs('$WORK/in/wavs', exist_ok=True)
lines = []
for i in range(10):
    t = np.arange(int(sr*(0.5+0.1*i)))/sr
    wav = sum(0.3/k*np.sin(2*np.pi*(200+30*i)*k*t) for k in (1,2,3)).astype(np.float32)
    dsp.save_wav(wav, f'$WORK/in/wavs/LJ-{i:04d}.wav', sr)
    lines.append(f'LJ-{i:04d}|r{i}|text {i}')
open('$WORK/in/metadata.csv','w').write('\n'.join(lines))
"
echo "== 1/7 preprocess"
PY "
from neural_sound_generation_tpu.cli.preprocess import main
main(['ljspeech','$WORK/in','$WORK/out','--skip-errors'])" | tail -1
echo "== 2/7 train (multi-step scan)"
PY "
from neural_sound_generation_tpu.cli.main import main
main(['--model','vqvae','--dataset','ljspeech','--datadir','$WORK/out',
      '--sampledir','$WORK/results','--ckpt-dir','$WORK/models',
      '--batch-size','2','--epochs','1','--dim','8','--z-dim','16',
      '--multi-steps','2','--max-batches-per-epoch','4'])" | grep Average
echo "== 3/7 evaluate"
PY "
from neural_sound_generation_tpu.cli.evaluate import main
main(['--model','vqvae','--dataset','ljspeech','--datadir','$WORK/out',
      '--ckpt-dir','$WORK/models/vqvae/checkpoint_ljspeech_8_16',
      '--batch-size','2','--dim','8','--z-dim','16'])" | tail -1
echo "== 4/7 invert"
PY "
from neural_sound_generation_tpu.cli.invert import main
main(['$WORK/out','22050','1024','256','80','--output','$WORK/inv.wav'])" | tail -1
echo "== 5/7 prior train + sample"
PY "
from neural_sound_generation_tpu.cli.prior import main
main(['train','--datadir','$WORK/out',
      '--vqvae-ckpt','$WORK/models/vqvae/checkpoint_ljspeech_8_16',
      '--ckpt-dir','$WORK/prior','--dim','8','--z-dim','16','--prior-dim','8',
      '--prior-layers','2','--batch-size','2','--epochs','1',
      '--max-batches-per-epoch','2'])" | tail -1
PY "
from neural_sound_generation_tpu.cli.prior import main
main(['sample','--vqvae-ckpt','$WORK/models/vqvae/checkpoint_ljspeech_8_16',
      '--prior-ckpt','$WORK/prior','--output-dir','$WORK/prior_samples',
      '--dim','8','--z-dim','16','--prior-dim','8','--prior-layers','2',
      '--code-shape','20','7','--num-samples','1'])" | tail -1
echo "== 6/7 vocoder train + synthesize"
PY "
from neural_sound_generation_tpu.cli.vocoder import main
main(['train','--datadir','$WORK/out','--ckpt-dir','$WORK/wn',
      '--batch-size','2','--epochs','1','--layers','4','--stacks','2',
      '--residual-channels','16','--max-batches-per-epoch','2'])" | tail -1
PY "
from neural_sound_generation_tpu.cli.vocoder import main
main(['synthesize','--ckpt-dir','$WORK/wn',
      '--mel-npy','$WORK/out/ljspeech-mel-00001.npy',
      '--output','$WORK/synth.wav','--layers','4','--stacks','2',
      '--residual-channels','16','--max-frames','4'])" | tail -1
echo "== 7/7 motion capture + analyze + generate"
PY "
from neural_sound_generation_tpu.cli.motion import main
main(['capture','$WORK/hand.csv','--frames','64'])
main(['analyze','$WORK/hand.csv'])
main(['generate','$WORK/hand.csv','$WORK/motion.wav','--dim','8',
      '--z-dim','16','--max-windows','2'])" | tail -1

echo "== artifacts:"
ls "$WORK"/inv.wav "$WORK"/synth.wav "$WORK"/motion.wav "$WORK"/prior_samples/*.wav
echo "== stages 1-7 ok (hier + serving still to run)"

echo "== 8/8 hierarchical chain (hiervqvae + per-level priors + sample)"
PY "
from neural_sound_generation_tpu.cli.main import main
main(['--model','hiervqvae','--dataset','ljspeech','--datadir','$WORK/out',
      '--sampledir','$WORK/results_h','--ckpt-dir','$WORK/models_h',
      '--batch-size','2','--epochs','1','--dim','8','--z-dim','16',
      '--max-batches-per-epoch','2'])" | grep Average
for LEVEL in top bottom; do
PY "
from neural_sound_generation_tpu.cli.prior import main
main(['train','--hier','--hier-level','$LEVEL','--datadir','$WORK/out',
      '--vqvae-ckpt','$WORK/models_h/hiervqvae/checkpoint_ljspeech_8_16',
      '--ckpt-dir','$WORK/prior_$LEVEL','--dim','8','--z-dim','16',
      '--prior-dim','8','--prior-layers','2','--batch-size','2',
      '--epochs','1','--max-batches-per-epoch','1'])" | tail -1
done
PY "
from neural_sound_generation_tpu.cli.prior import main
main(['sample','--hier',
      '--vqvae-ckpt','$WORK/models_h/hiervqvae/checkpoint_ljspeech_8_16',
      '--prior-ckpt','$WORK/prior_top','--bottom-ckpt','$WORK/prior_bottom',
      '--output-dir','$WORK/hier_samples','--dim','8','--z-dim','16',
      '--prior-dim','8','--prior-layers','2','--code-shape','10','2',
      '--num-samples','1'])" | tail -1
echo "== 9/9 HTTP serving (reconstruct + /sample over a live server)"
PY "
import io, json, threading, urllib.request
import numpy as np
from http.server import ThreadingHTTPServer
from scipy.io import wavfile
from neural_sound_generation_tpu.cli.serve import (
    build_service, make_handler, parse_args,
)
args = parse_args([
    '--ckpt-dir', '$WORK/models/vqvae/checkpoint_ljspeech_8_16',
    '--dim', '8', '--z-dim', '16', '--frames', '28',
    '--prior-ckpt', '$WORK/prior', '--prior-dim', '8', '--prior-layers', '2',
])
service = build_service(args)
httpd = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(service))
threading.Thread(target=httpd.serve_forever, daemon=True).start()
base = f'http://127.0.0.1:{httpd.server_address[1]}'
t = np.arange(int(22050 * 0.3)) / 22050
buf = io.BytesIO()
wavfile.write(buf, 22050, (0.4 * np.sin(2*np.pi*220*t) * 32767).astype(np.int16))
def post(path, data, ctype):
    req = urllib.request.Request(base + path, data=data,
                                 headers={'Content-Type': ctype})
    return urllib.request.urlopen(req, timeout=120).read()
rec = post('/reconstruct', buf.getvalue(), 'audio/wav')
smp = post('/sample', json.dumps({'n': 1, 'label': 0}).encode(),
           'application/json')
for name, blob in (('reconstruct', rec), ('sample', smp)):
    sr, wav = wavfile.read(io.BytesIO(blob))
    assert sr == 22050 and len(wav) > 500, name
httpd.shutdown()
print('serve round-trip ok (reconstruct + sample)')" | tail -1
echo "== 10/11 multi-speaker chain (cmu_arctic preset: conditioned vqvae -> prior -> per-speaker sample)"
MS_PRESET=neural_sound_generation_tpu/config/presets/multispeaker_cmu_arctic_mixture.json
PY "
import numpy as np, os
from neural_sound_generation_tpu.ops import dsp
sr = 16000
for sid, spk in enumerate(['awb','bdl','clb','jmk','ksp','rms','slt']):
    d = f'$WORK/ms_in/cmu_us_{spk}_arctic/wav'
    os.makedirs(d, exist_ok=True)
    for i in range(2):
        t = np.arange(int(sr*0.6))/sr
        w = (0.5*np.sin(2*np.pi*(120+25*sid)*t)).astype(np.float32)
        dsp.save_wav(w, f'{d}/arctic_a{i:04d}.wav', sr)
"
PY "
from neural_sound_generation_tpu.cli.preprocess import main
main(['cmu_arctic','$WORK/ms_in','$WORK/ms_out','--preset','$MS_PRESET'])" | tail -1
PY "
from neural_sound_generation_tpu.cli.main import main
main(['--model','vqvae','--dataset','cmu_arctic','--datadir','$WORK/ms_out',
      '--sampledir','$WORK/ms_results','--ckpt-dir','$WORK/ms_models',
      '--preset','$MS_PRESET','--batch-size','2','--epochs','1',
      '--dim','8','--z-dim','16','--max-batches-per-epoch','2'])" | grep Average
PY "
from neural_sound_generation_tpu.cli.prior import main
main(['train','--datadir','$WORK/ms_out',
      '--vqvae-ckpt','$WORK/ms_models/vqvae/checkpoint_cmu_arctic_8_16',
      '--ckpt-dir','$WORK/ms_prior','--preset','$MS_PRESET',
      '--dim','8','--z-dim','16','--prior-dim','8','--prior-layers','2',
      '--n-classes','7','--batch-size','2','--epochs','1',
      '--max-batches-per-epoch','2'])" | tail -1
PY "
from neural_sound_generation_tpu.cli.prior import main
main(['sample','--vqvae-ckpt','$WORK/ms_models/vqvae/checkpoint_cmu_arctic_8_16',
      '--prior-ckpt','$WORK/ms_prior','--output-dir','$WORK/ms_samples',
      '--preset','$MS_PRESET','--dim','8','--z-dim','16',
      '--prior-dim','8','--prior-layers','2','--n-classes','7',
      '--code-shape','20','5','--num-samples','1','--label','3'])" | tail -1

echo "== 11/11 pipeline-parallel prior train (--mesh-pipe 2 on 2 virtual devices)"
XLA_FLAGS="--xla_force_host_platform_device_count=2 ${XLA_FLAGS:-}" PY "
from neural_sound_generation_tpu.cli.prior import main
main(['train','--datadir','$WORK/out',
      '--vqvae-ckpt','$WORK/models/vqvae/checkpoint_ljspeech_8_16',
      '--ckpt-dir','$WORK/pp_prior','--dim','8','--z-dim','16',
      '--arch','transformer','--prior-dim','16','--prior-layers','2',
      '--batch-size','2','--epochs','1','--max-batches-per-epoch','2',
      '--mesh-pipe','2'])" | tail -1
echo "SMOKE OK (incl. hier + serve + multispeaker + pp)"
