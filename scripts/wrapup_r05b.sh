#!/bin/bash
# Round-5 wrap-up-b artifact regeneration: retrain the full pipeline at
# published scale (reduced to 32 samples for the session's wall budget —
# the r5 checkpoints were wiped with /tmp on the VM recycle), then run the
# sanity/cross/sampler/oracle decomposition study (VERDICT r4 weak #2).
# Each stage's PID lands in /tmp/r05b_stage.pid so the driver session can
# gracefully SIGTERM (trainers early-stop between epochs) if time runs out.
set -u
cd /root/repo
W=/tmp/r05b
DATA=$W/data; S1=$W/stage1; S2=$W/stage2; DD=$W/diff
mkdir -p $DATA $S1 $S2 $DD

run() {  # run "$@" recording the child pid; propagate nonzero exit
  echo "[r05b] START: $*" >&2
  "$@" &
  echo $! > /tmp/r05b_stage.pid
  wait $!
  rc=$?
  echo "[r05b] DONE rc=$rc: $1 $2" >&2
  return 0  # SIGTERM early-stop is a valid outcome; keep chaining
}

if [ ! -f $DATA/statistics.json ]; then
  python -u -c "
import sys; sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
from train_demo_full_scale import make_dataset
make_dataset('$DATA', n=${R05B_SAMPLES:-32})
print('[r05b] dataset done', flush=True)
"
fi

touch /tmp/r05b_s1.start
run python -u -m diffusion_model_project_tpu.training.train_vae_stage1 \
  --dataset-dir $DATA --save-dir $S1 --latent-channels 8 --batch-size 1 \
  --learning-rate 2e-4 --grad-accum 2 --num-epochs ${R05B_EP_S1:-60} \
  --ckpt-freq 5
touch /tmp/r05b_s1.done

run python -u -m diffusion_model_project_tpu.training.train_vae_stage2 \
  --dataset-dir $DATA --stage1-checkpoint $S1 --save-dir $S2 \
  --latent-channels 8 --batch-size 1 --learning-rate 1e-4 --grad-accum 2 \
  --lambda-align 5 --lambda-cross 50 --num-epochs ${R05B_EP_S2:-25} \
  --ckpt-freq 5
touch /tmp/r05b_s2.done

run python -u train.py --root-dir $DATA --save-dir $DD \
  --in-channels 17 --out-channels 8 --features 64 128 256 512 1024 \
  --attention 3..2 --batch-size 2 --learning-rate 1e-3 \
  --scheduler-flag true --scheduler-gamma 0.9975 \
  --num-epochs ${R05B_EP_DIFF:-300} --cache-latents true --augment true \
  --ckpt-freq 50 --vae-encoder-path $S2 --vae-decoder-path $S1 \
  --shuffle true
touch /tmp/r05b_diff.done

RUN=$(ls -td $DD/*/ | head -1)
echo "[r05b] diffusion run dir: $RUN" >&2
run python -u scripts/sampler_study.py \
  --diffusion-model-path "$RUN" \
  --vae-encoder-path $S2 --vae-decoder-path $S1 --dataset-dir $DATA \
  --configs sanity,cross,ddim:50,dpm:10 \
  --out /root/repo/SAMPLER_STUDY_r05.json \
  --what "round-5 wrap-up-b decomposition study (VERDICT r4 weak #2): fresh 32-sample published-scale pipeline retrained this session (the r5 96-sample checkpoints were wiped with /tmp). sanity=E3D->D3D decode floor, cross=E2D->D3D conditioning floor, oracle=task ceiling; read sampler rows against these."
touch /tmp/r05b_study.done
echo "[r05b] ALL DONE" >&2
