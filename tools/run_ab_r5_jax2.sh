#!/bin/bash
# Round-5 faithful-GAN A/B — extended JAX half.
#
# Replaces run_ab_r5_jax.sh mid-round (stop that one first: ONE TPU
# client at a time).  Two changes: (1) f32 runs for EVERY seed, not just
# 7/13/21 — the bf16-vs-f32 TRAINING probe graduated from n=3 to n=8 on
# the first two pairs' mixed signal (s13 +0.54 dB toward torch, s7
# −0.38), and jax-f32-vs-torch-f32 pairs remove precision from the
# cross-framework frame entirely; (2) shorter init-wait (the torch queue
# will not reach late seeds before wall; don't block an hour on them).
set -u
cd /root/repo
PY=/opt/venv/bin/python
STEPS=${AB_STEPS:-500}

probe_tpu() {
  for i in 1 2 3; do
    if timeout 90 $PY -c "import jax; jax.devices()" 2>/dev/null; then
      return 0
    fi
    echo "# TPU probe attempt $i failed; retrying" >&2
    sleep 10
  done
  return 1
}

wait_init() {  # torch run dir; bounded wait (torch runs ~30 min each)
  for i in $(seq 1 240); do
    if [ -f "$1/metrics.jsonl" ] && [ -f "$1/init_model.ckpt" ]; then
      return 0
    fi
    sleep 10
  done
  return 1
}

run_jax() {  # out  init_ckpt  seed  [dtype]
  local out=$1 init=$2 seed=$3 dtype=${4:-}
  for att in 1 2; do
    probe_tpu || true
    if env ${dtype:+VANERF_COMPUTE_DTYPE=$dtype} timeout 2400 \
        $PY tools/jax_ab_train.py --out "$out" --init_ckpt "$init" \
        --steps "$STEPS" --eval_frames 4 --seed "$seed" \
        > "$out.log" 2>&1; then
      return 0
    fi
    echo "# jax run $out attempt $att failed/timed out; retrying" >&2
  done
  return 1
}

for S in 7 13 21 29 37 43 51 59; do
  T=/tmp/AB_TORCHF_s$S
  wait_init "$T" || { echo "# init for seed $S never appeared"; continue; }
  J=/tmp/AB_JAXF_s$S
  if [ ! -f "$J/eval.json" ]; then
    mkdir -p "$J"
    run_jax "$J" "$T/init_model.ckpt" "$S"
    echo "jax seed $S done"
  fi
  F=/tmp/AB_JAXF32F_s$S
  if [ ! -f "$F/eval.json" ]; then
    mkdir -p "$F"
    run_jax "$F" "$T/init_model.ckpt" "$S" float32
    echo "jax f32 seed $S done"
  fi
done
echo "JAX QUEUE2 DONE"
