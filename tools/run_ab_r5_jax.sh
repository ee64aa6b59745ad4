#!/bin/bash
# Round-5 faithful-GAN A/B — JAX half (TPU tunnel), session-scoped steps.
#
# Waits for each torch run's init checkpoint (written before its training
# loop starts, so pairs overlap: JAX seed N trains on the TPU while torch
# seed N trains on the CPU), then trains the SAME steps from the converted
# init.  Seeds 7/13/21 additionally re-train under f32 (paired bf16-vs-f32
# TRAINING probe, VERDICT r4 Weak #2).  Tunnel-wedge guard per
# NOTES_ROUND5: probe jax.devices() from a fresh process, retry once.
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

wait_init() {  # torch run dir
  for i in $(seq 1 360); do
    # metrics.jsonl is created strictly after init_model.ckpt is flushed
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
  J=/tmp/AB_JAXF_s$S
  if [ ! -f "$J/eval.json" ]; then
    wait_init "$T" || { echo "# init for seed $S never appeared"; continue; }
    mkdir -p "$J"
    run_jax "$J" "$T/init_model.ckpt" "$S"
    echo "jax seed $S done"
  fi
  if [ "$S" = 7 ] || [ "$S" = 13 ] || [ "$S" = 21 ]; then
    F=/tmp/AB_JAXF32F_s$S
    if [ ! -f "$F/eval.json" ]; then
      mkdir -p "$F"
      run_jax "$F" "$T/init_model.ckpt" "$S" float32
      echo "jax f32 seed $S done"
    fi
  fi
done
echo "JAX QUEUE DONE"
