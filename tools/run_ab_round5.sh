#!/bin/bash
# Round-5 A/B queue (VERDICT r4 item 1 + Weak #2), FAITHFUL-GAN edition.
#
# tools/audit_dynamics.py found the round-3/4 torch replica trained its
# discriminator with a -log BCE objective while the reference (and the
# JAX framework) use softplus on the sigmoid-headed outputs
# (networks.py:584-601) — ~4x stronger GAN gradients on the torch side
# of every earlier A/B pair.  The replica is now faithful, so ALL pairs
# are re-run under the corrected protocol:
#   * 8 matched-init pairs (seeds 7/13/21/29/37/43/51/59)
#   * 3 f32-TRAINING runs from the same matched inits (bf16-vs-f32
#     training at n=3, same-init paired design)
# Torch runs are CPU-bound (~35-50 min each on the 1-core host); JAX
# runs ride the TPU tunnel (~4 min each) and are guarded against the
# known tunnel-wedge hazard (NOTES_ROUND5) by a probe + retry.
set -u
cd /root/repo

probe_tpu() {
  for i in 1 2 3; do
    if timeout 90 python -c "import jax; jax.devices()" 2>/dev/null; then
      return 0
    fi
    echo "# TPU probe attempt $i failed; retrying" >&2
    sleep 10
  done
  return 1
}

run_jax() {  # out  init_ckpt  seed  [dtype]
  local out=$1 init=$2 seed=$3 dtype=${4:-}
  for att in 1 2; do
    probe_tpu || true
    if env ${dtype:+VANERF_COMPUTE_DTYPE=$dtype} timeout 2400 \
        python tools/jax_ab_train.py --out "$out" --init_ckpt "$init" \
        --steps 1500 --eval_frames 4 --seed "$seed" \
        > "$out.log" 2>&1; then
      return 0
    fi
    echo "# jax run $out attempt $att failed/timed out; retrying" >&2
  done
  return 1
}

for S in 7 13 21 29 37 43 51 59; do
  T=/tmp/AB_TORCHF_s$S
  if [ ! -f "$T/eval.json" ]; then
    python tools/torch_ab_train.py --out "$T" --steps 1500 \
      --eval_frames 4 --seed "$S" > "$T.log" 2>&1
  fi
  J=/tmp/AB_JAXF_s$S
  if [ ! -f "$J/eval.json" ]; then
    mkdir -p "$J"
    run_jax "$J" "$T/init_model.ckpt" "$S"
  fi
done

for S in 7 13 21; do
  J=/tmp/AB_JAXF32F_s$S
  if [ ! -f "$J/eval.json" ]; then
    mkdir -p "$J"
    run_jax "$J" "/tmp/AB_TORCHF_s$S/init_model.ckpt" "$S" float32
  fi
done

echo "AB QUEUE DONE"
