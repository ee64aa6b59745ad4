#!/bin/bash
# Round-5 faithful-GAN A/B — TORCH half (CPU-bound), session-scoped steps.
#
# The 1-core host cannot fit 8x1500-step torch runs in a round alongside
# the full test suite (1500 steps ~ 43 min/run measured at 1.73 s/step).
# AB_STEPS=500 keeps the matched-pair design (both frameworks run the
# SAME steps from the SAME converted init under the corrected softplus
# GAN protocol) at ~15 min/run so n=8 pairs complete in-round.
set -u
cd /root/repo
PY=/opt/venv/bin/python
STEPS=${AB_STEPS:-500}

for S in 7 13 21 29 37 43 51 59; do
  T=/tmp/AB_TORCHF_s$S
  if [ ! -f "$T/eval.json" ]; then
    $PY tools/torch_ab_train.py --out "$T" --steps "$STEPS" \
      --eval_frames 4 --seed "$S" > "$T.log" 2>&1
    echo "torch seed $S done rc=$?"
  fi
done
echo "TORCH QUEUE DONE"
