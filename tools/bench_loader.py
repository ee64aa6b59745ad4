"""Input-pipeline throughput: items/s of SampleLoader at 1..N workers.

The GAN step is ~126 ms device time; dataset[i] (image decode + jitter +
MANO forward + near/far) must stay under that per item or the input
pipeline becomes the training bottleneck (ref model.py:74-105 uses
torch DataLoader workers for the same reason). CPU-only — runs anywhere.

Usage: python tools/bench_loader.py [--workers 1 2 4] [--items 64]

NOTE: worker scaling needs cores. On a 1-vCPU dev container extra
workers only add IPC overhead; on a real TPU-VM host (v5e: ~100 vCPUs)
N workers give ~N× until decode saturates.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", nargs="*", type=int, default=[1, 2, 4])
    ap.add_argument("--items", type=int, default=64)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--subdiv", type=int, default=3)
    args = ap.parse_args()

    # CPU platform: the loader is host-side; don't touch the TPU tunnel
    import jax
    jax.config.update("jax_platforms", "cpu")

    from vanerf_tpu.data.synthetic import SyntheticDataset
    from vanerf_tpu.training.loop import SampleLoader

    idxs = list(range(args.items))
    for w in args.workers:
        # fresh dataset per config: items must be COLD (the synthetic
        # dataset memoizes renders per process/worker, which would turn
        # later configs into an IPC-only measurement)
        ds = SyntheticDataset(split="train", H=args.H, W=args.H,
                              subdiv=args.subdiv,
                              n_frames=max(2, args.items // 8))
        loader = SampleLoader(ds, w)
        try:
            # warm the pool processes (forkserver spawn + unpickle) on an
            # index outside the timed set
            next(iter(loader.ordered([len(ds) - 1])))
            t0 = time.time()
            n = sum(1 for it in loader.ordered(idxs) if it is not None)
            dt = time.time() - t0
        finally:
            loader.close()
        print(f"workers={w}: {n / dt:.2f} items/s "
              f"({1e3 * dt / n:.1f} ms/item)")


if __name__ == "__main__":
    main()
