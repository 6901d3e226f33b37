"""Multi-host entry point: run the same program on every TPU pod worker.

The reference's only cluster artifact is a single-node SLURM script
(src_cpp/FACPP.sbatch). The TPU equivalent is SPMD: the SAME python runs on
every host of the pod slice; `jax.distributed.initialize()` discovers the
topology from the TPU runtime, and the (data, model, seq) mesh spans all
chips. Launch with scripts/launch_pod.sh (gcloud --worker=all) or any
runner that starts one process per host.

Modes:
  train  — one dp/tp/sp training step of the flagship LM over the full mesh
           (the multi-chip path the driver dry-runs on a virtual mesh).
  bench  — the single-chip headline bench, once per host (sanity/per-chip).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["train", "bench"], nargs="?",
                    default="train")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax

    try:
        jax.distributed.initialize()  # no-op-ish on single host
    except Exception as e:  # noqa: BLE001 — single-host fallback
        print(f"jax.distributed.initialize skipped: {e}", file=sys.stderr)

    n = jax.device_count()
    print(f"process {jax.process_index()}/{jax.process_count()} — "
          f"{jax.local_device_count()} local / {n} global devices",
          flush=True)

    if args.mode == "bench":
        import bench
        bench.main()
        return

    # train: reuse the dry-run's real dp/tp/sp step over the actual mesh.
    import __graft_entry__ as entry

    for _ in range(args.steps):
        entry.dryrun_multichip(n)
    print("multihost train steps OK", flush=True)


if __name__ == "__main__":
    main()
