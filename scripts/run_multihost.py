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
    # Explicit-cluster flags: TPU pods auto-discover the topology, but a
    # local CPU cluster (tests/test_multihost.py — 2 real processes over
    # gloo) passes the coordinator triple and a virtual device count.
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (default: auto-detect)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force the CPU backend with N virtual devices "
                         "per process (multi-process smoke tests)")
    args = ap.parse_args()

    if args.cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{args.cpu_devices}").strip()

    import jax

    if args.cpu_devices:
        # the axon PJRT plugin ignores JAX_PLATFORMS; pin via config
        # before the first backend init
        jax.config.update("jax_platforms", "cpu")

    try:
        if args.coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
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
