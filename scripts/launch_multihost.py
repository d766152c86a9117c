"""Multi-host launcher for salmon_tpu quant.

Spawns N processes on this machine (each simulating one host with
`--devices-per-proc` virtual CPU devices, or attaching to its TPU slice
when run on real pod hosts) and runs the identical CLI command in each.
Process 0 writes the output directory.

Example (2 "hosts" x 4 virtual devices, CPU):
  python scripts/launch_multihost.py --nprocs 2 --devices-per-proc 4 -- \
      quant -i idx -l IU -1 r1.fq -2 r2.fq -o out

On a real multi-host TPU slice, instead run on every host:
  SALMON_TPU_COORDINATOR=host0:8476 SALMON_TPU_NUM_PROCS=N \
  SALMON_TPU_PROC_ID=<rank> python -m salmon_tpu <args...>
(omit --devices-per-proc; the local TPU chips are used.)
"""

import argparse
import os
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=0,
                    help="virtual CPU devices per process (0 = real)")
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("cli", nargs=argparse.REMAINDER,
                    help="salmon_tpu CLI args after --")
    args = ap.parse_args()
    cli = args.cli
    if cli and cli[0] == "--":
        cli = cli[1:]

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    t0 = time.time()
    for pid in range(args.nprocs):
        env = dict(os.environ)
        env["SALMON_TPU_COORDINATOR"] = f"127.0.0.1:{args.port}"
        env["SALMON_TPU_NUM_PROCS"] = str(args.nprocs)
        env["SALMON_TPU_PROC_ID"] = str(pid)
        if args.devices_per_proc:
            # virtual-CPU hosts: drop any TPU-plugin site dirs from
            # PYTHONPATH (a registered TPU plugin overrides
            # JAX_PLATFORMS=cpu and N processes would fight over one
            # chip)
            keep = [p for p in env.get("PYTHONPATH", "").split(
                os.pathsep) if p and "axon" not in p]
            env["PYTHONPATH"] = os.pathsep.join([here] + keep)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count="
                  f"{args.devices_per_proc}")
        else:
            env["PYTHONPATH"] = (here + os.pathsep
                                 + env.get("PYTHONPATH", ""))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "salmon_tpu"] + cli, env=env))
    rc = 0
    for p in procs:
        rc |= p.wait()
    print(f"multihost run: {args.nprocs} procs, wall "
          f"{time.time() - t0:.1f}s, rc={rc}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
