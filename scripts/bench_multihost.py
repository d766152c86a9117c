"""Multi-host scaling-efficiency harness (BASELINE: >=85% at >=2 hosts).

Measures mapping throughput at 1, 2, and N processes with the real
multi-process launcher (scripts/launch_multihost.py -> jax.distributed
+ shard_map over the global mesh) and reports the BASELINE-shape JSON:

  {"metric": "scaling efficiency", "procs": [...],
   "frags_per_s": [...], "efficiency_vs_1": [...], ...}

On this box the processes run on virtual CPU devices, so the absolute
rates are CPU-bound and the efficiency number underestimates a real
pod slice (the per-process compute does not scale down when the 4
physical cores are oversubscribed) — the point is that the launcher,
global-mesh batching, collective merges, and the measurement itself
are real; a hardware run is this command with --devices-per-proc 0 on
pod hosts. Reference bar: BASELINE.json north_star '>=85% scaling
efficiency to 2+ hosts'.

Usage: python scripts/bench_multihost.py [--procs 1,2,4]
       [--devices-per-proc 2] [--frags 100000]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(HERE, "tests", "data")


def run_one(nprocs: int, devices_per_proc: int, idx: str, out: str,
            r1: str, r2: str) -> dict:
    cmd = [sys.executable, os.path.join(HERE, "scripts",
                                        "launch_multihost.py"),
           "--nprocs", str(nprocs),
           "--devices-per-proc", str(devices_per_proc),
           "--port", str(8476 + nprocs), "--",
           "quant", "-i", idx, "-l", "IU", "-1", r1, "-2", r2,
           "-o", out, "--no-version-check"]
    t0 = time.time()
    env = dict(os.environ)
    env["SALMON_NO_VERSION_CHECK"] = "1"
    res = subprocess.run(cmd, capture_output=True, text=True, env=env)
    wall = time.time() - t0
    if res.returncode != 0:
        sys.stderr.write(res.stdout[-2000:] + res.stderr[-2000:])
        raise RuntimeError(f"nprocs={nprocs} failed")
    meta = json.load(open(os.path.join(out, "aux_info",
                                       "meta_info.json")))
    frags = int(meta["num_processed"])
    # mapping wall = total minus (shared) startup: use the in-run
    # processed rate when available, else wall
    return {"wall_s": round(wall, 2), "frags": frags,
            "frags_per_s": round(frags / wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--r1", default=os.path.join(DATA, "reads_1.fastq"))
    ap.add_argument("--r2", default=os.path.join(DATA, "reads_2.fastq"))
    ap.add_argument("--transcripts",
                    default=os.path.join(DATA, "transcripts.fasta"))
    args = ap.parse_args()
    procs = [int(x) for x in args.procs.split(",")]

    tmp = tempfile.mkdtemp(prefix="mh_bench_")
    idx = os.path.join(tmp, "idx")
    env_idx = {**os.environ, "SALMON_NO_VERSION_CHECK": "1",
               "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": HERE}   # drop TPU-plugin site dirs
    subprocess.run([sys.executable, "-m", "salmon_tpu.cli", "index",
                    "-t", args.transcripts, "-i", idx, "-k", "31"],
                   check=True, cwd=HERE, env=env_idx)
    results = []
    for n in procs:
        out = os.path.join(tmp, f"out_{n}")
        r = run_one(n, args.devices_per_proc, idx, out, args.r1,
                    args.r2)
        r["procs"] = n
        results.append(r)
        print(f"# procs={n}: {r['frags_per_s']} frags/s "
              f"({r['wall_s']}s, {r['frags']} frags)", file=sys.stderr,
              flush=True)
    base = results[0]["frags_per_s"]
    report = {
        "metric": "multi-host scaling efficiency",
        "devices_per_proc": args.devices_per_proc,
        "virtual_cpu_mesh": args.devices_per_proc > 0,
        "procs": [r["procs"] for r in results],
        "frags_per_s": [r["frags_per_s"] for r in results],
        "wall_s": [r["wall_s"] for r in results],
        "efficiency_vs_1": [
            round(r["frags_per_s"] / (base * r["procs"]), 3)
            for r in results],
        "note": ("virtual-CPU run: processes share 4 physical cores, "
                 "so efficiency underestimates pod hardware"
                 if args.devices_per_proc else "hardware run"),
    }
    print(json.dumps(report))
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
