#!/usr/bin/env python3
"""Fixed-window quant throughput harness (the salmon_tpu analog of the
reference's tests/benchmarks/quant_window.py): run `salmon-tpu quant`
for at most --seconds, parse the progress log's
"processed N fragments" lines, and report fragments/s as JSON.

Usage:
  python scripts/quant_window.py --index IDX -1 R1 -2 R2 \
      --seconds 120 --out-dir /tmp/qw [-- extra quant flags...]
"""

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

PROCESSED_RE = re.compile(r"processed\s+([0-9,]+)\s+fragments",
                          re.IGNORECASE)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--salmon", default=None,
                    help="command (default: python -m salmon_tpu)")
    ap.add_argument("--index", required=True)
    ap.add_argument("-1", dest="mates1", required=True)
    ap.add_argument("-2", dest="mates2", required=True)
    ap.add_argument("--seconds", type=int, default=120)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--out-dir", default="qw_out")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("extra", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    out_dir = Path(args.out_dir)
    out_dir.parent.mkdir(parents=True, exist_ok=True)
    base = ([args.salmon] if args.salmon
            else [sys.executable, "-m", "salmon_tpu"])
    extra = args.extra[1:] if args.extra[:1] == ["--"] else args.extra
    cmd = base + [
        "quant", "-lA", "-i", args.index, "-1", args.mates1,
        "-2", args.mates2, "--threads", str(args.threads),
        "-o", str(out_dir)] + extra

    started = time.monotonic()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    captured = ""
    timed_out = False
    try:
        out, _ = proc.communicate(timeout=args.seconds)
        captured = out or ""
    except subprocess.TimeoutExpired:
        timed_out = True
        proc.terminate()
        try:
            out, _ = proc.communicate(timeout=15)
            captured = out or ""
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            captured = out or ""
    elapsed = time.monotonic() - started

    matches = PROCESSED_RE.findall(captured)
    processed = int(matches[-1].replace(",", "")) if matches else 0
    result = {
        "command": cmd,
        "timed_out": timed_out,
        "elapsed_seconds": elapsed,
        "processed_fragments": processed,
        "fragments_per_second": processed / elapsed if elapsed else 0.0,
        "exit_code": proc.returncode,
    }
    text = json.dumps(result, indent=2)
    print(text)
    if args.json_out:
        Path(args.json_out).write_text(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
