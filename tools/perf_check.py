"""Performance regression harness (the .testing perf-monitoring role).

Usage:
    python tools/perf_check.py           # compare against stored reference
    python tools/perf_check.py --update  # record the current number

Runs bench.py, compares gridpoint-steps/s against tools/perf_ref.json,
and fails (exit 1) on a slowdown beyond the tolerance — wire into CI or
run before/after kernel changes.  TPU-tunnel runs jitter ~5-10%, so the
default tolerance is 15%.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.path.join(HERE, "perf_ref.json")
TOL = 0.15


def run_bench() -> dict:
    out = subprocess.run([sys.executable,
                          os.path.join(HERE, "..", "bench.py")],
                         capture_output=True, text=True, timeout=900)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    cur = run_bench()
    if "--update" in argv or not os.path.exists(REF):
        with open(REF, "w") as f:
            json.dump(cur, f, indent=1)
        print(f"recorded reference: {cur['value']:.3e} {cur['unit']}")
        return 0
    with open(REF) as f:
        ref = json.load(f)
    ratio = cur["value"] / ref["value"]
    status = "OK" if ratio >= 1.0 - TOL else "REGRESSION"
    print(f"{status}: {cur['value']:.3e} vs reference "
          f"{ref['value']:.3e} ({100 * (ratio - 1):+.1f}%)")
    return 0 if status == "OK" else 1


if __name__ == "__main__":
    sys.exit(main())
