"""Two-cluster-size scaling evidence (north rule): run the identical
flagship extraction at local[N] and local[4N] on the same materialized
corpus, report docs/sec at both and the scaling efficiency
(= throughput ratio / core ratio). Writes BENCH/BASELINE.md.

Each configuration runs in a fresh subprocess (one JVM per measurement)
and takes the best of ``--reps`` runs to suppress sandbox noise.

Usage: python scripts/scale_bench.py [--low 8] [--high 32] [--docs 6000]
       [--reps 3]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus, docs, sf_dir):
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_DOCS=str(docs),
               SPARK_GRAFT_SF_DIR=sf_dir,
               # scale_bench interleaves whole invocations, so 2 in-JVM
               # reps suffice (the full bench's best-of-6 would make the
               # large-corpus scaling runs needlessly long)
               SPARK_GRAFT_EXTRACT_REPS=os.environ.get(
                   "SPARK_GRAFT_EXTRACT_REPS", "2"))
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                          "--extract-only"],
                         env=env, capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--docs", type=int, default=6000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    # interleave the two levels so a quiet window benefits BOTH measurements
    # (the sandbox hypervisor's throughput swings wildly over minutes)
    results = {}
    for rep in range(args.reps):
        for cpus in (args.low, args.high):
            r = run_bench(cpus, args.docs, args.sf_dir)
            print(f"local[{cpus}] rep {rep}: {r['queries']['extract_e2e']}s "
                  f"({r['extract_docs_per_sec']} docs/s)", flush=True)
            prev = results.get(cpus)
            if prev is None or r["queries"]["extract_e2e"] < prev["queries"]["extract_e2e"]:
                results[cpus] = r

    lo, hi = results[args.low], results[args.high]
    core_ratio = args.high / args.low
    eff = (hi["extract_docs_per_sec"] / lo["extract_docs_per_sec"]) / core_ratio

    # append this invocation to the run log; report the MERGED best per
    # level across ALL logged invocations (same docs/levels) so one
    # bad hypervisor window can never clobber earlier quiet-window
    # evidence. BENCH/BASELINE.md is narrative + a marked table block;
    # only the block between the markers is regenerated.
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    log_path = os.path.join(REPO, "BENCH", "scale_runs.jsonl")
    entry = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "docs": args.docs,
             "low_cpus": args.low, "high_cpus": args.high,
             "low": {"wall": lo["queries"]["extract_e2e"],
                     "dps": lo["extract_docs_per_sec"],
                     "spans": lo["extract_spans"]},
             "high": {"wall": hi["queries"]["extract_e2e"],
                      "dps": hi["extract_docs_per_sec"],
                      "spans": hi["extract_spans"]},
             "efficiency": round(eff, 3)}
    with open(log_path, "a") as f:
        f.write(json.dumps(entry) + "\n")

    best_lo, best_hi = dict(entry["low"]), dict(entry["high"])
    n_runs = 0
    with open(log_path) as f:
        for line in f:
            e = json.loads(line)
            if (e.get("docs"), e.get("low_cpus"), e.get("high_cpus")) != \
                    (args.docs, args.low, args.high):
                continue
            n_runs += 1
            if e["low"]["dps"] > best_lo["dps"]:
                best_lo = e["low"]
            if e["high"]["dps"] > best_hi["dps"]:
                best_hi = e["high"]
    merged_eff = (best_hi["dps"] / best_lo["dps"]) / core_ratio

    block = f"""<!-- scale-table:begin -->
| config | wall (s) | docs/sec | spans |
|---|---|---|---|
| local[{args.low}]  | {best_lo['wall']} | {best_lo['dps']:,.0f} | {best_lo['spans']:,} |
| local[{args.high}] | {best_hi['wall']} | {best_hi['dps']:,.0f} | {best_hi['spans']:,} |

**Raw scaling efficiency (throughput ratio / core ratio {core_ratio:.0f}x):
{merged_eff:.2f}.** Best rep per level merged across {n_runs} scale_bench
invocation(s) (BENCH/scale_runs.jsonl; {args.reps} interleaved reps per
level per invocation, fresh JVM per run) against hypervisor variance.
Latest invocation: local[{args.low}] {entry['low']['dps']:,.0f} docs/s,
local[{args.high}] {entry['high']['dps']:,.0f} docs/s, eff {eff:.2f}
({entry['ts']}).
<!-- scale-table:end -->"""

    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    begin, end = "<!-- scale-table:begin -->", "<!-- scale-table:end -->"
    if os.path.exists(md_path):
        text = open(md_path).read()
        if begin in text and end in text:
            pre = text.split(begin)[0]
            post = text.split(end)[1]
            text = pre + block + post
        else:
            text += "\n\n## Scaling runs (generated)\n\n" + block + "\n"
    else:
        text = "# BENCH baseline — scaling evidence\n\n" + block + "\n"
    with open(md_path, "w") as f:
        f.write(text)
    print(block)
    print(json.dumps({"low": lo, "high": hi, "efficiency": round(eff, 3),
                      "merged_efficiency": round(merged_eff, 3)}))


if __name__ == "__main__":
    main()
