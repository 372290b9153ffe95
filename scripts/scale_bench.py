"""Two-cluster-size scaling evidence (north rule): run the identical
flagship extraction at several parallelism levels (default local[8] and
local[32]; add --levels 8,16,32 for a 3-point curve) on the same
materialized corpus, report docs/sec at each level and the scaling
efficiency between the endpoints (= throughput ratio / core ratio).
Writes the marked table block in BENCH/BASELINE.md.

Each configuration runs in a fresh subprocess (one JVM per measurement)
and takes the best of ``--reps`` runs to suppress sandbox noise. Results
append to BENCH/scale_runs.jsonl; the table reports the MERGED best per
level across all logged invocations at the same corpus size, so one bad
hypervisor window can never clobber earlier quiet-window evidence — the
latest-invocation line underneath is the regression signal. Entries with
``"seeded": true`` are hand-transcribed session records (not produced by
this script) and are counted separately in the provenance line.

Usage: python scripts/scale_bench.py [--levels 8,32] [--docs 6000]
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
               # reps suffice (the full bench's best-of-N would make the
               # large-corpus scaling runs needlessly long)
               SPARK_GRAFT_EXTRACT_REPS=os.environ.get(
                   "SPARK_GRAFT_EXTRACT_REPS", "2"))
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                          "--extract-only"],
                         env=env, capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _entry_levels(e):
    """Normalize a jsonl entry (new levels-dict or legacy low/high) to
    {cpus:int -> {wall, dps, spans}}."""
    if "levels" in e:
        return {int(k): v for k, v in e["levels"].items()}
    return {int(e["low_cpus"]): e["low"], int(e["high_cpus"]): e["high"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32",
                    help="comma-separated core counts, ascending")
    ap.add_argument("--docs", type=int, default=6000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    levels = sorted(int(x) for x in args.levels.split(","))

    # interleave the levels so a quiet window benefits ALL measurements
    # (the sandbox hypervisor's throughput swings wildly over minutes)
    results = {}
    for rep in range(args.reps):
        for cpus in levels:
            r = run_bench(cpus, args.docs, args.sf_dir)
            print(f"local[{cpus}] rep {rep}: {r['queries']['extract_e2e']}s "
                  f"({r['extract_docs_per_sec']} docs/s)", flush=True)
            prev = results.get(cpus)
            if prev is None or (r["queries"]["extract_e2e"]
                                < prev["queries"]["extract_e2e"]):
                results[cpus] = r

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    log_path = os.path.join(REPO, "BENCH", "scale_runs.jsonl")
    this_levels = {
        str(c): {"wall": results[c]["queries"]["extract_e2e"],
                 "dps": results[c]["extract_docs_per_sec"],
                 "spans": results[c]["extract_spans"]}
        for c in levels}
    lo_c, hi_c = levels[0], levels[-1]
    eff = ((this_levels[str(hi_c)]["dps"] / this_levels[str(lo_c)]["dps"])
           / (hi_c / lo_c))
    entry = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "docs": args.docs,
             "levels": this_levels, "efficiency": round(eff, 3)}
    with open(log_path, "a") as f:
        f.write(json.dumps(entry) + "\n")

    # merge bests per level across every logged invocation at this corpus
    # size (any level set), tracking hand-seeded records separately
    best = {}          # cpus -> {wall, dps, spans, seeded}
    best_measured = {}  # same, excluding hand-seeded records
    n_runs = n_seeded = 0
    with open(log_path) as f:
        for line in f:
            e = json.loads(line)
            if e.get("docs") != args.docs:
                continue
            seeded = bool(e.get("seeded"))
            if seeded:
                n_seeded += 1
            else:
                n_runs += 1
            for cpus, v in _entry_levels(e).items():
                if cpus not in best or v["dps"] > best[cpus]["dps"]:
                    best[cpus] = dict(v, seeded=seeded)
                if not seeded and (cpus not in best_measured
                                   or v["dps"] > best_measured[cpus]["dps"]):
                    best_measured[cpus] = v

    curve = sorted(best.items())
    lo_c, lo_v = curve[0]
    hi_c, hi_v = curve[-1]
    merged_eff = (hi_v["dps"] / lo_v["dps"]) / (hi_c / lo_c)

    # measured-only efficiency (ADVICE r5): the headline must not silently
    # rest on a hand-transcribed record — report the script-produced curve
    # alongside and star any seeded-sourced row in the table
    m_curve = sorted(best_measured.items())
    measured_eff = None
    if len(m_curve) >= 2:
        (mlo_c, mlo_v), (mhi_c, mhi_v) = m_curve[0], m_curve[-1]
        measured_eff = (mhi_v["dps"] / mlo_v["dps"]) / (mhi_c / mlo_c)

    rows = "\n".join(
        f"| local[{c}] | {v['wall']} | {v['dps']:,.0f}"
        f"{'*' if v.get('seeded') else ''} | {v['spans']:,} |"
        for c, v in curve)
    seed_note = (f" plus {n_seeded} hand-transcribed session record(s) "
                 f"(marked `\"seeded\": true` in the jsonl; "
                 f"`*` rows above are seeded-sourced)") if n_seeded else ""
    measured_note = ""
    if measured_eff is not None and any(v.get("seeded") for _, v in curve):
        measured_note = (f"\nMeasured-only merged efficiency (seeded rows "
                         f"excluded): **{measured_eff:.2f}** "
                         f"(local[{m_curve[0][0]}] "
                         f"{m_curve[0][1]['dps']:,.0f} -> "
                         f"local[{m_curve[-1][0]}] "
                         f"{m_curve[-1][1]['dps']:,.0f} docs/s).")
    latest = ", ".join(f"local[{c}] {v['dps']:,.0f} docs/s"
                       for c, v in sorted((int(k), v)
                                          for k, v in this_levels.items()))
    block = f"""<!-- scale-table:begin -->
| config | wall (s) | docs/sec | spans |
|---|---|---|---|
{rows}

**Raw scaling efficiency local[{lo_c}] -> local[{hi_c}] (throughput ratio
/ core ratio {hi_c / lo_c:.0f}x): {merged_eff:.2f}.** Best rep per level
merged across {n_runs} scale_bench invocation(s)
(BENCH/scale_runs.jsonl; interleaved reps per level per invocation,
fresh JVM per run) against hypervisor variance{seed_note}.{measured_note}
Latest invocation (the regression signal): {latest},
eff {eff:.2f} ({entry['ts']}).
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
    print(json.dumps({"levels": this_levels, "efficiency": round(eff, 3),
                      "merged_efficiency": round(merged_eff, 3)}))


if __name__ == "__main__":
    main()
