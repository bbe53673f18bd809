#!/usr/bin/env bash
# Reproducible bench protocol — the recorded procedure behind the
# BENCH_NOTES section of BASELINE.md. Run from the repo root.
#
# What it does, in order:
#   1. refuses to run on a loaded box (1-min loadavg must be < 2.0) —
#      machine contention is the #1 cause of phantom "regressions";
#   2. runs the full catalog N times (default 3) at sf0.1 local[32];
#      inside each run, Bench itself takes the per-query min over 3
#      INTERLEAVED full-catalog passes (SPARK_GRAFT_BENCH_PASSES —
#      round-5 semantics; the old SPARK_GRAFT_BENCH_TRIALS name still
#      works but counts passes now, not back-to-back trials);
#   3. runs the catalog once more EXCLUDING q_dedup_components — the
#      iterative operator that persists state during construction — to
#      measure cross-query contamination (should be ~zero: Bench
#      sweeps persisted RDDs after every trial);
#   4. prints a per-query min/median/max variance table over the runs.
#
# Read the results as: best-of-runs total vs the 21.24 s anchor
# (BASELINE.md); per-query spread > ~2x across back-to-back runs on a
# quiet box means JVM/GC noise, not plan cost.
set -euo pipefail
cd "$(dirname "$0")/.."

RUNS="${RUNS:-3}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="${OUT:-/tmp/bench_protocol}"
mkdir -p "$OUT"

LOAD=$(cut -d' ' -f1 /proc/loadavg)
if python3 -c "import sys; sys.exit(0 if float('$LOAD') < 2.0 else 1)"; then
  echo "loadavg $LOAD — box quiet, proceeding"
else
  echo "loadavg $LOAD >= 2.0 — box is loaded; results would be noise. Aborting." >&2
  exit 1
fi

for i in $(seq 1 "$RUNS"); do
  echo "=== full catalog, run $i/$RUNS ==="
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
    | sed 's/^\[info\] //' > "$OUT/full_$i.json"
  tail -c 120 "$OUT/full_$i.json"; echo
done

echo "=== excluding q_dedup_components (contamination A/B) ==="
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_EXCLUDE=q_dedup_components \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
  | sed 's/^\[info\] //' > "$OUT/no_components.json"

python3 - "$OUT" "$RUNS" <<'EOF'
import json, sys, statistics
out, runs = sys.argv[1], int(sys.argv[2])
full = [json.load(open(f"{out}/full_{i}.json")) for i in range(1, runs + 1)]
noc = json.load(open(f"{out}/no_components.json"))
names = sorted(full[0]["queries"])
print(f"\n{'query':26s} {'min':>7s} {'med':>7s} {'max':>7s}  spread")
for n in names:
    ts = [f["queries"][n] for f in full]
    lo, md, hi = min(ts), statistics.median(ts), max(ts)
    flag = "  <-- noisy" if hi > 2 * lo and hi - lo > 0.5 else ""
    print(f"{n:26s} {lo:7.3f} {md:7.3f} {hi:7.3f}  {hi/lo:5.2f}x{flag}")
totals = [f["value"] for f in full]
print(f"\nfull totals: {', '.join(f'{t:.2f}' for t in totals)}  (best {min(totals):.2f} s)")
comp = [f["queries"].get("q_dedup_components", 0) for f in full]
sum_noc_subset = [f["value"] - c for f, c in zip(full, comp)]
print(f"without components: measured {noc['value']:.2f} s vs subset-of-full best {min(sum_noc_subset):.2f} s")
print("  (agreement within noise = no cross-query contamination from the iterative operator)")
EOF
