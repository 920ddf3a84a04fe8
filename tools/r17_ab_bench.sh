#!/bin/bash
# Round-17 pinned-binary A/B (r16 verdict task 1): is the 3.97 -> 4.91 s
# clean-headline drift since round 14 host state or a code regression?
# Protocol: build the r14 tree (b31dd91^) in .worktrees/r14ab, then run
# r14-binary and HEAD-binary back-to-back, TWICE in alternating order
# (r14,HEAD then HEAD,r14), each pair started only after a steal-gated
# window (5-s loaded steal sample < 2%, the SCALING.md round-16 recipe).
# Every run gets SPARK_GRAFT_BENCH_ATTEMPTS=1 (a single measurement —
# the A/B wants four comparable points, not four retry loops) and its
# own whole-run steal sample stamped from /proc/stat so the r14 binary
# (which predates the steal fields) is adjudicable too.
set -u
cd /root/repo
R=tools/run_main.sh
R14CP=/root/repo/.worktrees/r14ab/target/scala-2.13/classes
CORES=$(nproc)

steal_sample() { awk '/^cpu /{print $9}' /proc/stat; }

# loaded-steal gate: spin all cores for 5 s, measure steal, retry until
# < 2% (bounded 20 x 30 s)
steal_gate() {
  for i in $(seq 1 20); do
    local pids=""
    for c in $(seq 1 "$CORES"); do
      (while :; do :; done) & pids="$pids $!"
    done
    local s0 t0 s1 t1
    s0=$(steal_sample); t0=$(date +%s%N)
    sleep 5
    s1=$(steal_sample); t1=$(date +%s%N)
    kill $pids 2>/dev/null; wait $pids 2>/dev/null
    local pct
    pct=$(python3 -c "print(f'{($s1-$s0)/($CORES*(($t1-$t0)/1e9)):.2f}')")
    echo "[gate] loaded steal ${pct}% (try $i)"
    if python3 -c "exit(0 if $pct < 2.0 else 1)"; then return 0; fi
    sleep 30
  done
  echo "[gate] WARN: no clean window inside budget; proceeding flagged"
  return 1
}

run_bench() { # label classes outfile
  local label=$1 cp=$2 out=$3
  local s0 t0 s1 t1
  s0=$(steal_sample); t0=$(date +%s)
  GRAFT_CLASSES="$cp" SPARK_GRAFT_BENCH_ATTEMPTS=1 \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT="$out" \
    $R graft.Bench >"bench/ab_${label}.stdout" 2>"bench/ab_${label}.log"
  local rc=$?
  s1=$(steal_sample); t1=$(date +%s)
  python3 -c "print(f'[ab] $label rc=$rc wall={$t1-$t0}s steal_run={($s1-$s0)/($CORES*($t1-$t0)):.2f}%')"
}

mkdir -p bench
echo "== pair 1: r14 then HEAD =="
steal_gate
run_bench p1_r14 "$R14CP" bench/AB_r17_p1_r14.json
run_bench p1_head /root/repo/target/scala-2.13/classes bench/AB_r17_p1_head.json
echo "== pair 2: HEAD then r14 =="
steal_gate
run_bench p2_head /root/repo/target/scala-2.13/classes bench/AB_r17_p2_head.json
run_bench p2_r14 "$R14CP" bench/AB_r17_p2_r14.json
echo "== done =="
