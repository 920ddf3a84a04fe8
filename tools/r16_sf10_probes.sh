#!/bin/bash
# Round-16 sf10 probe session (run AFTER the clean benches — these
# contaminate barrier state for hours):
#  1) decade rows for the four families still gated at sf1 only
#     (q118 streaming CMS, q125 BPE, q235 store lifecycle, q83 edit
#     distance post-broadcast-gate)
#  2) the q247 inverse-partition-scaling adjudication, q122-style
#     one-variable probes (r15: p32/8M=140 s then p64/4M=265 s, warm
#     JVM SLOWER — opposite of q95/q93 on the same legs)
# Every step is stamped with the hypervisor steal it ran under — on
# this host steal varies 0-13% minute to minute (SCALING.md round 16)
# and is the first thing to read before interpreting any timing.
run() {
  local label="$1"; shift
  local s0=$(awk '/^cpu /{print $9}' /proc/stat) t0=$(date +%s)
  "$@"
  local rc=$? s1=$(awk '/^cpu /{print $9}' /proc/stat) t1=$(date +%s)
  python3 -c "print(f'[steal] $label: {($s1-$s0)*10/32/($t1-$t0+1)/10:.2f}% over {$t1-$t0}s rc=$rc')"
}
cd /root/repo
R=tools/run_main.sh
run families env SPARK_GRAFT_SMOKE_LEGS="32:8388608,64:4194304" \
  $R graft.ScaleSmoke /tmp/graft_sf10 bench/SCALE_SMOKE_r16_sf10.json \
  q118_stream_count_min,q125_bpe_merges,q235_store_lifecycle,q83_edit_distance
# A: same legs REVERSED — if p64 is slow only when second, the order
#    (JVM/GC/page-cache state), not the partition count, is causal
run dbscan_a env SPARK_GRAFT_SMOKE_LEGS="64:4194304,32:8388608" \
  $R graft.ScaleSmoke /tmp/graft_sf10 bench/SCALE_SMOKE_r16_sf10_dbscan_a.json \
  q247_dbscan_density
# B: split size FIXED at 8M, partitions 32 vs 64 — isolates partitions
run dbscan_b env SPARK_GRAFT_SMOKE_LEGS="32:8388608,64:8388608" \
  $R graft.ScaleSmoke /tmp/graft_sf10 bench/SCALE_SMOKE_r16_sf10_dbscan_b.json \
  q247_dbscan_density
# C: p64/4M TWICE in one JVM — repeatability of the slow leg
run dbscan_c env SPARK_GRAFT_SMOKE_LEGS="64:4194304,64:4194304" \
  $R graft.ScaleSmoke /tmp/graft_sf10 bench/SCALE_SMOKE_r16_sf10_dbscan_c.json \
  q247_dbscan_density
