#!/usr/bin/env bash
# Process-isolated scale battery (VERDICT r7 #5).
#
# The round-7 battery ran 30+ queries through one shared JVM and the tail
# measured accumulated heap/code-cache state instead of the algorithms
# (q80: 11x in-battery vs 2.1x isolated). sbt's `runMain` forks a fresh
# JVM per invocation, so driving each probe family — and each query of
# the iterative dup family, the measured contamination victim — as its
# own invocation gives every measurement a cold JVM. Corpora are
# materialized once up front (`gen`) and reused read-only by every
# subsequent run; timings land in one log for SCALE_X100_r{N}.md.
#
# Usage: tools/scale_battery.sh [outfile]   (default /tmp/scale_battery.log)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/scale_battery.log}"
: > "$OUT"

run() {
  echo "=== ScaleProbe $* (fresh JVM) ===" >> "$OUT"
  # forked run output passes through RAW since the round-11
  # outputStrategy fix (no "[info] " prefix) — accept both forms so the
  # script works regardless of the sbt logger configuration
  sbt -batch "runMain graft.ScaleProbe $*" 2>&1 \
    | grep -E '^(\[info\] )?\[(scale|skew)' | sed 's/^\[info\] //' >> "$OUT"
}

sbt -batch compile > /dev/null 2>&1 || { echo "compile failed"; exit 1; }
run gen                      # corpora only, untimed
run linear                   # linear family, one JVM
for q in q65_dup_clusters q80_dedup_survivors \
         q100_incremental_pairs q101_incremental_dedup \
         q121_substring_spans q129_prefix_join \
         q131_sorted_neighborhood q135_containment_join \
         q138_winnow_pairs q146_edit_join; do
  run "dup:$q"               # iterative family: one JVM PER QUERY
done
run inc
run asof
run skew
run graph
run dhash
run semdedup
run media
run r11
run r12
run r13
echo "battery complete -> $OUT"
cat "$OUT"
