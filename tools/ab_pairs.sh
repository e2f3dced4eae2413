#!/bin/bash
# Alternating scoped A/B pairs, BOTH orders (bench-ab-order-bias lesson:
# fixed-order pairs bias ~5-10% toward the second runner).
# Usage: ab_pairs.sh <queries> <dirA> <dirB> <npairs> <outfile>
# r21 (the r20 ADVICE): run() executes in a SUBSHELL so the caller's cwd
# never moves (relative dirA/dirB used to run iterations 2+ in the wrong
# directory); OUT resolves to an absolute path up front; a run whose
# bench line is missing appends a loud FAIL marker instead of a silent
# empty line that skews the pooled pairs.
set -u
Q="$1"; A="$2"; B="$3"; N="$4"; OUT="$5"
case "$OUT" in /*) ;; *) OUT="$PWD/$OUT" ;; esac
: > "$OUT"
run() { # dir label
  local line
  line=$( (cd "$1" && SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_BENCH_OUT=/tmp/ab_detail_$2.json \
    sbt -batch "runMain graft.Bench" 2>/dev/null) | grep '"metric"' | tail -1 )
  if [ -n "$line" ]; then echo "$2 $line" >> "$OUT"
  else echo "$2 FAIL no bench line (dir=$1)" >> "$OUT"; fi
}
for i in $(seq 1 "$N"); do
  if [ $((i % 2)) -eq 1 ]; then run "$A" A$i; run "$B" B$i
  else run "$B" B$i; run "$A" A$i; fi
done
echo done >> "$OUT"
