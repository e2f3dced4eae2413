#!/bin/bash
# Alternating scoped A/B pairs, BOTH orders (bench-ab-order-bias lesson:
# fixed-order pairs bias ~5-10% toward the second runner).
# Usage: ab_pairs.sh <queries> <dirA> <dirB> <npairs> <outfile>
set -u
Q="$1"; A="$2"; B="$3"; N="$4"; OUT="$5"
: > "$OUT"
run() { # dir label
  cd "$1" && SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_BENCH_OUT=/tmp/ab_detail_$2.json \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1 \
    | sed "s/^/$2 /" >> "$OUT"
}
for i in $(seq 1 "$N"); do
  if [ $((i % 2)) -eq 1 ]; then run "$A" A$i; run "$B" B$i
  else run "$B" B$i; run "$A" A$i; fi
done
echo done >> "$OUT"
