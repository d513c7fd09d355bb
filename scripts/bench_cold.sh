#!/bin/bash
# Cold-path bench artifact (round-9 verdict ask #6): the min-of-2 bench
# measures the WARM serving path (BoundedMemo-amortized training); this
# produces the machine-readable cold complement — ONE fresh-JVM pass
# (iters=1, no min-of-N) over the families whose cost memoization hides:
# the ANN/quantization certificates and the spectral/transform rows.
# Usage: scripts/bench_cold.sh <round-tag, e.g. r10>
# Output: bench_full_cold_<tag>.json (copy to bench_cold_<tag>.json for
# the round close).
set -euo pipefail
TAG="${1:?round tag, e.g. r10}"
cd "$(dirname "$0")/.."
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_ITERS=1 \
SPARK_GRAFT_BENCH_TAG="cold_${TAG}" \
SPARK_GRAFT_BENCH_ONLY=q214,q215,q216,q217,q218,q219,q220,q221,q222,q223,q224,q225,q226,q227,q228,q229,q233,q234,q235,q238,q239,q240,q241,q242,q243,q244,q245,q249,q250,q251,q252 \
sbt -batch "runMain graft.Bench"
cp "bench_full_cold_${TAG}.json" "bench_cold_${TAG}.json"
echo "wrote bench_cold_${TAG}.json"
