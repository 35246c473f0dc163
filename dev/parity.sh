#!/bin/bash
# Execution-mode parity matrix: run graft.Verify under each physical-
# execution mode and assert all 134 output tables are byte-identical to
# the default-mode run (dev/compare_outputs.py, cell-for-cell).
#
#   dev/parity.sh [sfDir]          # default /root/testdata/sf0.01
#
# Modes (conf injected via -Dspark.* system properties, which
# SparkSession.builder absorbs through SparkConf; landing verified by
# conf probe, BUILDLOG round 13):
#   interpreted : whole-stage codegen off + expression factory NO_CODEGEN
#                 (the "janino compile failed on an executor" fallback)
#   nojoinopt   : AQE off + auto-broadcast off (explicit broadcast()
#                 hints still apply; unhinted joins go sort-merge)
#   rowreader   : non-vectorized Parquet reader + SortAggregate instead
#                 of ObjectHashAggregate
#   displacedtz : JVM default zone UTC+14 (Pacific/Kiritimati) — the
#                 session zone stays pinned UTC; catches any code path
#                 leaning on the host default (round-13 BUILDLOG: this
#                 axis found a latent StreamingSpec fixture bug)
#   trlocale    : Turkish default locale + ISO-8859-9 default charset —
#                 the dotless-I / comma-decimal / non-UTF8 hazard trio
#                 for any toUpperCase/format/getBytes without an
#                 explicit Locale.ROOT / StandardCharsets.UTF_8
#   kryo        : Kryo serializer (the common cluster config; routes
#                 broadcast state — MinHash vocab, IVF centroids —
#                 through Kryo instead of Java serialization)
#   ansioff     : spark.sql.ansi.enabled=false (no declared result may
#                 depend on ANSI vs legacy arithmetic/cast semantics)
#   offheap     : Tungsten off-heap execution memory + off-heap parquet
#                 column vectors (the memory-tuned cluster config; moves
#                 sort/agg/join buffers and scan batches off the JVM heap)
#   nopushdown  : spark.sql.parquet.filterPushdown=false — every filter
#                 evaluated post-scan by Spark instead of inside the
#                 parquet reader (results may never depend on pushdown;
#                 note PushedFilters: in EXPLAIN still lists the
#                 TRANSLATED filters — the conf gates reader use, not the
#                 plan display, so parity is the only end-to-end proof)
# Flag landing for every mode is probe-verified: `sbt "Test/runMain
# graft.ConfProbe"` with/without the mode's flags in JAVA_TOOL_OPTIONS
# (same -Dspark.* route; BUILDLOG round 13).
# Thread/partition-count independence (SPARK_GRAFT_CPUS=7/16/32) is a
# separate env-var axis: run this script under each count if needed.
# PARITY_MODES="offheap nopushdown" runs a subset (default: all).
# Requires a prior `sbt compile`. Exit 0 iff every mode is identical.
set -e
SF=${1:-/root/testdata/sf0.01}
BASE=/tmp/parity_base
run() { # run <outDir> [extra -D flags...]
  local out=$1; shift
  rm -rf "$out"
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_GRAFT_JAVA_OPTS="$*" \
    "$(dirname "$0")"/run.sh graft.Verify "$SF" "$out" >"$out.log" 2>&1
}
run "$BASE"
rc=0
declare -A MODES=(
  [interpreted]="-Dspark.sql.codegen.wholeStage=false -Dspark.sql.codegen.factoryMode=NO_CODEGEN"
  [nojoinopt]="-Dspark.sql.adaptive.enabled=false -Dspark.sql.autoBroadcastJoinThreshold=-1"
  [rowreader]="-Dspark.sql.parquet.enableVectorizedReader=false -Dspark.sql.execution.useObjectHashAggregateExec=false"
  [displacedtz]="-Duser.timezone=Pacific/Kiritimati"
  [trlocale]="-Duser.language=tr -Duser.country=TR -Dfile.encoding=ISO-8859-9"
  [kryo]="-Dspark.serializer=org.apache.spark.serializer.KryoSerializer"
  [ansioff]="-Dspark.sql.ansi.enabled=false"
  [offheap]="-Dspark.memory.offHeap.enabled=true -Dspark.memory.offHeap.size=2g -Dspark.sql.columnVector.offheap.enabled=true"
  [nopushdown]="-Dspark.sql.parquet.filterPushdown=false"
)
for mode in ${PARITY_MODES:-interpreted nojoinopt rowreader displacedtz trlocale kryo ansioff offheap nopushdown}; do
  echo "=== mode: $mode (${MODES[$mode]})"
  run "/tmp/parity_$mode" ${MODES[$mode]}
  # NOT `if cmd | tail -1`: a pipeline's status is the LAST command's, so
  # that form tests tail (always 0) and the DIFFERS branch is unreachable —
  # a diff would print its count yet still exit 0 (caught round 13).
  if cmp_out=$(python3 "$(dirname "$0")"/compare_outputs.py "$BASE" "/tmp/parity_$mode"); then
    echo "$cmp_out" | tail -1
    echo "=== $mode: IDENTICAL"
  else
    echo "$cmp_out" | tail -1
    echo "$cmp_out" | grep '^DIFF' | head -20
    echo "=== $mode: DIFFERS (see above)"; rc=1
  fi
done
exit $rc
