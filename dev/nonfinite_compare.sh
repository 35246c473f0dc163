#!/bin/bash
# End-to-end oracle compare on the NON-FINITE poisoned corpus — the
# driver-faithful upgrade of NonFiniteInputSpec's probe-level parity
# adjudication (r17 session 2).
#
# NonFiniteInputSpec pins WHICH queries abort (set equality + kinds) and
# that three representative non-consumers stay byte-identical to organic.
# This script proves the stronger half for everything green: every
# GREEN ORACLED query's output on the poisoned corpus matches DuckDB
# cell-for-cell — including the NaN-ordering-dependent shapes (q18's
# quartiles rank the NaN balances first in BOTH engines, q09's NaN>5000
# membership) that the spec can only reach via oracle_probe pin group 6.
#
#   dev/nonfinite_compare.sh        # ~4 min; PASS = every green matches
#
# Method: build the fixture (test-classes on the classpath — the builder
# is committed in src/test), run graft.Verify on it (the 41 adjudicated
# aborts print "[verify] ... failed" and leave no usable output), flatten
# the spark-written table dirs to single files for verify_local's views,
# then compare ONLY the green oracled set. An aborted query can leave an
# EMPTY output dir (task-level failure after mkdir) — those are excluded
# by requiring at least one parquet part, not just a dir.
#
# Expected: RESULT: PASS with 83 oracled (the 93 greens minus the
# rows-only sketch set). A FAIL here with the spec still green means a
# green query's VALUES diverged from the oracle on non-finite input —
# exactly the silent class the axis exists to catch.
set -euo pipefail
cd "$(dirname "$0")/.."

CLASSES=target/scala-2.13/classes
TESTCLASSES=target/scala-2.13/test-classes
[ -d "$TESTCLASSES/graft" ] || { echo "REFUSE: run 'sbt Test/compile' first"; exit 1; }
CP="$CLASSES:$TESTCLASSES:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

echo "=== [1/4] build the non-finite fixture"
NFDIR=$(java $OPENS -Xmx8g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.NonFiniteFixtureMain \
  2>/dev/null | sed -n 's/^NONFINITE_FIXTURE_DIR=//p')
[ -n "$NFDIR" ] || { echo "REFUSE: fixture build printed no dir"; exit 1; }
echo "fixture at $NFDIR"

echo "=== [2/4] graft.Verify on the poisoned corpus"
OUT=$(mktemp -d /tmp/verify_nf.XXXXXX)
SPARK_GRAFT_CPUS=8 dev/run.sh graft.Verify "$NFDIR" "$OUT" \
  2> "$OUT/verify_err.log" >/dev/null || true
N_ABORT=$(grep -c "\[verify\].*failed" "$OUT/verify_err.log" || true)
echo "$N_ABORT queries aborted (expected: the spec's 41)"
# ASSERT, don't just echo (r17 ADVICE): a regression that flips a green
# query to abort — or an abort that starts leaving a partially-committed
# output dir — would silently shrink/grow the compared set while the
# final compare still printed PASS on reduced coverage.
[ "$N_ABORT" -eq 41 ] || {
  echo "FAIL: abort count $N_ABORT != the adjudicated 41 — re-adjudicate"
  grep "\[verify\].*failed" "$OUT/verify_err.log" | sed 's/^/  /'
  exit 1
}

echo "=== [3/4] flatten table dirs for the oracle's views"
FLAT=$(mktemp -d /tmp/nf_flat.XXXXXX)
for t in region nation customer supplier part orders lineitem events \
         documents embeddings; do
  f=$(ls "$NFDIR/$t.parquet"/part-*.parquet | head -1)
  ln -s "$f" "$FLAT/$t.parquet"
done

echo "=== [4/4] compare every green oracled query against DuckDB"
ONLY=$(python3 - "$OUT" <<'EOF'
import json, os, glob, sys
out = sys.argv[1]
oracle = json.load(open(f"{out}/oracle_sql.json"))
green = [d for d in os.listdir(out)
         if os.path.isdir(f"{out}/{d}") and glob.glob(f"{out}/{d}/*.parquet")]
print(",".join(sorted(set(green) & set(oracle))))
EOF
)
# The green-oracled set must be exactly the adjudicated 83 (93 greens
# minus the 10 rows-only sketch queries that have no oracle SQL): fewer
# means a green query aborted or left no parquet (coverage silently
# shrank); more means an adjudicated abort left a spurious usable output.
N_GREEN=$(echo "$ONLY" | tr ',' '\n' | grep -c . || true)
[ "$N_GREEN" -eq 83 ] || {
  echo "FAIL: green oracled set has $N_GREEN entries, expected 83:"
  echo "$ONLY" | tr ',' '\n' | sed 's/^/  /'
  exit 1
}
python3 dev/verify_local.py "$FLAT" "$OUT" --only "$ONLY" | tail -1
