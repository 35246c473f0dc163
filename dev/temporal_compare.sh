#!/bin/bash
# End-to-end oracle compare on the TEMPORAL-pathology corpus — the
# driver-faithful half of the eighth input-robustness axis (r18).
#
# TemporalInputSpec pins the abort contract (exactly ONE query: q101's
# designed spine guard — the only data-extent-driven generated dimension
# in the engine, where a 0001..9999 user span would materialize ~87.6M
# hourly rows in BOTH engines) and the engine-side calendar contracts
# (proleptic datediff across the 1582 Julian gap, epoch-µs extremes,
# pre-epoch flooring). This script proves the stronger half: every OTHER
# oracled query's VALUES on year-1/year-9999/epoch-edge/Julian-gap
# timestamps match DuckDB cell-for-cell — i.e. the engines agree on
# date_trunc/year/datediff/epoch arithmetic over every calendar class
# the corpus carries (probed first, dev/oracle_probe.py group 8 holds
# the oracle tier).
#
#   dev/temporal_compare.sh        # ~4 min; PASS = every green matches
#
# Expected: exactly 1 abort (q101_gap_fill, the spine guard), then
# RESULT: PASS (122 oracled + 0 rows-only, 0 failures). A FAIL here
# with the spec still green means the engines' calendar semantics
# diverged on legal extremes — the silent class the axis exists to
# catch.
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

echo "=== [1/4] build the temporal fixture"
TDIR=$(java $OPENS -Xmx8g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.TemporalFixtureMain \
  2>/dev/null | sed -n 's/^TEMPORAL_FIXTURE_DIR=//p')
[ -n "$TDIR" ] || { echo "REFUSE: fixture build printed no dir"; exit 1; }
echo "fixture at $TDIR"

echo "=== [2/4] graft.Verify on the temporal corpus"
OUT=$(mktemp -d /tmp/verify_tmp.XXXXXX)
SPARK_GRAFT_CPUS=8 dev/run.sh graft.Verify "$TDIR" "$OUT" \
  2> "$OUT/verify_err.log" >/dev/null || true
N_ABORT=$(grep -c "\[verify\].*failed" "$OUT/verify_err.log" || true)
echo "$N_ABORT queries aborted (expected: exactly the q101 spine guard)"
[ "$N_ABORT" -eq 1 ] || {
  echo "FAIL: abort count $N_ABORT != the adjudicated 1 — re-adjudicate:"
  grep "\[verify\].*failed" "$OUT/verify_err.log" | sed 's/^/  /'
  exit 1
}
grep "\[verify\].*q101_gap_fill.*failed" "$OUT/verify_err.log" >/dev/null || {
  echo "FAIL: the single abort is not q101_gap_fill:"
  grep "\[verify\].*failed" "$OUT/verify_err.log" | sed 's/^/  /'
  exit 1
}

echo "=== [3/4] flatten table dirs for the oracle's views"
FLAT=$(mktemp -d /tmp/tmp_flat.XXXXXX)
for t in region nation customer supplier part orders lineitem events \
         documents embeddings; do
  f=$(ls "$TDIR/$t.parquet"/part-*.parquet | head -1)
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
# 123 oracled minus the one adjudicated abort = 122; fewer means a green
# query aborted or left no parquet, more means the abort left a spurious
# usable output dir — both are silent-coverage drifts, fail loudly.
N_GREEN=$(echo "$ONLY" | tr ',' '\n' | grep -c . || true)
[ "$N_GREEN" -eq 122 ] || {
  echo "FAIL: green oracled set has $N_GREEN entries, expected 122:"
  echo "$ONLY" | tr ',' '\n' | sed 's/^/  /'
  exit 1
}
python3 dev/verify_local.py "$FLAT" "$OUT" --only "$ONLY" | tail -1
