#!/bin/bash
# End-to-end oracle compare on the UNICODE-pathology corpus — the
# driver-faithful half of the seventh input-robustness axis (r18).
#
# UnicodeInputSpec pins that ZERO queries abort on this corpus (unlike
# every prior axis — pathological text is LEGAL input end-to-end) and
# pins the engine-side text contracts. This script proves the stronger
# half: every ORACLED query's VALUES on astral/ZWJ/bidi/NUL/NFC-vs-NFD/
# CJK/RTL text match DuckDB cell-for-cell — i.e. the two engines agree
# on length/substring/split/regex/case/hash/sort semantics over every
# code-point class the corpus carries. The four adjudicated engine
# ASYMMETRIES (full-vs-simple case mapping, code-point-vs-byte
# levenshtein, ASCII-vs-unicode trim) are excluded from the corpus BY
# DESIGN and pinned instead: Spark side in UnicodeInputSpec, oracle
# side in dev/oracle_probe.py group 7.
#
#   dev/unicode_compare.sh        # ~4 min; PASS = every query matches
#
# Expected: 0 aborts, then RESULT: PASS (123 oracled + 11 rows-only,
# 0 failures). A FAIL here with the spec still green means the engines'
# text-function semantics diverged on a legal corpus — exactly the
# silent class the axis exists to catch (the casing/levenshtein/trim
# splits were found by probing for this script's failure modes).
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

echo "=== [1/4] build the unicode fixture"
UDIR=$(java $OPENS -Xmx8g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.UnicodeFixtureMain \
  2>/dev/null | sed -n 's/^UNICODE_FIXTURE_DIR=//p')
[ -n "$UDIR" ] || { echo "REFUSE: fixture build printed no dir"; exit 1; }
echo "fixture at $UDIR"

echo "=== [2/4] graft.Verify on the unicode corpus"
OUT=$(mktemp -d /tmp/verify_uni.XXXXXX)
SPARK_GRAFT_CPUS=8 dev/run.sh graft.Verify "$UDIR" "$OUT" \
  2> "$OUT/verify_err.log" >/dev/null || true
N_ABORT=$(grep -c "\[verify\].*failed" "$OUT/verify_err.log" || true)
# ZERO aborts expected: pathological text is legal input everywhere.
[ "$N_ABORT" -eq 0 ] || {
  echo "FAIL: $N_ABORT queries aborted on legal unicode input:"
  grep "\[verify\].*failed" "$OUT/verify_err.log" | sed 's/^/  /'
  exit 1
}
echo "0 queries aborted (as designed: legal input end-to-end)"

echo "=== [3/4] flatten table dirs for the oracle's views"
FLAT=$(mktemp -d /tmp/uni_flat.XXXXXX)
for t in region nation customer supplier part orders lineitem events \
         documents embeddings; do
  f=$(ls "$UDIR/$t.parquet"/part-*.parquet | head -1)
  ln -s "$f" "$FLAT/$t.parquet"
done

echo "=== [4/4] compare every oracled query against DuckDB"
# Coverage tripwire (r18 ADVICE #1): verify_local.py FAILs on a missing
# ORACLED output dir, but a rows-only (non-oracled) query that aborts
# leaves no output dir and would silently vanish from the "11 rows-only"
# coverage — and a spurious extra dir would silently widen it. Assert the
# exact output-dir census (123 oracled + 11 rows-only) before comparing,
# the same N_GREEN discipline temporal_compare.sh applies to its 122.
COUNTS=$(python3 - "$OUT" <<'EOF'
import json, os, glob, sys
out = sys.argv[1]
oracle = json.load(open(f"{out}/oracle_sql.json"))
green = [d for d in os.listdir(out)
         if os.path.isdir(f"{out}/{d}") and glob.glob(f"{out}/{d}/*.parquet")]
print(len(set(green) & set(oracle)), len(set(green) - set(oracle)))
EOF
)
N_ORACLED=${COUNTS% *}
N_ROWS_ONLY=${COUNTS#* }
{ [ "$N_ORACLED" -eq 123 ] && [ "$N_ROWS_ONLY" -eq 11 ]; } || {
  echo "FAIL: output-dir census drifted: $N_ORACLED oracled + $N_ROWS_ONLY rows-only (expected 123 + 11)"
  exit 1
}
echo "output-dir census: $N_ORACLED oracled + $N_ROWS_ONLY rows-only (as designed)"
python3 dev/verify_local.py "$FLAT" "$OUT" | tail -1
