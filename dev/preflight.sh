#!/bin/bash
# Round-end snapshot preflight — the r14 lesson as one runnable command.
#
# Round 14's red-suite escape happened because the "suite green at the
# exact HEAD to be tagged" checklist item lived only in prose: a new
# spec was committed inside the snapshot commit without a final run.
# This script IS that checklist. Run it at the exact tree you intend to
# snapshot; it refuses (exit 1) unless everything below passes:
#
#   1. the working tree is clean (a dirty tree means the thing you are
#      about to verify is not the thing you are about to commit),
#   2. full `sbt test` is green at this HEAD, fully logged,
#   3. graft.Verify + the driver-faithful oracle compare PASS at
#      sf0.01 AND sf0.001,
#   4. dev/oracle_probe.py holds (DuckDB wide-decimal semantics the
#      q112/q117/q129 oracles rely on, at beyond-organic magnitudes),
#   5. the leak-shape grep over src/dev/build.sbt/project is clean.
#
# Bench and the 9-mode parity matrix are deliberately NOT here: bench
# needs host-noise adjudication (a human judgment per BUILDLOG's
# protocol) and parity costs ~20 min — run both per round, but they
# gate the round, not every snapshot commit.
#
#   dev/preflight.sh            # full gate (~12 min)
#
# RULE (r17, the d3e166e lesson): a run whose tree was edited while the
# suite was executing is TAINTED — discard its PASS/FAIL entirely and
# re-run at the final HEAD. The clean-tree check at step 1 only proves
# cleanliness at START; only you know whether you kept your hands off
# the tree until the summary line printed.
#
# On success, prints the suite summary line to quote in BUILDLOG.
set -u
# Guarded cd (r15 ADVICE): under set -u without set -e an unchecked cd
# failure would run every later step — clean-tree check, suite, leak
# grep — against the CALLER's directory and could PASS the wrong tree.
cd "$(dirname "$0")/.." || { echo "REFUSE: cannot cd to repo root"; exit 1; }
log=/tmp/preflight_$(date +%s)
mkdir -p "$log"
fail=0

echo "=== [1/5] working tree clean?"
if [ -n "$(git status --porcelain)" ]; then
  git status --short
  echo "REFUSE: dirty tree — commit or stash first, then re-run at the exact HEAD."
  exit 1
fi
echo "clean at $(git rev-parse --short HEAD)"

echo "=== [2/5] full sbt test (logged to $log/sbt_test.log)"
if sbt test > "$log/sbt_test.log" 2>&1; then
  grep -E "Tests: succeeded|All tests passed" "$log/sbt_test.log" | tail -2
else
  tail -20 "$log/sbt_test.log"
  # Short-circuit (r15 ADVICE): a red suite already decides the verdict;
  # running both multi-minute verify passes first only delays the REFUSE
  # signal this gate exists to give quickly. Fix the suite, re-run the
  # whole gate — the later steps get their turn at the green tree.
  echo "REFUSE: sbt test is red."
  echo "PREFLIGHT: REFUSED (suite red — verify skipped; see $log/)"
  exit 1
fi

echo "=== [3/5] driver-faithful verify at sf0.01 and sf0.001"
for sf in sf0.01 sf0.001; do
  out="$log/verify_$sf"
  if dev/run.sh graft.Verify "/root/testdata/$sf" "$out" > "$log/verify_$sf.run.log" 2>&1 \
     && python3 dev/verify_local.py "/root/testdata/$sf" "$out" > "$log/verify_$sf.check.log" 2>&1; then
    tail -1 "$log/verify_$sf.check.log"
  else
    tail -5 "$log/verify_$sf.check.log" 2>/dev/null || tail -5 "$log/verify_$sf.run.log"
    echo "REFUSE: verify failed at $sf."
    fail=1
  fi
done

echo "=== [4/5] oracle-side DECIMAL semantics probe"
# Pins the DuckDB wide-decimal behaviors q112/q117/q129 rely on at
# beyond-organic magnitudes (r16 ADVICE medium): a duckdb version change
# that alters the multiply-width rule must REFUSE here, not silently
# degrade the oracle's exactness where sf-verify can't see it.
if python3 dev/oracle_probe.py; then
  :
else
  echo "REFUSE: oracle probe failed — DuckDB decimal semantics drifted."
  fail=1
fi

echo "=== [5/5] leak-shape grep"
# Each literal is written with a [c] character class so the pattern
# line cannot match itself when this script scans dev/ (first run of
# this gate REFUSED on exactly that self-match).
hits=$(grep -rEin "s[3]://|g[s]://|hdfs://[a-z]|slack[.]com|slack[ ]channel|anthro[p]ic|api[_-]ke[y]|secret[_-]ke[y]" \
  src/ dev/ build.sbt project/ 2>/dev/null | grep -v "sbt.internal" || true)
if [ -n "$hits" ]; then
  echo "$hits"
  echo "REFUSE: leak-shaped strings found."
  fail=1
else
  echo "clean"
fi

if [ "$fail" -ne 0 ]; then
  echo "PREFLIGHT: REFUSED (see $log/)"
  exit 1
fi
echo "PREFLIGHT: PASS at $(git rev-parse --short HEAD) — quote the suite line above in BUILDLOG."
