#!/usr/bin/env python3
"""Oracle-side DECIMAL semantics probe — pins the DuckDB behaviors the
q112/q117/q129 wide-decimal arithmetic RELIES on, at magnitudes the
organic fixtures never reach (so verify cannot see them drift).

r16 ADVICE (medium) questioned q117's sxy = DECIMAL(9,0) * DECIMAL(38,0):
DuckDB's nominal multiply width rule is w1+w2 = 47 > 38, which the
advisor expected to fall back to DOUBLE (silent exactness loss past 2^53)
or bind-error. Empirically (duckdb 1.0.0, the driver's oracle): the
product binds as DECIMAL(38,0) and is EXACT — same cap Spark applies
(p1+p2+1 clamped to 38). This script asserts that, so a DuckDB version
bump that changes the rule REFUSES the preflight instead of silently
degrading the oracle.

Pinned behaviors (each beyond-organic, each load-bearing):
  1. DECIMAL(9,0) * DECIMAL(38,0) binds as DECIMAL(38,0), exact at >2^63.
  2. The full q117 moment shape (SUM(x9 * y)) is exact at mega-day
     magnitudes (y ~ 2.7e22, far past 2^63).
  3. Product overflow past 38 digits fails LOUD (Out of Range), not as a
     silent DOUBLE fallback — the seam vs Spark's non-ANSI NULL sits at
     >=1e38 products, unreachable in-domain (per-day cents < ~1e24 at
     100 TB x day-index < 1e5 ~ 1e29).
  4. KNOWN HAZARD, documented not relied-on: DuckDB SUM(DECIMAL(38,0))
     accumulates in int128 and WRAPS SILENTLY past ~1.7e38 (no error).
     Spark's sum NULLs/aborts there instead. All corpus-linear DECIMAL
     sums in the engine carry a domain bound far below 1e38 (BUILDLOG
     r17 cast-width audit), so the wraparound region is unreachable;
     this assertion exists so a duckdb upgrade that FIXES it to loud is
     noticed and the comment updated.
  5. Non-finite doubles (NaN/±Inf — the sixth robustness axis,
     NonFiniteInputSpec) fail LOUD at the shared cast points every
     scalar money/value consumer routes through: double→BIGINT (the
     eventsUs cents derivation) and double→DECIMAL(18,s) (dec2/dec4)
     both raise Conversion/InvalidInput errors, mirroring Spark's ANSI
     CAST_INVALID_INPUT. A DuckDB version that started returning
     NULL/0 here would silently un-pair the engine's loud abort — the
     oracle would produce rows for a query the engine refuses.
  6. NaN ORDERING parity, relied on by range predicates evaluated
     BEFORE the loud cast: DuckDB treats NaN as greater than every
     double (NaN > t is TRUE, MAX picks NaN), exactly Spark's
     semantics — so a NaN row reaches (or escapes) the downstream cast
     identically in both engines.

Run: python3 dev/oracle_probe.py   (preflight runs it as step 4/5; exit 0
= all pins hold, exit 1 with the failing pin named otherwise.)
"""
import sys

import duckdb

FAIL = []


def pin(name, cond, detail=""):
    if not cond:
        FAIL.append(f"{name}: {detail}")


con = duckdb.connect()

# -- pin 1: width-47 multiply binds DECIMAL(38,0) and stays exact --------
t = con.execute(
    "DESCRIBE SELECT CAST(1 AS DECIMAL(9,0)) * CAST(1 AS DECIMAL(38,0)) p"
).fetchall()
pin("9x38_binds_decimal38", t[0][1] == "DECIMAL(38,0)", f"bound as {t[0][1]}")

x, y = 99991, 9223372036854775807123  # y > 2^63
r = con.execute(
    f"SELECT CAST({x} AS DECIMAL(9,0)) * CAST({y} AS DECIMAL(38,0))"
).fetchone()[0]
pin("9x38_exact_past_2e63", int(r) == x * y, f"got {r}, want {x*y}")

# -- pin 2: the q117 moment shape at mega-day magnitudes -----------------
ys = [9223372036854775807123, 18446744073709551614246, 27670116110564327421369]
vals = ", ".join(f"({i}, {v}::HUGEINT)" for i, v in enumerate(ys))
r = con.execute(f"""
    WITH daily(x, yraw) AS (VALUES {vals}),
    d AS (SELECT CAST(x AS DECIMAL(9,0)) x9, CAST(yraw AS DECIMAL(38,0)) y
          FROM daily)
    SELECT SUM(x9 * y), SUM(y) FROM d
""").fetchone()
want_sxy = sum(i * v for i, v in enumerate(ys))
pin("q117_sxy_exact_megaday", int(r[0]) == want_sxy, f"got {r[0]}, want {want_sxy}")
pin("q117_sy_exact_megaday", int(r[1]) == sum(ys), f"got {r[1]}, want {sum(ys)}")

# -- pin 3: product overflow past 38 digits is LOUD ----------------------
try:
    con.execute(
        "SELECT CAST(999999999 AS DECIMAL(9,0)) * "
        "CAST(99999999999999999999999999999999999999 AS DECIMAL(38,0))"
    ).fetchone()
    pin("product_overflow_loud", False, "width-38 product overflow returned a row")
except duckdb.OutOfRangeException:
    pass
except Exception as e:  # any loud failure class keeps the pin's promise
    pin("product_overflow_loud", "range" in str(e).lower() or "overflow" in str(e).lower(),
        f"unexpected error class: {type(e).__name__}: {e}")

# -- pin 4: SUM(DECIMAL(38,0)) wraps silently in int128 (known hazard) ---
big = 99999999999999999999999999999999999999  # 38 nines, ~1e38
r = con.execute(f"""
    SELECT SUM(v) FROM (
      SELECT CAST({big} AS DECIMAL(38,0)) v
      UNION ALL SELECT CAST({big} AS DECIMAL(38,0))
    )
""").fetchone()[0]
pin("sum38_wraps_silently_in_int128", int(r) != 2 * big and int(r) < 0,
    f"duckdb changed SUM(DECIMAL(38,0)) overflow behavior: got {r} — "
    "if now loud, update dev/oracle_probe.py pin 4 and the BUILDLOG note")

# -- pin 5: non-finite doubles are LOUD at the shared cast points --------
for label, expr in [
    ("nan_to_bigint_loud", "CAST(ROUND(CAST('NaN' AS DOUBLE) * 100) AS BIGINT)"),
    ("posinf_to_bigint_loud", "CAST(ROUND(CAST('Infinity' AS DOUBLE) * 100) AS BIGINT)"),
    ("neginf_to_bigint_loud", "CAST(ROUND(CAST('-Infinity' AS DOUBLE) * 100) AS BIGINT)"),
    ("nan_to_decimal_loud", "CAST(CAST('NaN' AS DOUBLE) AS DECIMAL(18,2))"),
    ("inf_to_decimal_loud", "CAST(CAST('Infinity' AS DOUBLE) AS DECIMAL(18,4))"),
]:
    try:
        row = con.execute(f"SELECT {expr}").fetchone()
        pin(label, False, f"non-finite cast returned {row} instead of erroring")
    except Exception as e:
        pin(label, "cast" in str(e).lower() or "conver" in str(e).lower(),
            f"unexpected error class: {type(e).__name__}: {e}")

# -- pin 6: NaN orders greater than every double (Spark parity) ----------
r = con.execute("""
    SELECT CAST('NaN' AS DOUBLE) > 1e308,
           MAX(x) FROM (VALUES (1.0), (CAST('NaN' AS DOUBLE))) t(x)
""").fetchone()
pin("nan_gt_everything", r[0] is True, f"NaN > 1e308 returned {r[0]}")
pin("max_picks_nan", r[1] != r[1], f"MAX over {{1.0, NaN}} returned {r[1]}")

# -- pin 7: unicode text-function tier (the seventh axis's exclusions) ---
# The r18 probe session mapped Spark 4.1.2 vs duckdb 1.0.0 over every
# text function the query surface uses; the engines agree on code-point
# semantics EXCEPT these four, which the unicode fixture therefore
# excludes from case/levenshtein/trim-reaching columns
# (UnicodeFixture/UnicodeInputSpec pin the Spark side: FULL case
# mappings, code-point levenshtein, ASCII-only trim). If a duckdb
# upgrade changes tier here, the exclusion list must be re-adjudicated —
# refuse the preflight rather than let the seam drift silently.
DOTTED_I = "İ"          # LATIN CAPITAL LETTER I WITH DOT ABOVE
SHARP_S = "ß"           # LATIN SMALL LETTER SHARP S
CAP_SHARP_S = "ẞ"
FI_LIG = "ﬁ"            # LATIN SMALL LIGATURE FI
ASTRAL3 = "\U0001F389x\U0001D54F"  # 3 code points, 9 UTF-8 bytes
r = con.execute(
    "SELECT lower(?), upper(?), upper(?), levenshtein(?, 'abc'), trim(?)",
    [DOTTED_I, SHARP_S, FI_LIG, ASTRAL3, " x "],
).fetchone()
pin("simple_lower_dotted_i", r[0] == "i",
    f"duckdb lower(U+0130) changed tier: got {r[0]!r} — re-adjudicate the "
    "unicode axis exclusions (UnicodeFixture scaladoc + group-7 header)")
pin("simple_upper_sharp_s", r[1] == CAP_SHARP_S,
    f"duckdb upper(sharp-s) changed tier: got {r[1]!r}")
pin("simple_upper_fi_ligature", r[2] == FI_LIG,
    f"duckdb upper(fi-ligature) changed tier: got {r[2]!r}")
pin("levenshtein_counts_bytes", r[3] == 9,
    f"duckdb levenshtein unit changed: got {r[3]}, byte-count would be 9 "
    "(Spark counts code points = 3; p_type must stay organic while this seam exists)")
pin("trim_strips_unicode_ws", r[4] == "x",
    f"duckdb trim(U+00A0..U+00A0) changed: got {r[4]!r} — edge-whitespace "
    "exclusion in the unicode fixture keys off this")

# -- pin 8: temporal semantics at calendar extremes (the eighth axis) ----
# The r18 probe mapped Spark 4.1.2 vs duckdb 1.0.0 at year 1 / 9999 /
# the epoch edge / the 1582 Julian gap: the engines AGREE value-for-value
# on date_trunc, epoch µs, ts→date, year(), and proleptic-Gregorian
# date_diff (Spark side pinned in TemporalInputSpec). These pins freeze
# the oracle tier; a duckdb upgrade that changes calendar (e.g. starts
# skipping the Julian gap, or shifts pre-epoch flooring) must REFUSE
# preflight — the temporal fixture's oracle compare rides on them.
r = con.execute("""
    SELECT epoch_us(TIMESTAMP '0001-01-01 00:00:00'),
           epoch_us(TIMESTAMP '9999-12-31 23:59:59.999999'),
           epoch_us(TIMESTAMP '1969-12-31 23:59:59.999999'),
           date_diff('day', DATE '1582-10-04', DATE '1582-10-15'),
           CAST(date_trunc('day', TIMESTAMP '1969-12-31 10:11:12') AS DATE),
           date_trunc('hour', TIMESTAMP '0001-01-02 03:04:05.678901'),
           year(TIMESTAMP '9999-12-30 23:59:59.999999')
""").fetchone()
pin("epoch_us_year1", r[0] == -62135596800000000,
    f"duckdb epoch_us(0001-01-01) = {r[0]}, expected -62135596800000000")
pin("epoch_us_9999", r[1] == 253402300799999999,
    f"duckdb epoch_us(9999 end) = {r[1]}")
pin("epoch_us_minus1", r[2] == -1, f"duckdb epoch µs before epoch = {r[2]}")
pin("proleptic_julian_gap", r[3] == 11,
    f"duckdb date_diff over the 1582 Julian gap = {r[3]}, proleptic "
    "Gregorian (= Spark) counts 11 — calendar tier changed, re-adjudicate "
    "the temporal axis")
pin("preepoch_day_floor", str(r[4]) == "1969-12-31",
    f"duckdb date_trunc('day') below the epoch = {r[4]}, must floor to "
    "the calendar day, not truncate toward zero")
pin("trunc_hour_year1", str(r[5]) == "0001-01-02 03:00:00",
    f"duckdb date_trunc('hour') at year 1 = {r[5]}")
pin("year_9999", r[6] == 9999, f"duckdb year() at 9999 = {r[6]}")

if FAIL:
    for f in FAIL:
        print(f"[oracle_probe] FAIL {f}")
    sys.exit(1)
print(f"[oracle_probe] PASS 25 pins (duckdb {duckdb.__version__})")
