package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sixth input-robustness axis: NON-FINITE doubles (NaN/±Inf) in every
  * scalar double column of the star schema ([[NonFiniteFixture]]).
  *
  * What the axis found (r17, red-proofed by the pre-guard sweep quoted in
  * the BUILDLOG): Spark's double→DECIMAL cast returns NULL for NaN/±Inf
  * EVEN UNDER ANSI — so every dec2/dec4/outD money pipeline silently
  * DROPPED poisoned rows and emitted plausible-but-wrong totals, while the
  * DuckDB oracle's same CAST aborts loudly (dev/oracle_probe.py pin group
  * 5). Spark's ceil/floor(double) similarly return BIGINT and absorb NaN
  * with no cast ever running. 26 queries passed the poisoned corpus
  * silently before the guard; every one of them is loud now.
  *
  * The contract this spec pins (set equality + per-name error KIND, the
  * StressSweepSpec method — drift is loud in both directions):
  *   - every query the oracle would abort on (its SQL casts a poisoned
  *     column per row) aborts HERE too: USER_RAISED_EXCEPTION from
  *     [[graft.operators.Q.finite]] at decimal ingresses, CAST_OVERFLOW
  *     from the eventsUs/o_totalprice integer-cents casts.
  *   - every query whose oracle tolerates the row identically (key-only
  *     consumers; rank-only q18 and tier q31-style comparisons, where
  *     NaN>t is TRUE and NaN sorts greatest in BOTH engines — oracle_probe
  *     pin group 6; filter/join exclusion as in q58) stays green, and the
  *     representative non-consumers stay BYTE-IDENTICAL to their organic
  *     outputs (Catalyst prunes the poisoned column — the s_acctbal −Inf
  *     aboard every supplier read has zero consumers by design).
  *
  * Adjudication notes for the green-by-design shapes:
  *   - q18_acctbal_quartiles: rank-only consumption; NaN ordering parity
  *     makes quartiles/percent_rank identical in both engines, no cast.
  *   - q09_set_operations: c_acctbal appears only in `> 5000` (NaN→TRUE,
  *     −Inf→FALSE in both engines) — same membership, counts only.
  *   - q58_local_supplier_volume: its date/region filters and nation-match
  *     join exclude every poisoned lineitem at this fixture — the SAME
  *     exclusion happens in the oracle; if a regen lets one through, the
  *     dec2 guard flips it into `expected` and this set-pin fires.
  */
class NonFiniteInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val dir = NonFiniteFixture.build(spark)

  private val expected: Map[String, String] = NonFiniteExpectations.expected

  private def chain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString(" | ")

  test("non-finite sweep failure set equals the adjudicated expected set") {
    val failures: Map[String, Throwable] = Registry.all.flatMap { q =>
      try { TestSpark.materialize(q.fn(spark, dir)); None }
      catch { case t: Throwable => Some(q.name -> t) }
    }.toMap

    val unexpected = failures.keySet -- expected.keySet
    val missing = expected.keySet -- failures.keySet
    assert(unexpected.isEmpty,
      "NEW non-finite failures — a consumer changed or a guard moved: " +
        unexpected.toSeq.sorted.map(n =>
          s"$n: ${chain(failures(n)).linesIterator.next()}").mkString("; "))
    assert(missing.isEmpty,
      "adjudicated aborts no longer abort — a silent NULL ingress is back " +
        s"(the exact bug this axis found); re-adjudicate consciously: " +
        missing.toSeq.sorted.mkString(", "))
    expected.foreach { case (name, kind) =>
      val msg = chain(failures(name))
      assert(msg.contains(kind),
        s"$name failed with the WRONG kind (want substring '$kind'): " +
          msg.linesIterator.next())
    }
  }

  test("non-consumers are byte-identical to their organic outputs") {
    // Catalyst pruning proof: these read poisoned TABLES (events with
    // non-finite value, lineitem with five poisoned columns, supplier with
    // a −Inf s_acctbal) but consume only keys/strings — the poisoned
    // column must never be evaluated, and the result must equal the
    // organic sf0.001 run row-for-row.
    Seq("q17_user_first_last", "q61_brand_supplier_diversity",
        "q111_sole_failing_supplier").foreach { name =>
      val fn = Registry.queries(name)
      val poisoned = fn(spark, dir).collect().toSeq
      val organic = fn(spark, TestSpark.sf0001).collect().toSeq
      assert(poisoned == organic,
        s"$name output drifted on the non-finite corpus (pruning broken?)")
    }
  }

  test("the guard is an identity on finite values and loud on each special") {
    import spark.implicits._
    val fin = Seq(0.0, -12345.6789, 9.9e13).toDF("x")
      .select(operators.Q.finite(col("x")).as("g"), col("x"))
      .collect()
    assert(fin.forall(r => r.getDouble(0) == r.getDouble(1)))
    Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .foreach { v =>
        val e = intercept[Exception] {
          Seq(v).toDF("x").select(operators.Q.finite(col("x"))).collect()
        }
        assert(chain(e).contains("USER_RAISED_EXCEPTION"),
          s"finite($v) must raise loudly, got: ${chain(e).take(200)}")
      }
  }

  test("streaming: a non-finite value is a LOUD poison pill, not silent corruption") {
    // The streaming cents aggregates (tumblingCounts/sessionAgg) ride the
    // same round(value*100).cast(long) derivation as the batch layer — a
    // NaN record must STOP the stream with the batch layer's kind
    // (CAST_OVERFLOW inside a StreamingQueryException), never be silently
    // dropped from a window's cents. At 100 TB the remedy for a poisoned
    // feed is an upstream filter/quarantine, a conscious choice — not an
    // engine that quietly un-counts rows (the lambda view would then
    // disagree with the batch recomputation forever).
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val events = in.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = graft.streaming.StreamingOps.tumblingCounts(events, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("nf_poison")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-nf-ckpt").toString)
      .outputMode("update").start()
    try {
      val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:10:00Z"))
      in.addData((1L, t0, 7L, "click", 1.50), (2L, t0, 7L, "click", Double.NaN))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(chain(e).contains("CAST_OVERFLOW"),
        s"poisoned stream must abort with the batch kind: ${chain(e).take(300)}")
    } finally q.stop()
  }

  test("WHY the guard exists: Spark's own casts absorb non-finites silently") {
    // Pins the Spark 4.1.2 behaviors the guard compensates for, so an
    // upstream fix (loud ANSI double→decimal cast, say) is NOTICED and the
    // guard simplified rather than silently doubling up — the
    // oracle_probe pin-4 philosophy, engine side.
    import spark.implicits._
    val row = Seq((Double.NaN, Double.PositiveInfinity)).toDF("nan", "inf")
      .select(col("nan").cast("decimal(18,2)").as("d1"),
        col("inf").cast("decimal(18,2)").as("d2"),
        ceil(col("nan")).as("c1"))
      .collect().head
    assert(row.isNullAt(0) && row.isNullAt(1),
      "ANSI double→decimal went loud on non-finites — simplify Q.finite")
    assert(!row.isNullAt(2),
      "ceil(NaN) went loud/null — revisit the q30 ceil/floor guards")
  }
}
