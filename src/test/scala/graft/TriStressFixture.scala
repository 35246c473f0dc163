package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The THREE-WAY corpus: skew × boundary ([[StressFixture]]) × non-finite
  * ([[NonFiniteFixture]]'s classes) — r17 session 2's queued composition.
  *
  * What the third dimension adds on top of the combined stress corpus:
  * the non-finite GUARDS now fire inside pathological shapes — a NaN
  * price rides the 10⁵-row mega-order through the skewed shuffle, a NaN
  * value rides the mega-user's majority partition — so the sweep proves
  * the abort KINDS are stable under duplicate-key distributions, not just
  * on organically-keyed rows.
  *
  * Composition rules:
  *   - lineitem poisons key on `l_orderkey*7 + l_linenumber` (not bare
  *     l_orderkey as the single axis does): the mega-order holds ONE
  *     orderkey (0), and a bare-key class would flip ALL 10⁵ mega rows
  *     non-finite, destroying the boundary-detonation property (q129's
  *     class-A revenue past Long.Max needs its 9.9e13 rows intact). The
  *     mixed key scatters a ~1/97 fraction of mega AND organic rows into
  *     each non-finite class, leaving the mod-17 boundary lattice
  *     dominant. A non-finite edit WINS over a boundary edit where both
  *     classes select the same row (applied second, deliberately — the
  *     guard must abort regardless of what magnitude the row carried).
  *   - events/customer/supplier/orders/part reuse the single-axis
  *     classes verbatim (their skew shapes key on different columns, so
  *     the dimensions compose without interaction loss).
  *   - documents/embeddings are copied untouched from the stress corpus —
  *     text/vector pathologies have no non-finite scalar dimension.
  */
object TriStressFixture {

  /** Build (StressFixture first, then the non-finite overlay into a fresh
    * dir); returns the dir. */
  def build(spark: SparkSession): String = {
    val src = StressFixture.build(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tri-stress").toString

    Seq("region", "nation", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(1).write.parquet(s"$dir/$t.parquet")
    }

    def poison(table: String, key: Column, m: Int,
               edits: Seq[(Int, String, Column)]): Unit = {
      val df0 = spark.read.parquet(s"$src/$table.parquet")
      val k = pmod(key, lit(m))
      edits.groupBy(_._2).foldLeft(df0) { case (df, (c, es)) =>
        df.withColumn(c, es.foldLeft(when(lit(false), col(c))) {
          case (w, (cls, _, v)) => w.when(k === cls, v)
        }.otherwise(col(c)))
      }.coalesce(1).write.parquet(s"$dir/$table.parquet")
    }
    import NonFiniteFixture.{NaNd, PosInf, NegInf}

    poison("events", col("event_id"), 101, Seq(
      (0, "value", NaNd), (1, "value", PosInf), (2, "value", NegInf)))
    poison("lineitem",
      col("l_orderkey") * 7 + col("l_linenumber").cast("long"), 97, Seq(
        (0, "l_extendedprice", NaNd), (1, "l_extendedprice", PosInf),
        (2, "l_extendedprice", NegInf),
        (3, "l_tax", NaNd), (4, "l_discount", PosInf),
        (5, "l_quantity", NaNd)))
    poison("customer", col("c_custkey"), 53, Seq(
      (0, "c_acctbal", NaNd), (1, "c_acctbal", NegInf)))
    poison("supplier", col("s_suppkey"), 7, Seq((0, "s_acctbal", NegInf)))
    poison("orders", col("o_orderkey"), 89, Seq((0, "o_totalprice", NaNd)))
    poison("part", col("p_partkey"), 41, Seq((0, "p_retailprice", NaNd)))

    dir
  }
}

/** Exploratory sweep over the three-way corpus — adjudication input for
  * the TriStress pin in [[StressSweepSpec]]. Not part of the suite. */
object TriStressSweepMain {
  def main(a: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = TriStressFixture.build(spark)
    println(s"[tristress] corpus at $dir")
    Registry.all.foreach { q =>
      val r = try { TestSpark.materialize(q.fn(spark, dir)); "PASS" }
      catch {
        case t: Throwable =>
          val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
            .map(_.toString.linesIterator.next()).mkString(" | ")
          s"FAIL ${chain.take(260)}"
      }
      println(f"[tristress] ${q.name}%-28s $r")
    }
  }
}
