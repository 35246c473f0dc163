package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over `array<float>` / `array<double>`.
  *
  * Why a custom Catalyst expression (SURVEY §4.3 escape hatch): Spark's
  * higher-order functions (`transform`/`zip_with`/`aggregate`) are
  * CodegenFallback — every element evaluation goes through the interpreted
  * expression walker with boxing, which made the cosine-similarity queries
  * the bench bottleneck. This expression emits a tight primitive loop inside
  * whole-stage codegen instead.
  *
  * Semantics are kept bit-identical to the HOF formulation the DuckDB oracle
  * mirrors: each element widens to double FIRST, then products accumulate
  * sequentially left-to-right (IEEE doubles are order-sensitive, and the
  * oracle's `list_sum(list_transform(...))` folds in the same order).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == DoubleType || t == FloatType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects two array<float|double> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Element nullability of either side forces a per-element null check; a
    * null element propagates NULL, exactly like the HOF formulation
    * (zip_with product of null is null, aggregate sum of null is null). */
  private def elementsNullable: Boolean = Seq(left, right).exists(
    _.dataType match { case ArrayType(_, n) => n; case _ => false })

  override def nullable: Boolean = super.nullable || elementsNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val lGet = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // `ev.isNull` may be referenced ONLY when the expression is nullable:
      // for a statically non-nullable input (e.g. downstream of a
      // forall()/IsNotNull filter, which strips attribute nullability) Spark
      // substitutes the `false` LITERAL for ev.isNull in the final code but
      // the body template has already baked in the variable NAME — which is
      // then never declared, the generated class fails to compile
      // ("Expression "isNull_x" is not an rvalue"), and every batch falls
      // back to the interpreted path. elementsNullable implies nullable
      // (see `nullable` above), so the two branches below are exhaustive.
      //
      // The null-element branch is emitted only when the schema says null
      // elements are possible — the common containsNull=false path keeps the
      // tight branch-free loop.
      val (nullCheck, assign) =
        if (elementsNullable)
          (s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }",
            s"if (!${ev.isNull}) { ${ev.value} = $s; }")
        else
          ("", s"${ev.value} = $s;")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $lGet * $rGet;
         |}
         |$assign
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** ONE SQL builder per graft function, shared by BOTH registration paths
    * (session-registry [[register]] and [[GraftExtensions]]) — the literal/
    * arity rules were previously duplicated verbatim 4× and invited drift
    * (round-8 ADVICE). Arity is guarded with a descriptive
    * IllegalArgumentException (bare `exprs(1)` threw
    * IndexOutOfBoundsException at `graft_minhash(toks)`), and the int
    * parameter accepts any FOLDABLE IntegerType expression — `CAST(8 AS
    * INT)` or `4 + 4`, not just a bare literal — by constant-evaluating it
    * at build time (safe: foldable ⇒ deterministic, input-independent). */
  private def arity(fn: String, usage: String, n: Int)(
      exprs: Seq[Expression]): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments — $usage — got ${exprs.length}")

  private def foldableInt(fn: String, arg: String, e: Expression): Int =
    if (e.foldable && e.dataType == IntegerType) e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must not be NULL")
    } else throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable INT expression (e.g. a literal), " +
        s"got ${e.sql}")

  private[plans] val dotBuilder: Seq[Expression] => Expression = { exprs =>
    arity("graft_dot", "graft_dot(a, b)", 2)(exprs)
    DotProduct(exprs(0), exprs(1))
  }
  private[plans] val topkBuilder: Seq[Expression] => Expression =
    exprs => TopKBy.fromExprs(exprs) // fromExprs carries its own arity check
  private[plans] val minhashBuilder: Seq[Expression] => Expression = { exprs =>
    arity("graft_minhash", "graft_minhash(tokens, numHashes)", 2)(exprs)
    MinHashSignature(exprs(0),
      foldableInt("graft_minhash", "numHashes", exprs(1)))
  }
  private[plans] val shinglesBuilder: Seq[Expression] => Expression = { exprs =>
    arity("graft_shingles", "graft_shingles(tokens, n)", 2)(exprs)
    GramShingles(exprs(0), foldableInt("graft_shingles", "n", exprs(1)))
  }

  /** Registers `graft_dot(a, b)` and `graft_topk(score, id, k)` in the
    * session so the public `expr` API can reach the custom expressions.
    * Idempotent AND once-per-session: call inside each query fn (the
    * harness owns SparkSession construction — SURVEY §7.6); the
    * functionExists guard skips re-registration, which the round-3 bench
    * log showed spamming `SimpleFunctionRegistry ... replaced a previously
    * registered function` per query. A concurrent double-register is
    * harmless (createOrReplace is idempotent). The analyzer wraps the bare
    * AggregateFunction returned for graft_topk into an AggregateExpression
    * at resolution, like any built-in aggregate. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Guard each function INDEPENDENTLY: a single graft_dot-only guard
    // around both registrations leaves a window where a concurrent caller
    // sees graft_dot present, skips graft_topk, and the registry stays
    // half-populated forever (UNRESOLVED_ROUTINE on the next graft_topk
    // plan). Per-function check-then-createOrReplace is race-safe because
    // createOrReplaceTempFunction itself is idempotent.
    def ensure(name: String)(
        builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      if (!reg.functionExists(
          new org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    ensure("graft_dot")(dotBuilder)
    ensure("graft_topk")(topkBuilder)
    ensure("graft_minhash")(minhashBuilder)
    ensure("graft_shingles")(shinglesBuilder)
  }
}

/** The deployment-grade registration path: when the application owns session
  * construction, enable with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. Exposes the
  * same functions as [[VectorFunctions.register]] without touching internal
  * session state at query time. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => KnnStrategy)
    ext.injectOptimizerRule(_ => KnnFilterPushdown)
    // Builders are the SAME objects VectorFunctions.register uses — one
    // definition of the arity/foldable-int rules for both paths.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getCanonicalName, "graft_dot"),
      VectorFunctions.dotBuilder))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_topk"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TopKBy].getCanonicalName, "graft_topk"),
      VectorFunctions.topkBuilder))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSignature].getCanonicalName, "graft_minhash"),
      VectorFunctions.minhashBuilder))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GramShingles].getCanonicalName, "graft_shingles"),
      VectorFunctions.shinglesBuilder))
  }
}
