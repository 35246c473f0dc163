package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd n-gram shingling: `graft_shingles(tokens, n)` →
  * `array<string>` of the `size - n + 1` space-joined n-token windows
  * (empty array when `size < n`).
  *
  * Byte-identical to the built-in formulation it replaces at the q93/q106/
  * q122 call sites —
  * `transform(sequence(1, size(toks) - n + 1), i -> concat_ws(' ',
  * element_at(toks, i), ..., element_at(toks, i + n - 1)))` — including
  * concat_ws's skip-null semantics (a null token contributes nothing, not
  * a NULL shingle). The HOF form walks the interpreted evaluator per
  * shingle (Spark HOFs are CodegenFallback) and re-evaluates n element_at
  * lookups + a varargs concat through boxing; this expression is one tight
  * loop over the token array inside whole-stage codegen, building each
  * shingle with `UTF8String.concatWs` (the exact kernel the built-in
  * ConcatWs bottoms out in). Shingling is the front of every exact-dedup
  * path (PPJoin q122, boilerplate q93, duplicate spans q106) — at 100 TB
  * it runs once per document in the hot scan projection.
  *
  * Callers keep their own `size >= n` guards (the formulation this
  * replaces needed them because `sequence(1, 0)` DESCENDS); this
  * expression is total — short arrays yield an empty result either way.
  */
case class GramShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_shingles needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${other.simpleString}")
  }

  // concat_ws never returns null → elements are non-null by construction.
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    // Materialize the elements ONCE (overlapping windows would otherwise
    // re-read each element up to n times through isNullAt/getUTF8String —
    // round-8 ADVICE); each window is then an arraycopy slice. The window
    // buffer is reused across iterations: concatWs reads it eagerly and
    // retains nothing.
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](m)
    val w = new Array[UTF8String](n)
    var k = 0
    while (k < m) {
      System.arraycopy(toks, k, w, 0, n)
      out(k) = UTF8String.concatWs(sep, w: _*)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val sepRef = ctx.addReferenceObj("sep", sep, utf8)
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val toks = ctx.freshName("toks")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      // Mirrors nullSafeEval: one materialization pass over the elements,
      // then arraycopy window slices into a reused buffer (concatWs reads
      // eagerly, retains nothing) — ~n× fewer isNullAt/getUTF8String calls
      // on the overlapping windows (round-8 ADVICE).
      s"""
         |final int $len = $c.numElements();
         |final int $m = $len - $n + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  final $utf8[] $toks = new $utf8[$len];
         |  for (int $i = 0; $i < $len; $i++) {
         |    $toks[$i] = $c.isNullAt($i) ? null : $c.getUTF8String($i);
         |  }
         |  final Object[] $out = new Object[$m];
         |  final $utf8[] $w = new $utf8[$n];
         |  for (int $k = 0; $k < $m; $k++) {
         |    System.arraycopy($toks, $k, $w, 0, $n);
         |    $out[$k] = $utf8.concatWs($sepRef, $w);
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): GramShingles = copy(child = newChild)
}

object GramShingles {
  /** Column helper (the call sites use this; SQL surface gets
    * `graft_shingles` via VectorFunctions.register / GraftExtensions). */
  def shingles(tokens: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(
      GramShingles(org.apache.spark.sql.GraftSqlShim.expression(tokens), n))
}
