package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd MinHash signature: `graft_minhash(tokens, numHashes)` →
  * `array<bigint>` of length numHashes.
  *
  * Byte-identical to the built-in formulation it replaces —
  * `array(array_min(transform(toks, t -> xxhash64(t, 0))), ...,
  * array_min(transform(toks, t -> xxhash64(t, n-1))))` — which had two
  * structural costs the bench profile attributed ~1.6 s of q50's sf0.1
  * time to:
  *
  *   1. `transform` is CodegenFallback: every element evaluation walks the
  *      interpreted expression tree with boxing, n times per row, and each
  *      `transform` materializes an intermediate hash array per row.
  *   2. `xxhash64(t, lit(i))` re-hashes the FULL token string for every i:
  *      its chained form is `hashInt(i, hashUTF8String(t, 42))`, so the
  *      string pass (the expensive part) is repeated numHashes times.
  *
  * This expression runs one fused primitive loop inside whole-stage
  * codegen: each token's string is hashed ONCE (`XXH64.hashUTF8String`,
  * seed 42 — the exact call Spark's xxhash64 codegen emits for a string
  * child), then the n per-seed values are the cheap constant-time
  * `XXH64.hashInt(i, base)` chain continuation, exactly the value the
  * built-in chain produces. numHashes-fold fewer string hashes, zero
  * intermediate arrays, no interpreter.
  *
  * Edge semantics preserved exactly (pinned by SketchSpec's equivalence
  * test over the real corpus + crafted edges):
  *   - empty token array → all-null signature (array_min of empty is null);
  *   - null token element → contributes `hashInt(i, 42)` (xxhash64 skips a
  *     null child, leaving the running hash at the 42 seed);
  *   - null token ARRAY → null signature (standard null-intolerant unary).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, s"graft_minhash needs numHashes > 0, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${other.simpleString}")
  }

  // containsNull: the empty-array input produces all-null elements, same
  // as array_min(empty) in the formulation this replaces.
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val base =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, base)
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val uad = classOf[UnsafeArrayData].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $gad(new Object[$numHashes]);
         |} else {
         |  final long[] $out = new long[$numHashes];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $base = $c.isNullAt($j)
         |      ? 42L : $xxh.hashUTF8String($c.getUTF8String($j), 42L);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      final long $h = $xxh.hashInt($i, $base);
         |      if ($h < $out[$i]) $out[$i] = $h;
         |    }
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}
