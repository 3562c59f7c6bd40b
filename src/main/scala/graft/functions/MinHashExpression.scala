package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native MinHash signature over a shingle-hash array: for permutation j,
 * `min over h of (a_j * (h mod P) + b_j) mod P`.
 *
 * The built-in formulation (`array(array_min(transform(hs, ...)) x 16)`)
 * traverses and materializes a transformed copy of the array once PER
 * PERMUTATION; this expression makes ONE pass updating all permutation
 * minima per element, inside whole-stage codegen.
 *
 * Semantics match the built-ins exactly (d2/d4's DuckDB oracles still
 * hash-compare): null elements are skipped the way `array_min` skips
 * them, a position with no non-null elements (empty input) is a null
 * signature slot, a null array is NULL. All inputs are pmod'ed
 * non-negative longs, so plain `%` is exact.
 */
case class MinHashSig(child: Expression, perms: Seq[(Long, Long)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  private val aArr: Array[Long] = perms.map(_._1).toArray
  private val bArr: Array[Long] = perms.map(_._2).toArray
  private val P = Hashing.P

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = aArr.length
    val mins = new Array[Long](k)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = {
          val r = arr.getLong(i) % P; if (r < 0) r + P else r
        }
        var j = 0
        while (j < k) {
          val v = (aArr(j) * m + bArr(j)) % P
          if (!seen || v < mins(j)) mins(j) = v
          j += 1
        }
        seen = true
      }
      i += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](k)) // all-null slots
    else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |int $k = $aRef.length;
         |long[] $mins = new long[$k];
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $m = $arr.getLong($i) % ${P}L;
         |    if ($m < 0) $m += ${P}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aRef[$j] * $m + $bRef[$j]) % ${P}L;
         |      if (!$seen || $v < $mins[$j]) $mins[$j] = $v;
         |    }
         |    $seen = true;
         |  }
         |}
         |if ($seen) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |} else {
         |  Object[] $out = new Object[$k];
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
