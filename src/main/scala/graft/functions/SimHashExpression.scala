package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native 60-bit SimHash over a token-hash array — the dedup hot path's
 * second custom expression next to [[VectorDot]].
 *
 * Why: the built-in formulation is 60 unrolled `aggregate` lambdas over
 * the same array (one per bit), each a separate higher-order-function
 * evaluation with a boxed accumulator — per row that is 60 array
 * traversals. This expression makes ONE pass, bumping 60 primitive
 * counters per element inside whole-stage codegen.
 *
 * Semantics are bit-identical to the unrolled form (and the DuckDB
 * oracle): counter i accumulates +1/-1 per element depending on hash
 * bit i; result bit i is set iff its counter is positive. Empty array
 * => 0; null array or null element => NULL (matching `aggregate`'s
 * null propagation).
 */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var b = 0
      while (b < 60) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val bad = ctx.freshName("bad")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[60];
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) { $bad = true; break; }
         |  long $h = $arr.getLong($i);
         |  for (int $b = 0; $b < 60; $b++) {
         |    $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $out = 0L;
         |  for (int $b = 0; $b < 60; $b++) {
         |    if ($counts[$b] > 0) $out |= (1L << $b);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
