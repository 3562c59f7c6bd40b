package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/**
 * Random-hyperplane LSH bucket id as one compact codegen expression:
 * bit j of the result is set iff dot(planes(j), vec) > 0 (Charikar
 * 2002 sign-random-projection). Same compact-kernel rationale as
 * [[IvfRankCells]]/[[PqEncode]] — the `when(dot(lit-array, vec) > 0,
 * 1L<<j)` chain embeds nPlanes × dim literal nodes and measured 0.33s
 * at 16 planes but 3.1s at 32 (10k vectors) as the generated method
 * outgrows JIT budgets; this form is fixed loops over one flattened
 * `double[]`, so plane count only changes a trip count.
 *
 * Scores are the same sequential left-to-right fold as [[VectorDot]]
 * against each plane literal — bit-identical sign decisions. One
 * deliberate edge-case divergence from the `when` chain it replaces:
 * a NULL vector or NULL element yields NULL here (the chain silently
 * mapped those to bucket 0, because `when(null > 0, ...)` falls to
 * the otherwise-branch per bit) — loud beats a garbage bucket.
 */
case class LshBucket64(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  private def nPlanes = planes.length
  private def dim = planes.head.length

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](nPlanes * dim)
    var j = 0
    while (j < nPlanes) {
      var i = 0
      while (i < dim) { a(j * dim + i) = planes(j)(i); i += 1 }
      j += 1
    }
    a
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_bucket64"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (planes.isEmpty || planes.length > 64 || planes.exists(_.length != dim))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1..64 equal-length hyperplanes")
    else if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> input, got ${child.dataType.simpleString}")

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val isF = elemType.contains(FloatType)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var acc = 0.0
      var k = 0
      while (k < dim) {
        acc += flat(j * dim + k) * (if (isF) v.getFloat(k).toDouble else v.getDouble(k))
        k += 1
      }
      if (acc > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    val getter: (String, String) => String = elemType match {
      case Some(FloatType) => (arr, i) => s"(double) $arr.getFloat($i)"
      case _ => (arr, i) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $bad = true; break; }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $bucket = 0L;
         |    for (int $j = 0; $j < $nPlanes; $j++) {
         |      double $acc = 0.0;
         |      for (int $k = 0; $k < $dim; $k++) {
         |        $acc += $flatRef[$j * $dim + $k] * ${getter(v, k)};
         |      }
         |      if ($acc > 0) $bucket |= 1L << $j;
         |    }
         |    ${ev.value} = $bucket;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket64 =
    copy(child = newChild)
}
