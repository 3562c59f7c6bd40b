package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/**
 * IVF coarse quantizer as ONE compact codegen expression: ranks the
 * `nprobe` best-scoring centroids for a vector (score = raw dot
 * product; ties to the smaller cell id) and returns their cell ids as
 * `array<int>`.
 *
 * Why an Expression and not `sort_array(array(struct(dot(lit-array,
 * vec)), ...))`: that formulation embeds nCells × dim literal nodes in
 * the plan, so the expression tree — and the generated Java — grows
 * with the codebook. Measured on the round-7 scale ladder: at 16 cells
 * it is fine, at 80 cells the generated method blows past JIT limits
 * and the whole scan drops to interpreted evaluation (knn graph over
 * 10k vectors: 9.1s at 16 cells, 44.0s at 80 — the OPPOSITE slope the
 * nCells dial must have). Production IVF uses thousands of cells
 * (nCells ~ sqrt(corpus)), which plan literals cannot reach at all.
 * Here the centroid matrix is a single flattened `double[]` reference
 * object — generated code is two fixed nested loops plus an
 * O(nprobe × nCells) selection, independent of codebook size.
 *
 * Semantics are EXACTLY the literal formulation it replaces (and the
 * DuckDB oracle mirrors): scores are the sequential left-to-right
 * fold `acc += cents[j][i] * (double) vec[i]` — bit-identical to
 * [[VectorDot]] against a centroid literal — ranked descending with
 * ties to the smaller cell id. Null array, length != dim, or null
 * element => NULL. (NaN scores rank below every real score here,
 * while `sort_array` ranks NaN greatest — embeddings with NaN
 * components are not meaningful inputs to either.)
 */
case class IvfRankCells(child: Expression, cents: Seq[Seq[Double]], nprobe: Int)
    extends UnaryExpression {

  private def nCells = cents.length
  private def dim = cents.head.length
  private def p = math.min(nprobe, nCells)

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](nCells * dim)
    var j = 0
    while (j < nCells) {
      var i = 0
      while (i < dim) { a(j * dim + i) = cents(j)(i); i += 1 }
      j += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ivf_rank_cells"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (cents.isEmpty || cents.exists(_.length != dim))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a non-empty rectangular centroid matrix")
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
    val scores = new Array[Double](nCells)
    var j = 0
    while (j < nCells) {
      var acc = 0.0
      var k = 0
      while (k < dim) {
        acc += flat(j * dim + k) * (if (isF) v.getFloat(k).toDouble else v.getDouble(k))
        k += 1
      }
      scores(j) = acc
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(selectTop(scores))
  }

  private def selectTop(scores: Array[Double]): Array[Int] = {
    val out = new Array[Int](p)
    val taken = new Array[Boolean](nCells)
    var s = 0
    while (s < p) {
      var bj = -1
      var bs = 0.0
      var j = 0
      while (j < nCells) {
        if (!taken(j) && (bj < 0 || scores(j) > bs)) { bj = j; bs = scores(j) }
        j += 1
      }
      taken(bj) = true
      out(s) = bj
      s += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ivfCents", flat, "double[]")
    val scores = ctx.addMutableState("double[]", "ivfScores",
      v => s"$v = new double[$nCells];")
    val taken = ctx.addMutableState("boolean[]", "ivfTaken",
      v => s"$v = new boolean[$nCells];")
    val getter = elemType match {
      case Some(FloatType) => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val bj = ctx.freshName("bj")
      val bs = ctx.freshName("bs")
      val out = ctx.freshName("out")
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
         |    for (int $j = 0; $j < $nCells; $j++) {
         |      double $acc = 0.0;
         |      for (int $k = 0; $k < $dim; $k++) {
         |        $acc += $flatRef[$j * $dim + $k] * ${getter(v, k)};
         |      }
         |      $scores[$j] = $acc;
         |    }
         |    java.util.Arrays.fill($taken, false);
         |    int[] $out = new int[$p];
         |    for (int $s = 0; $s < $p; $s++) {
         |      int $bj = -1;
         |      double $bs = 0.0;
         |      for (int $j = 0; $j < $nCells; $j++) {
         |        if (!$taken[$j] && ($bj < 0 || $scores[$j] > $bs)) {
         |          $bj = $j; $bs = $scores[$j];
         |        }
         |      }
         |      $taken[$bj] = true;
         |      $out[$s] = $bj;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfRankCells =
    copy(child = newChild)
}
