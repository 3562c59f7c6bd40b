package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/**
 * Product-quantization kernels as compact codegen expressions, for the
 * same reason as [[IvfRankCells]]: the literal formulations embed
 * m × codes × subDim scalar nodes in the plan, so generated code grows
 * with the codebook and falls off a cliff well before production
 * sizes. Measured (`bench/pq_ladder_r07.json`, 10k vectors, m=8): 2.8s
 * at the gate's 16 codewords, 9.3s at 64 (Janino "Code grows beyond
 * 64 KB" → interpreted fallback), 68.6s at the PRODUCTION 256 — the
 * one-byte-per-code size every real PQ deployment uses. Here the
 * codebook is a single flattened `double[]` reference object and the
 * generated code is fixed-size loops, so codebook size only changes
 * trip counts.
 *
 * Both expressions take the FULL vector and index subvectors
 * arithmetically (vec[j*subDim + i]) — same elements, same
 * left-to-right fold, bit-identical scores to the sliced-literal
 * formulation they replace (cross-checked in ExtensionSpec).
 */
private[graft] object PqExpr {
  /** books(j)(c)(i) flattened to [j*codes*subDim + c*subDim + i]. */
  def flatten(books: Seq[Seq[Seq[Double]]]): Array[Double] = {
    val m = books.size
    val codes = books.head.size
    val subDim = books.head.head.size
    val a = new Array[Double](m * codes * subDim)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < codes) {
        var i = 0
        while (i < subDim) {
          a((j * codes + c) * subDim + i) = books(j)(c)(i); i += 1
        }
        c += 1
      }
      j += 1
    }
    a
  }
}

private[graft] trait PqExpression extends UnaryExpression {
  def child: Expression
  def books: Seq[Seq[Seq[Double]]]

  protected def m = books.size
  protected def codes = books.head.size
  protected def subDim = books.head.head.size
  protected def dim = m * subDim

  @transient protected lazy val flatBooks: Array[Double] = PqExpr.flatten(books)

  protected def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (books.isEmpty || books.exists(b => b.isEmpty || b.exists(_.length != subDim)) ||
        books.exists(_.length != codes))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a non-empty rectangular codebook")
    else if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> input, got ${child.dataType.simpleString}")

  protected def getD(v: ArrayData, i: Int): Double =
    if (elemType.contains(FloatType)) v.getFloat(i).toDouble else v.getDouble(i)

  protected def genGetter(ctx: CodegenContext): (String, String) => String =
    elemType match {
      case Some(FloatType) => (arr, i) => s"(double) $arr.getFloat($i)"
      case _ => (arr, i) => s"$arr.getDouble($i)"
    }

  /** Shared null/shape guard + body wiring for doGenCode. */
  protected def guardedGen(ctx: CodegenContext, ev: ExprCode,
                           body: String => String): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
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
         |    ${body(v)}
         |  }
         |}
       """.stripMargin
    })

  protected def validate(v: ArrayData): Boolean = {
    if (v.numElements() != dim) return false
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return false
      i += 1
    }
    true
  }
}

/**
 * PQ encode: per subspace j, the 1-BASED index of the codeword
 * maximizing dot(codeword, subvector) − cns(j)(code) (= argmin L2 with
 * per-row-constant terms dropped; `cns` = 0.5·‖codeword‖²), ties to
 * the smaller index. Output: array<int> of m codes. Null array, length
 * != m·subDim, or null element => NULL.
 */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]],
                    cns: Seq[Seq[Double]]) extends PqExpression {

  @transient private lazy val flatCns: Array[Double] = {
    val a = new Array[Double](m * codes)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < codes) { a(j * codes + c) = cns(j)(c); c += 1 }
      j += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (!validate(v)) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = -1
      var bestS = 0.0
      var c = 0
      while (c < codes) {
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          acc += flatBooks((j * codes + c) * subDim + i) * getD(v, j * subDim + i)
          i += 1
        }
        val s = acc - flatCns(j * codes + c)
        if (best < 0 || s > bestS) { best = c; bestS = s }
        c += 1
      }
      out(j) = best + 1
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flatBooks, "double[]")
    val cnsRef = ctx.addReferenceObj("pqCns", flatCns, "double[]")
    val get = genGetter(ctx)
    guardedGen(ctx, ev, v => {
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val out = ctx.freshName("out")
      s"""
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = -1;
         |  double $bestS = 0.0;
         |  for (int $c = 0; $c < $codes; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      $acc += $booksRef[($j * $codes + $c) * $subDim + $i] * ${get(v, s"$j * $subDim + $i")};
         |    }
         |    double $s = $acc - $cnsRef[$j * $codes + $c];
         |    if ($best < 0 || $s > $bestS) { $best = $c; $bestS = $s; }
         |  }
         |  $out[$j] = $best + 1;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/**
 * Per-query ADC lookup tables: adct[j][c] = dot(books(j)(c),
 * subvector_j) — m × codes doubles per query, computed once and
 * carried with the query row. Output: array<array<double>>. Null
 * array, length != m·subDim, or null element => NULL.
 */
case class PqAdc(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends PqExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (!validate(v)) return null
    val outer = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val row = new Array[Double](codes)
      var c = 0
      while (c < codes) {
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          acc += flatBooks((j * codes + c) * subDim + i) * getD(v, j * subDim + i)
          i += 1
        }
        row(c) = acc
        c += 1
      }
      outer(j) = UnsafeArrayData.fromPrimitiveArray(row)
      j += 1
    }
    new GenericArrayData(outer.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flatBooks, "double[]")
    val get = genGetter(ctx)
    guardedGen(ctx, ev, v => {
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val outer = ctx.freshName("outer")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData[] $outer =
         |  new org.apache.spark.sql.catalyst.util.ArrayData[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double[] $row = new double[$codes];
         |  for (int $c = 0; $c < $codes; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      $acc += $booksRef[($j * $codes + $c) * $subDim + $i] * ${get(v, s"$j * $subDim + $i")};
         |    }
         |    $row[$c] = $acc;
         |  }
         |  $outer[$j] = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $outer);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}
