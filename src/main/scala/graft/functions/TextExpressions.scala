package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * All character n-grams of a string (positions 1..len−n+1, codepoint
 * semantics) in ONE forward pass over the UTF-8 bytes.
 *
 * Replaces `transform(sequence(1, length−n+1), i => substr(text, i,
 * n))`, which is quadratic and interpreter-bound: each `substr(text,
 * i, n)` re-seeks codepoint i from byte 0 (O(i) per element, O(len²)
 * per doc), and higher-order functions evaluate their lambda
 * interpreted — measured on x16's corpus as a 10× JIT-maturity swing
 * (55s cold → 5.7s steady at 50k docs) that made bench captures
 * unreadable. Here codepoint starts are found once ((b & 0xC0) !=
 * 0x80 marks a start byte) and each n-gram is a byte-slice — linear,
 * allocation-light, and inside whole-stage codegen where the loop
 * JITs immediately.
 *
 * Codepoint semantics match `substring` exactly (both count Unicode
 * codepoints via UTF-8 start bytes), so the output equals the
 * formulation it replaces element-for-element; `length(text) < n` =>
 * empty array, NULL => NULL.
 */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      CharNGrams.ngrams(a.asInstanceOf[UTF8String], n).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.CharNGrams$$.MODULE$$.ngrams($v, $n));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  /** The single-pass kernel, shared by eval and generated code. */
  def ngrams(s: UTF8String, n: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    // codepoint start offsets, plus the end sentinel
    val starts = new Array[Int](s.numChars() + 1)
    var cp = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(cp) = i; cp += 1 }
      i += 1
    }
    starts(cp) = bytes.length
    val count = math.max(0, cp - n + 1)
    val out = new Array[UTF8String](count)
    var j = 0
    while (j < count) {
      out(j) = UTF8String.fromBytes(bytes, starts(j), starts(j + n) - starts(j))
      j += 1
    }
    out
  }
}
