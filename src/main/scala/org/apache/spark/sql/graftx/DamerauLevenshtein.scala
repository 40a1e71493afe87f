// Hosted under org.apache.spark.sql for the private[sql]
// Column↔Expression bridge — see CosineSimilarity.scala.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native UNRESTRICTED Damerau–Levenshtein distance — edit distance
  * whose fourth operation is transposition of adjacent characters,
  * in the full (alphabet-indexed) form where a transposed pair may be
  * edited again later ('ca'→'abc' = 2, where the common
  * optimal-string-alignment restriction says 3). Spark ships plain
  * `levenshtein` only; transposition-aware distance is the right
  * typo model for human-keyed identifiers (Damerau 1964: ~80% of
  * misspellings are one insert/delete/substitute/TRANSPOSE).
  * Semantics verified against DuckDB's `damerau_levenshtein` (the
  * oracle), which implements the same unrestricted form.
  *
  * Integer-valued — no cross-engine float hazard at all. One static
  * call inside whole-stage codegen, like [[JaroWinkler]]; O(|a|·|b|)
  * time and O(|a|·|b|) ints of scratch per call, so like any edit
  * distance it belongs INSIDE a blocked candidate loop, never on an
  * unblocked cross join.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftx.DamerauLevenshtein.distance(" +
        s"$a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object DamerauLevenshtein {
  /** Lowrance–Wagner unrestricted DL (the da[]/db textbook form).
    * Shared by eval, codegen, and tests. */
  def distance(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2) x (lb+2), offset by 1 for the -inf sentinel row/col
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue()
        }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 }
          else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(DamerauLevenshtein(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
