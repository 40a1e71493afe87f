// Same package rationale as CosineSimilarity.scala: uses the
// private[sql] Column↔Expression bridge for the Column-API entry point.
package org.apache.spark.sql.graftx

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native accent-stripping expression for corpus text normalization
  * (training-data pipelines fold `café`/`cafe` variants before
  * dedup/fingerprinting): Unicode NFD decomposition, then drop
  * combining (non-spacing) marks — `é`→`e`, `ñ`→`n`, `ü`→`u`.
  *
  * Why a custom Expression (SURVEY.md §7 preference order b): Spark has
  * no accent-strip builtin; `translate` would need an exhaustive
  * accent→base alphabet pair list, and a Scala UDF would break
  * whole-stage codegen in the text-cleaning hot path. This stays inside
  * the generated code (`doGenCode`), like the reference-free cosine
  * kernel in [[CosineSimilarity]].
  */
case class Unaccent(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "unaccent"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Unaccent.strip(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val sb = ctx.freshName("sb")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
        |java.lang.String $s = java.text.Normalizer.normalize(
        |  $in.toString(), java.text.Normalizer.Form.NFD);
        |java.lang.StringBuilder $sb = new java.lang.StringBuilder($s.length());
        |for (int $i = 0; $i < $s.length(); $i++) {
        |  char $c = $s.charAt($i);
        |  if (java.lang.Character.getType($c)
        |      != java.lang.Character.NON_SPACING_MARK) {
        |    $sb.append($c);
        |  }
        |}
        |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
        |  $sb.toString());
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object Unaccent {
  /** NFD + drop non-spacing marks; shared by eval and tests. */
  def strip(s: String): String = {
    val norm = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Column-API entry point. */
  def apply(c: Column): Column =
    ExpressionUtils.column(Unaccent(ExpressionUtils.expression(c)))
}
