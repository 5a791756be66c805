package graft
package functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static forwarders for the native text expressions (the generated Java
  * calls these directly — see [[StaticUrlExpression]]).
  */
object TextNorm {
  /** Unicode NFC (canonical composition): combining sequences fold to
    * their precomposed forms (e + U+0301 → é), so byte-level dedup /
    * hashing sees one representation per canonically-equal string.
    * Fast-path: `Normalizer.isNormalized` is O(n) with no allocation,
    * and real web text is overwhelmingly already-NFC — the common case
    * returns the input UTF8String untouched.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonical first step of a text-cleaning pipeline (normalize → strip
  * control chars → collapse whitespace), kept native so a 100 TB
  * normalize-then-hash pass stays inside whole-stage codegen. Spark has
  * no built-in Unicode normalizer; a Scala UDF here would break the
  * codegen span on every scan that cleans text.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    TextNorm.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr = copy(c)
}

object TextExpressions {
  def nfc_normalize(c: Column): Column =
    GraftColumnShim.column(NfcNormalizeExpr(GraftColumnShim.expression(c)))
}
