package graft
package functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot-path URL scalars — unlike a
  * Scala UDF these stay INSIDE whole-stage codegen (the generated Java
  * calls the static forwarders directly; no encoder round-trip, no
  * closure serialization). Used by the crawl's link-expansion stage where
  * they run once per discovered link (billions/wave at 10^10 scale).
  */
abstract class StaticUrlExpression extends UnaryExpression {
  /** fully-qualified static call, e.g. "graft.NewsUrl.isNewsUrl" */
  protected def staticFn: String

  override def nullIntolerant: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$staticFn($c.toString())")
}

/** P8 — is_news_url (newsurl.py:26-101), the crawl-priority bit. */
case class IsNewsUrlExpr(child: Expression) extends StaticUrlExpression {
  override def dataType: DataType = BooleanType
  override protected def staticFn: String = "graft.NewsUrl.isNewsUrl"
  override protected def nullSafeEval(v: Any): Any =
    NewsUrl.isNewsUrl(v.toString)
  override protected def withNewChildInternal(c: Expression): IsNewsUrlExpr = copy(c)
}

/** P5 — is_valid_url_to_navigate (utils.py:80-116). */
case class IsNavigableExpr(child: Expression) extends StaticUrlExpression {
  override def dataType: DataType = BooleanType
  override protected def staticFn: String = "graft.UrlOps.isValidUrlToNavigate"
  override protected def nullSafeEval(v: Any): Any =
    UrlOps.isValidUrlToNavigate(v.toString)
  override protected def withNewChildInternal(c: Expression): IsNavigableExpr = copy(c)
}

/** P1∘P2 — scheme-stripped canonical frontier key. */
case class CanonicalKeyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UrlOps.canonicalKey(v.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.UrlOps.canonicalKey($c.toString()))")
  override protected def withNewChildInternal(c: Expression): CanonicalKeyExpr = copy(c)
}

object UrlExpressions {
  def is_news_url(c: Column): Column =
    GraftColumnShim.column(IsNewsUrlExpr(GraftColumnShim.expression(c)))
  def is_navigable(c: Column): Column =
    GraftColumnShim.column(IsNavigableExpr(GraftColumnShim.expression(c)))
  def canonical_key(c: Column): Column =
    GraftColumnShim.column(CanonicalKeyExpr(GraftColumnShim.expression(c)))
}
