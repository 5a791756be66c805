package graft
package functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
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

/** robots Disallow test over the in-plan rules column — runs once per
  * discovered link on every host that has robots rules, so it must stay
  * inside whole-stage codegen (the r3 Scala UDF here broke the span AND
  * compiled a fresh regex per link — VERDICT r3 #3). Custom null
  * semantics, handled in [[graft.crawl.Robots.disallowedArray]]: a null
  * prefixes array (host without robots) or null url is ALLOWED (false),
  * never null — so the expression is non-nullable and the generated code
  * needs no null branches of its own.
  */
case class RobotsDisallowedExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    graft.crawl.Robots.disallowedArray(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      final boolean ${ev.value} = graft.crawl.Robots.disallowedArray(
        ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsDisallowedExpr =
    copy(left = newLeft, right = newRight)
}

object UrlExpressions {
  def is_news_url(c: Column): Column =
    GraftColumnShim.column(IsNewsUrlExpr(GraftColumnShim.expression(c)))
  def is_navigable(c: Column): Column =
    GraftColumnShim.column(IsNavigableExpr(GraftColumnShim.expression(c)))
  def canonical_key(c: Column): Column =
    GraftColumnShim.column(CanonicalKeyExpr(GraftColumnShim.expression(c)))
  def robots_disallowed(prefixes: Column, url: Column): Column =
    GraftColumnShim.column(RobotsDisallowedExpr(
      GraftColumnShim.expression(prefixes), GraftColumnShim.expression(url)))
}
