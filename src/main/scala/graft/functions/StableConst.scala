package graft
package functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** A run-constant that is NOT embedded in generated code text.
  *
  * `lit(wave)` inlines its value into every whole-stage-codegen source it
  * touches, so each crawl wave generates byte-different Java for the same
  * plan shapes and Janino recompiles the entire wave pipeline every wave
  * (measured: ~200 classes / 2.3 s per wave at 32 cores, all driver-side
  * and core-count-invariant — pure scaling-floor cost). `StableConst`
  * routes the value through the codegen `references` array instead: the
  * generated source is identical wave over wave, so the codegen cache
  * hits and compilation happens once per plan shape, not once per wave.
  *
  * Deliberately non-foldable — ConstantFolding would turn it back into a
  * `Literal` and re-inline the value. The trade: the optimizer cannot
  * constant-fold expressions built on top of it, which is irrelevant for
  * its use as a projected wave/batch-id column.
  */
case class StableConst(value: Any, dataType: DataType)
    extends LeafExpression {
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    // stored boxed in `references`; the cast + implicit unboxing keeps the
    // source text value-free
    val ref = ctx.addReferenceObj("stableConst", value, boxed)
    ev.copy(
      code = code"final $javaType ${ev.value} = ($boxed) $ref;",
      isNull = FalseLiteral)
  }
}

object StableConst {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  /** Int run-constant (e.g. the wave id) kept out of codegen text. */
  def stableInt(v: Int): Column =
    GraftColumnShim.column(StableConst(v, IntegerType))

  def stableLong(v: Long): Column =
    GraftColumnShim.column(StableConst(v, LongType))
}
