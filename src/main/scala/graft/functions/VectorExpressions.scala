package graft
package functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Primitive-array kernels for the embedding operators. Spark evaluates
  * higher-order-function lambdas (`zip_with`/`aggregate`) INTERPRETED,
  * per element — on the ANN hot path (one dot product per candidate
  * pair) that is the dominant cost. These static kernels run a tight
  * primitive loop over the ArrayData and stay inside whole-stage codegen
  * (the generated Java calls them directly; no boxing, no encoder
  * round-trip).
  *
  * Assumes non-null array elements (the embedding columns are dense
  * vectors; null elements read as 0.0, which matches a zero-padded
  * semantic rather than throwing mid-scan).
  */
object VectorKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def norm2(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Deterministic pseudo-random sign for hyperplane `plane`, dimension
    * `i` (splitmix64 finalizer — public-domain mix function).
    */
  def rademacher(plane: Int, i: Int): Boolean = {
    var z = (plane.toLong << 32) | (i.toLong & 0xffffffffL)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z & 1L) == 0L
  }

  /** Dots of `v` against `centroids.length / dim` pre-normalized
    * centroids (flat row-major matrix) in one primitive pass, returning
    * the `nProbe` nearest centroid ids best-first (ties → lower id).
    * With unit-norm centroids, argmax over plain dots IS the cosine
    * argmax (the row's own norm is constant across centroids), so the
    * IVF coarse assignment needs no row normalization and no division.
    */
  def nearestCentroids(v: ArrayData, centroids: Array[Double], dim: Int,
                       nProbe: Int): ArrayData = {
    val nlist = centroids.length / dim
    val n = math.min(dim, v.numElements())
    val m = math.min(nProbe, nlist)
    val bestIds = new Array[Int](m)
    val bestSims = new Array[Double](m)
    java.util.Arrays.fill(bestSims, Double.NegativeInfinity)
    var c = 0
    while (c < nlist) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * centroids(off + i); i += 1 }
      // size-m insertion (sims desc); strict comparisons keep the
      // earlier (lower) centroid id ahead on exact ties
      if (s > bestSims(m - 1)) {
        var j = m - 1
        while (j > 0 && bestSims(j - 1) < s) {
          bestSims(j) = bestSims(j - 1); bestIds(j) = bestIds(j - 1); j -= 1
        }
        bestSims(j) = s; bestIds(j) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestIds)
  }

  /** All `tables` random-hyperplane signatures of `v` in ONE primitive
    * pass (tables × bits × dim fused multiply-adds). Expanding this as
    * per-element Catalyst expressions generates O(tables·bits·dim) Java —
    * past Janino's method-size limit at realistic shapes — so the whole
    * multi-table signature is one kernel call.
    */
  def planeSigs(v: ArrayData, dim: Int, bits: Int, tables: Int): ArrayData = {
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        val plane = t * bits + j
        var s = 0.0
        var i = 0
        while (i < n) {
          val x = v.getDouble(i)
          s += (if (rademacher(plane, i)) x else -x)
          i += 1
        }
        if (s >= 0) sig |= (1L << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** dot(array<double>, array<double>) → double, codegen-resident. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(l, r)
}

/** l2norm(array<double>) → double, codegen-resident. */
case class L2NormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.norm2(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.norm2($a)")
  override protected def withNewChildInternal(c: Expression): L2NormExpr = copy(c)
}

/** plane_sigs(array<double>) → array<long> of length `tables`
  * (multi-table LSH signatures), codegen-resident.
  */
case class PlaneSigsExpr(child: Expression, dim: Int, bits: Int, tables: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.planeSigs(a.asInstanceOf[ArrayData], dim, bits, tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernels.planeSigs($a, $dim, $bits, $tables)")
  override protected def withNewChildInternal(c: Expression): PlaneSigsExpr =
    copy(child = c)
}

/** nearest_centroids(array<double>) → array<int>: the `nProbe` nearest
  * of the pre-normalized flat `centroids` matrix by dot product — the
  * IVF coarse-quantizer assignment, codegen-resident. The matrix rides
  * in `references` (not the generated source), so plans with different
  * trained centroids share one compiled class.
  */
case class NearestCentroidsExpr(child: Expression, centroids: Array[Double],
                                dim: Int, nProbe: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCentroids(
      a.asInstanceOf[ArrayData], centroids, dim, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernels.nearestCentroids($a, $cRef, $dim, $nProbe)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroidsExpr =
    copy(child = c)
}

object VectorExpressions {
  /** dot product of two array<double> columns (codegen'd). */
  def dot(a: Column, b: Column): Column =
    GraftColumnShim.column(DotProductExpr(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** L2 norm of an array<double> column (codegen'd). */
  def l2norm(a: Column): Column =
    GraftColumnShim.column(L2NormExpr(GraftColumnShim.expression(a)))

  /** `tables` random-hyperplane LSH signatures as array<long> (codegen'd
    * single-pass kernel).
    */
  def plane_sigs(v: Column, dim: Int, bits: Int, tables: Int): Column =
    GraftColumnShim.column(PlaneSigsExpr(
      GraftColumnShim.expression(v), dim, bits, tables))

  /** ids of the `nProbe` nearest of the flat pre-normalized `centroids`
    * as array<int>, best first (codegen'd single-pass kernel).
    */
  def nearest_centroids(v: Column, centroids: Array[Double], dim: Int,
                        nProbe: Int): Column =
    GraftColumnShim.column(NearestCentroidsExpr(
      GraftColumnShim.expression(v), centroids, dim, nProbe))
}
