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

  /** Product-quantization encode: for each of `m` subspaces of `subdim =
    * dim/m` dims, the id of the L2-nearest codebook entry (ks entries per
    * subspace; flat layout codebooks[((mm*ks)+j)*subdim + i]). Ties →
    * lower id (strict <). One primitive pass: m·ks·subdim FMAs.
    */
  def pqEncode(v: ArrayData, codebooks: Array[Double], dim: Int, m: Int,
               ks: Int): ArrayData = {
    val subdim = dim / m
    val n = v.numElements()
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val vOff = mm * subdim
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ks) {
        val cOff = ((mm * ks) + j) * subdim
        var d = 0.0
        var i = 0
        while (i < subdim) {
          val x = (if (vOff + i < n) v.getDouble(vOff + i) else 0.0) -
            codebooks(cOff + i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(mm) = best
      mm += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-query ADC lookup table: lut[mm*ks + j] = dot(q_sub_mm, c_mm_j).
    * Computed ONCE per query row; scoring any code word is then m array
    * reads ([[pqAdc]]).
    */
  def pqLut(q: ArrayData, codebooks: Array[Double], dim: Int, m: Int,
            ks: Int): ArrayData = {
    val subdim = dim / m
    val n = q.numElements()
    val out = new Array[Double](m * ks)
    var mm = 0
    while (mm < m) {
      val qOff = mm * subdim
      var j = 0
      while (j < ks) {
        val cOff = ((mm * ks) + j) * subdim
        var s = 0.0
        var i = 0
        while (i < subdim) {
          s += (if (qOff + i < n) q.getDouble(qOff + i) else 0.0) *
            codebooks(cOff + i)
          i += 1
        }
        out(mm * ks + j) = s
        j += 1
      }
      mm += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Asymmetric-distance score: Σ_mm lut[mm*ks + codes[mm]] ≈ dot(q, x).
    * m table reads per candidate — the PQ scan's whole per-row cost.
    */
  def pqAdc(codes: ArrayData, lut: ArrayData, ks: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var mm = 0
    while (mm < m) { s += lut.getDouble(mm * ks + codes.getInt(mm)); mm += 1 }
    s
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

/** pq_encode(array<double>) → array<int> of `m` codebook ids (the PQ
  * compressed representation), codegen-resident; codebooks ride in
  * `references` so differently-trained plans share one compiled class.
  */
case class PqEncodeExpr(child: Expression, codebooks: Array[Double],
                        dim: Int, m: Int, ks: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.pqEncode(a.asInstanceOf[ArrayData], codebooks, dim, m, ks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernels.pqEncode($a, $cRef, $dim, $m, $ks)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** pq_lut(array<double>) → array<double> of m·ks partial dots (the
  * per-query ADC table), codegen-resident.
  */
case class PqLutExpr(child: Expression, codebooks: Array[Double],
                     dim: Int, m: Int, ks: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.pqLut(a.asInstanceOf[ArrayData], codebooks, dim, m, ks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernels.pqLut($a, $cRef, $dim, $m, $ks)")
  }
  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
}

/** pq_adc(codes array<int>, lut array<double>) → double approximate dot,
  * codegen-resident.
  */
case class PqAdcExpr(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.pqAdc($a, $b, $ks)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcExpr =
    copy(left = l, right = r)
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

  /** PQ codes (m ids into per-subspace codebooks) of an array<double>
    * column (codegen'd single-pass kernel).
    */
  def pq_encode(v: Column, codebooks: Array[Double], dim: Int, m: Int,
                ks: Int): Column =
    GraftColumnShim.column(PqEncodeExpr(
      GraftColumnShim.expression(v), codebooks, dim, m, ks))

  /** Per-query ADC lookup table as array<double> (codegen'd). */
  def pq_lut(q: Column, codebooks: Array[Double], dim: Int, m: Int,
             ks: Int): Column =
    GraftColumnShim.column(PqLutExpr(
      GraftColumnShim.expression(q), codebooks, dim, m, ks))

  /** Approximate dot from (codes, lut) — m array reads (codegen'd). */
  def pq_adc(codes: Column, lut: Column, ks: Int): Column =
    GraftColumnShim.column(PqAdcExpr(
      GraftColumnShim.expression(codes), GraftColumnShim.expression(lut), ks))
}
