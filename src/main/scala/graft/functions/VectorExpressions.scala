package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Analysis-time input validation shared by the binary array kernels:
  * a wrong-typed argument from `spark.sql` (these are registered as
  * SQL functions) must fail with a datatype-mismatch message, never a
  * runtime ClassCastException — or worse, a silent garbage read
  * (`getDouble` on 4-byte INT slots of an UnsafeArrayData returns
  * wrong bytes without throwing). Same contract as
  * [[HashKernelExpression]]. */
private[functions] object VectorTypeChecks {
  def twoArrays(fn: String, elem: DataType, l: DataType, r: DataType)
      : TypeCheckResult = (l, r) match {
    case (ArrayType(le, _), ArrayType(re, _)) if le == elem && re == elem =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$fn requires two ARRAY<${elem.simpleString}> inputs, got " +
        s"${l.simpleString} and ${r.simpleString}")
  }
}

/** Native Catalyst expression for the similarity-search hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is correct but runs as an
  * interpreted higher-order function per row — at 2M candidate pairs ×
  * 64 dims that dominates the ANN scan. This expression compiles the
  * dot product into whole-stage codegen as a tight loop.
  *
  * Accumulation is a strict left-to-right double sum — bit-identical
  * to both the HOF fold it replaces and DuckDB's `list_reduce`, so
  * oracle hash-parity is preserved.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeChecks.twoArrays(prettyName, DoubleType,
      left.dataType, right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two ARRAY<BIGINT> columns (the
  * fixed-point-quantized vectors the k-means family compares):
  * Σ (aᵢ−bᵢ)² as a codegen'd tight loop. Replaces the interpreted
  * `aggregate(zip_with(q, c, (a,b) => (a−b)²), 0L, _+_)` fold, which
  * allocates an intermediate ArrayData per row per centroid — with k
  * centroids × 64 dims that allocation dominated the assignment scan.
  * Integer arithmetic: exact, order-free, oracle-identical. */
case class QuantSquaredL2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quant_l2sq"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeChecks.twoArrays(prettyName, LongType,
      left.dataType, right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantSquaredL2 =
    copy(left = newLeft, right = newRight)
}

/** Σᵢ weights[idx[i]] over an ARRAY<BIGINT> index column and an
  * ARRAY<BIGINT> weight table (a broadcast-able literal): the
  * model-scoring primitive of the fixed-feature-table operators
  * (DSIR's 1024-bucket importance weights). Replaces the
  * explode → broadcast-join → per-doc re-aggregation shape with one
  * codegen'd per-row loop — the corpus-sized feature stream never
  * leaves its row. Out-of-range indices contribute 0 (the join form
  * dropped them; fixed feature tables cover their whole index space,
  * so the two forms agree). Integer sum: exact, order-free. */
case class SumLookup(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sum_lookup"
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeChecks.twoArrays(prettyName, LongType,
      left.dataType, right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val idx = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[ArrayData]
    val n = idx.numElements()
    val m = w.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val j = idx.getLong(i)
      if (j >= 0 && j < m) acc += w.getLong(j.toInt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $j = $a.getLong($i);
         |  if ($j >= 0 && $j < $m) $acc += $b.getLong((int) $j);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SumLookup =
    copy(left = newLeft, right = newRight)
}

/** Per-dimension integer sum of fixed-point-quantized vectors — the
  * centroid-accumulation aggregate of the k-means/centroid family:
  * buffer[d] += floor(v[d] · scale) over an ARRAY<DOUBLE> column.
  *
  * Replaces the posexplode → groupBy(label, dim) shape, which pushes
  * |rows|·dims exploded rows through a hash aggregate (32M updates at
  * the sf10 embeddings table) to produce k·dims cells. As a typed
  * buffer the update is one tight per-ROW loop, the partial
  * aggregation keeps one Array[Long] per group per partition, and the
  * shuffle moves k rows. Identical arithmetic: each element
  * contributes floor(v·scale) exactly once to an order-free integer
  * sum, so the result is bit-equal to the exploded form and the
  * DuckDB oracle. */
case class QuantVecSum(
    child: Expression,
    scale: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "quant_vec_sum"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  // only FLOAT and DOUBLE elements have a defined read below — any
  // other element type (e.g. ARRAY<INT>) would take the getDouble
  // branch and silently read garbage bytes from the unsafe buffer
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType | FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got " +
          other.simpleString)
    }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  // FLOAT arrays are read via getFloat then widened exactly as a
  // Cast(float→double) would — callers can pass the raw embedding
  // column without a per-row transform() HOF in the update path.
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    while (i < n) {
      val e = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      b(i) += math.floor(e * scale).toLong
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantVecSum =
    copy(child = newChild)
}

/** Static kernel behind [[Sq8Dequant]]. */
object VectorImpl {
  /** Affine SQ8 quantize→dequantize of a vector against per-dimension
    * [min, max] ranges: code = clamp₀²⁵⁵(⌊(x−mn)·256/(mx−mn)⌋) (0 on a
    * degenerate range), reconstructed to the bucket midpoint
    * mn + (code+0.5)·(mx−mn)/256 — the exact arithmetic of the
    * zip_with/element_at Column pipeline it replaces (which
    * interpreted a lambda and two array probes PER DIMENSION). Reads
    * FLOAT or DOUBLE input; the float→double cast is exact, matching
    * the asDouble projection the Column form required. */
  def sq8Dequant(v: ArrayData, mn: Array[Double], mx: Array[Double],
      isFloat: Boolean): ArrayData = {
    val n = math.min(v.numElements(), mn.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val lo = mn(i)
      val hi = mx(i)
      val code: Long =
        if (hi > lo) {
          val fl = math.floor((x - lo) * 256.0 / (hi - lo)).toLong
          math.min(255L, math.max(0L, fl))
        } else 0L
      out(i) = lo + (code.toDouble + 0.5) * ((hi - lo) / 256.0)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Static kernel behind [[PqEncode]]. */
object PqImpl {
  /** Product-quantization encode: quantize the vector to the 1e4
    * fixed-point grid (floor(toDouble·10⁴), exactly the
    * transform-to-BIGINT Column pipeline it replaces), then per
    * subspace pick the codebook entry with the smallest integer
    * squared L2 (ties to the lower code id) and emit the flat ADC
    * offset m·K + code. Codebook layout: cb[((m·K + k)·subDim) + d].
    * One tight per-row loop in place of an 8-way explode, a 128-row
    * broadcast join, and two aggregations per vector. */
  def encode(v: ArrayData, cb: Array[Long], m: Int, k: Int, subDim: Int,
      isFloat: Boolean): ArrayData = {
    // a short vector must FAIL, not zero-pad: silently encoding the
    // missing subspaces against an all-zero sub-vector produces wrong
    // codes that only surface as an unexplained oracle mismatch (the
    // SQL side's short-list slice NULLs out instead)
    val n = m * subDim
    require(v.numElements() == n,
      s"pq_encode expects $n-dim vectors (m=$m x subDim=$subDim), " +
        s"got ${v.numElements()}")
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      q(i) = math.floor(x * 10000.0).toLong
      i += 1
    }
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      var best = 0L
      var bestD = Long.MaxValue
      var ki = 0
      while (ki < k) {
        val base = (mi * k + ki) * subDim
        var d2 = 0L
        var d = 0
        while (d < subDim) {
          val diff = q(mi * subDim + d) - cb(base + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = ki.toLong }
        ki += 1
      }
      out(mi) = mi.toLong * k + best
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Static kernel behind [[IvfPqEncode]]. */
object IvfPqImpl {
  /** IVF-PQ encode — the whole index-build row transform in one pass:
    * quantize the vector to the 1e4 grid, assign it to the nearest of
    * `nlist` coarse centroids (integer squared L2, ties to the lower
    * cell id), subtract that centroid (the RESIDUAL — what the shared
    * PQ codebook is trained on, Jégou 2011 §IV.A), then per subspace
    * pick the codebook entry with the smallest integer squared L2
    * (ties to the lower code) and emit the flat ADC offset m·K + code.
    * Output layout: [cell, code₀, …, code_{m−1}] — element 0 is the
    * inverted-list key, the rest is the 8-byte PQ code the search
    * reads. Centroid layout: cents[cell·dim + d]; codebook layout:
    * cb[((m·K + k)·subDim) + d]. */
  def encode(v: ArrayData, cents: Array[Long], cb: Array[Long],
      nlist: Int, m: Int, k: Int, subDim: Int, isFloat: Boolean)
      : ArrayData = {
    val n = m * subDim
    require(v.numElements() == n,
      s"ivfpq_encode expects $n-dim vectors (m=$m x subDim=$subDim), " +
        s"got ${v.numElements()}")
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      q(i) = math.floor(x * 10000.0).toLong
      i += 1
    }
    // coarse assignment: strict < keeps the LOWEST cell id on ties
    var cell = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < nlist) {
      var d2 = 0L
      var d = 0
      while (d < n) {
        val diff = q(d) - cents(c * n + d)
        d2 += diff * diff
        d += 1
      }
      if (d2 < bestD) { bestD = d2; cell = c }
      c += 1
    }
    // residual in place
    i = 0
    while (i < n) { q(i) -= cents(cell * n + i); i += 1 }
    val out = new Array[Long](m + 1)
    out(0) = cell.toLong
    var mi = 0
    while (mi < m) {
      var best = 0L
      var bd = Long.MaxValue
      var ki = 0
      while (ki < k) {
        val base = (mi * k + ki) * subDim
        var d2 = 0L
        var d = 0
        while (d < subDim) {
          val diff = q(mi * subDim + d) - cb(base + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bd) { bd = d2; best = ki.toLong }
        ki += 1
      }
      out(mi + 1) = mi.toLong * k + best
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** IVF-PQ encode against flattened centroid + codebook literals —
  * [[IvfPqImpl.encode]]. Seqs for structural equality (the
  * [[Sq8Dequant]] canonicalization note). */
case class IvfPqEncode(child: Expression, centroids: Seq[Long],
    codebook: Seq[Long], nlist: Int, m: Int, k: Int, subDim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val ctA = centroids.toArray
  @transient private lazy val cbA = codebook.toArray
  private def isFloat = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override def prettyName: String = "ivfpq_encode"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        DoubleType | org.apache.spark.sql.types.FloatType, _)
        if centroids.length == nlist * m * subDim &&
          codebook.length == m * k * subDim =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case org.apache.spark.sql.types.ArrayType(
        DoubleType | org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName model shapes wrong: centroids ${centroids.length} " +
            s"!= nlist*dim ${nlist * m * subDim} or codebook " +
            s"${codebook.length} != m*k*subDim ${m * k * subDim}")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got " +
            other.simpleString)
    }
  override def nullSafeEval(v: Any): Any =
    IvfPqImpl.encode(v.asInstanceOf[ArrayData], ctA, cbA,
      nlist, m, k, subDim, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctRef = ctx.addReferenceObj("centroids", ctA, "long[]")
    val cbRef = ctx.addReferenceObj("codebook", cbA, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IvfPqImpl.encode(" +
        s"$c, $ctRef, $cbRef, $nlist, $m, $k, $subDim, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfPqEncode =
    copy(child = newChild)
}

/** PQ encode against a flattened codebook literal —
  * [[PqImpl.encode]]. The codebook is a Seq for structural equality
  * (the [[Sq8Dequant]] canonicalization note). */
case class PqEncode(child: Expression, codebook: Seq[Long],
    m: Int, k: Int, subDim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val cbA = codebook.toArray
  private def isFloat = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override def prettyName: String = "pq_encode"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        DoubleType | org.apache.spark.sql.types.FloatType, _)
        if codebook.length == m * k * subDim =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case org.apache.spark.sql.types.ArrayType(
        DoubleType | org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName codebook length ${codebook.length} != m*k*subDim")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got " +
            other.simpleString)
    }
  override def nullSafeEval(v: Any): Any =
    PqImpl.encode(v.asInstanceOf[ArrayData], cbA, m, k, subDim, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", cbA, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqImpl.encode(" +
        s"$c, $cbRef, $m, $k, $subDim, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** SQ8 quantize→dequantize against per-dimension [min, max] literals —
  * [[VectorImpl.sq8Dequant]]. Ranges are Seqs (not Arrays) so case-class
  * equality — and with it expression canonicalization — stays
  * structural. */
case class Sq8Dequant(child: Expression, mins: Seq[Double], maxs: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val mnA = mins.toArray
  @transient private lazy val mxA = maxs.toArray
  private def isFloat = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override def prettyName: String = "sq8_dequant"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        DoubleType | org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got " +
            other.simpleString)
    }
  override def nullSafeEval(v: Any): Any =
    VectorImpl.sq8Dequant(v.asInstanceOf[ArrayData], mnA, mxA, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("mins", mnA, "double[]")
    val mxRef = ctx.addReferenceObj("maxs", mxA, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorImpl.sq8Dequant(" +
        s"$c, $mnRef, $mxRef, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): Sq8Dequant =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column form: dot product of two ARRAY<DOUBLE> columns. */
  def arrayDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column form: squared L2 distance of two ARRAY<BIGINT> columns. */
  def quantL2Sq(a: Column, b: Column): Column =
    GraftSqlBridge.column(QuantSquaredL2(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Aggregate column form: per-dimension Σ floor(v[d]·scale) of an
    * ARRAY<DOUBLE> column as ARRAY<BIGINT>. */
  def quantVecSum(v: Column, scale: Double): Column =
    GraftSqlBridge.column(
      QuantVecSum(GraftSqlBridge.expression(v), scale)
        .toAggregateExpression())

  /** Column form: Σᵢ weights[idx[i]] of two ARRAY<BIGINT> columns. */
  def sumLookup(idx: Column, weights: Column): Column =
    GraftSqlBridge.column(SumLookup(
      GraftSqlBridge.expression(idx), GraftSqlBridge.expression(weights)))

  /** Column form: SQ8 quantize→dequantize of an ARRAY<FLOAT|DOUBLE>
    * column against per-dimension [min, max] model literals. */
  def sq8Dequant(v: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    GraftSqlBridge.column(Sq8Dequant(
      GraftSqlBridge.expression(v), mins, maxs))

  /** Column form: PQ encode of an ARRAY<FLOAT|DOUBLE> column against a
    * flattened codebook literal (cb[((m·K + k)·subDim) + d]) — emits
    * the M flat ADC offsets m·K + code as ARRAY<BIGINT>. */
  def pqEncode(v: Column, codebook: Seq[Long], m: Int, k: Int,
      subDim: Int): Column =
    GraftSqlBridge.column(PqEncode(
      GraftSqlBridge.expression(v), codebook, m, k, subDim))

  /** Column form: IVF-PQ encode (coarse cell + residual PQ codes) of
    * an ARRAY<FLOAT|DOUBLE> column — emits [cell, code₀, …] as
    * ARRAY<BIGINT>. */
  def ivfPqEncode(v: Column, centroids: Seq[Long], codebook: Seq[Long],
      nlist: Int, m: Int, k: Int, subDim: Int): Column =
    GraftSqlBridge.column(IvfPqEncode(
      GraftSqlBridge.expression(v), centroids, codebook,
      nlist, m, k, subDim))
}
