package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native signed-random-hyperplane LSH bucketing.
  *
  * The hyperplane component for (seed table t, bit i, dim d) is derived
  * from an ENGINE-REPLICABLE 31-bit LCG (integer arithmetic mod 2^31,
  * then an exact-by-powers-of-two division to [-0.5, 0.5)), so the DuckDB
  * oracle can regenerate the identical planes and buckets in plain SQL.
  * Bucket bit i = sign of the projection onto plane i. Sign decisions are
  * robust to summation-order noise (|proj| is O(0.1), float noise 1e-16).
  */
object HyperplaneImpl {

  private final val M31 = 0x7FFFFFFFL + 1L // 2^31

  /** Max supported vector dimension: the weight key packs (seed, bit,
    * dim) with a dim stride of 4096, so dim >= 4096 would alias
    * (bit i, dim d) with (bit i+1, d-4096) and correlate adjacent plane
    * bits. Enforced at eval (the stride is part of the frozen oracle
    * mirror — widening it would silently change every bucket).
    */
  final val MaxDim = 4096

  /** Plane weight in [-0.5, 0.5): exact-integer LCG then /2^31 (exact). */
  def weight(seed: Int, bit: Int, dim: Int): Double = {
    val key = seed.toLong * 1000003L + bit.toLong * 4096L + dim.toLong
    SimHashImpl.mix31(key % M31).toDouble / 2147483648.0 - 0.5
  }

  def bucket(v: ArrayData, isFloat: Boolean, bits: Int, seed: Int): Long = {
    val n = v.numElements()
    if (n >= MaxDim) throw new IllegalArgumentException(
      s"hyperplane_bucket supports dim < $MaxDim (weight-key packing " +
        s"stride); got $n")
    var out = 0L
    var i = 0
    while (i < bits) {
      var proj = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        proj += x * weight(seed, i, d)
        d += 1
      }
      if (proj >= 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** hyperplane_bucket(vec, bits, seed) → long bucket id. */
case class HyperplaneBucket(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def prettyName: String = "hyperplane_bucket"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, literal int, literal int)")
    }

  override def nullSafeEval(v: Any, b: Any, s: Any): Any =
    HyperplaneImpl.bucket(v.asInstanceOf[ArrayData], isFloat,
      b.asInstanceOf[Int], s.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, s) =>
      s"${ev.value} = graft.expressions.HyperplaneImpl.bucket($v, $isFloat, $b, $s);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}
