package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) interleaving of two 32-bit keys — the standard
  * multi-dimensional clustering code (bit-spread via binary magic
  * numbers, a classic public bit-twiddling identity; the layout
  * technique itself is what lakehouse OPTIMIZE/ZORDER commands use).
  *
  * Both dimensions are sign-flipped before spreading and the result's
  * top bit is flipped back, so SIGNED `Long` comparison of the code
  * agrees with unsigned Morton order — i.e. the code is monotone in
  * each dimension with the other held fixed, across negative values
  * too. That monotonicity is exactly what makes per-file min/max
  * footer stats selective after range-partitioning by the code: a box
  * predicate on (a, b) can only match files whose per-dimension
  * [min, max] intervals intersect the box.
  */
object Morton {
  /** Spread the 32 bits of x into the even bit positions of a long. */
  def spread(x: Int): Long = {
    var v = x.toLong & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Inverse of [[spread]]: gather the even bit positions back into an int. */
  def compact(v: Long): Int = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x.toInt
  }

  /** Z-code of (a, b); signed-Long order == Morton order (see above). */
  def interleave(a: Int, b: Int): Long = {
    val raw = (spread(a ^ Int.MinValue) << 1) | spread(b ^ Int.MinValue)
    raw ^ Long.MinValue
  }

  def deinterleaveA(z: Long): Int = compact((z ^ Long.MinValue) >>> 1) ^ Int.MinValue
  def deinterleaveB(z: Long): Int = compact(z ^ Long.MinValue) ^ Int.MinValue
}

/** `zorder2(a, b)`: codegen'd Morton code of two int columns, for use as
  * a multi-dimensional cluster key in `Maintenance.clusterParquetByKey`.
  * Int32 only by design — silently truncating a 64-bit key would break
  * the monotonicity the layout depends on, so wider keys must be
  * explicitly bucketed/cast by the caller.
  */
case class ZOrderLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"zorder2 expects two int arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.Morton.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderLong =
    copy(left = newLeft, right = newRight)
}
