package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) key over two dimension columns: interleaves the low
  * 32 bits of each input so that rows close in BOTH dimensions get
  * close keys. Sorting / range-partitioning a table by this key
  * clusters 2-D locality into the same files and row groups, so a scan
  * with predicates on either (or both) dimensions skips most of the
  * layout via ordinary parquet min/max stats — the multi-dimensional
  * clustering trick published for data-lake table formats, as a plain
  * column expression.
  *
  * Why an Expression: the interleave is 10 shift-mask steps of 64-bit
  * integer math per row. Composed from built-in bit functions it is an
  * ~80-node expression tree re-evaluated per reference; here it
  * compiles into whole-stage codegen as straight-line Java (the
  * classic magic-number bit spread). The file-level pruning effect is
  * asserted quantitatively in ZOrderKeySpec.
  *
  * Contract: inputs are LongType holding values in [0, 2^32); callers
  * normalize first (rank, scale, or truncate — the catalog entry uses
  * day numbers and key ids). Bits above 32 are ignored. Null in either
  * dimension → null key (BinaryExpression default).
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_order2 expects (bigint, bigint), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "z_order2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrderKey.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Spread the low 32 bits of v onto the even bit positions of a long
    * (standard magic-number Morton spread). */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** x on even bits, y on odd bits. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
