package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, NullType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built bloom filter over a long key
  * column. `right` must be a foldable BINARY literal holding the
  * serialized `org.apache.spark.util.sketch.BloomFilter` (as produced by
  * `DataFrame.stat.bloomFilter(...).writeTo`).
  *
  * The filter deserializes once per JVM (transient lazy) and the probe
  * participates in whole-stage codegen, so the predicate runs inside the
  * parquet scan stage — the same shape Spark's own runtime bloom-filter
  * join pruning (`BloomFilterMightContain`) uses, but available as an
  * explicit, deterministic operator (see [[graft.operators.BloomJoin]]).
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = {
    def okKey(t: DataType) = t == LongType || t == NullType
    def okBits(t: DataType) = t == BinaryType || t == NullType
    if (okKey(left.dataType) && okBits(right.dataType) && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires (bigint, foldable binary), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    filter.mightContainLong(l.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
