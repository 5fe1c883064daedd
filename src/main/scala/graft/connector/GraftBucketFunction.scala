package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's V2 `bucket` function — what lets Spark RESOLVE the
  * bucket transform that [[GraftScan]] reports for bucketed tables
  * (`V2ExpressionUtils` looks `bucket` up on the relation's
  * `FunctionCatalog`) and so plan storage-partitioned joins over
  * them. Bucket id = floorMod(murmur3(value, seed 42), n) — BIT-FOR-
  * BIT the writer's routing expression `pmod(hash(col), n)` (Spark's
  * `hash` is murmur3 seed 42 and skips nulls, leaving the seed), so
  * a side shuffled INTO the layout by this function
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`) co-locates
  * exactly with rows the writer placed. */
object GraftBucketFunction extends UnboundFunction {

  /** Bucket id of an EXTERNAL (pushed-filter literal) value — the
    * scan's bucket-pruning hash, same bits as `produceResult`. */
  def bucketIdOf(value: Any, dt: DataType, n: Int): Int =
    bucketIdInternal(
      if (value == null) null
      else org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToCatalyst(value), dt, n)

  /** Bucket id of a Catalyst-INTERNAL value — the executor-side
    * routing hash the DSv2 partitioned writer uses. */
  def bucketIdInternal(value: Any, dt: DataType, n: Int): Int = {
    val h =
      if (value == null) 42
      else org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(value, dt, 42L).toInt
    java.lang.Math.floorMod(h, n)
  }

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): graft's hive-layout bucket id " +
      "(floorMod(murmur3_42(col), numBuckets))"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, col), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"numBuckets must be INT, got ${inputType.fields(0).dataType}")
    inputType.fields(1).dataType match {
      // common join-key types carry a MAGIC `invoke` (named PUBLIC
      // classes — commons' getMatchingAccessibleMethod ignores
      // methods declared only on non-public/anonymous classes):
      // Spark compiles it as a codegen'd Invoke instead of boxing
      // every row through produceResult — the hot path when the
      // planner shuffles a 100 TB unbucketed side INTO the bucket
      // layout (one-sided SPJ). Null keys can't reach invoke there
      // (equi-joins filter isnotnull before the exchange); the
      // produceResult fallback keeps the writer's null routing.
      case LongType    => new BucketLong
      case IntegerType => new BucketInt
      case StringType  => new BucketString
      case dt          => new BucketBound(dt) // produceResult only
    }
  }

  class BucketLong extends BucketBound(LongType) {
    def invoke(n: Int, v: Long): Int = java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(v, LongType, 42L).toInt, n)
  }
  class BucketInt extends BucketBound(IntegerType) {
    def invoke(n: Int, v: Int): Int = java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(v, IntegerType, 42L).toInt, n)
  }
  class BucketString extends BucketBound(StringType) {
    def invoke(n: Int, v: org.apache.spark.unsafe.types.UTF8String): Int =
      java.lang.Math.floorMod(
        org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(v, StringType, 42L).toInt, n)
  }

  /** Bound `bucket` for one key type; subclasses add the typed magic
    * `invoke`. produceResult stays the null-handling fallback. */
  class BucketBound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${dt.sql})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      // null key: Spark's hash() leaves the seed untouched
      val h =
        if (input.isNullAt(1)) 42
        else org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(input.get(1, dt), dt, 42L).toInt
      Integer.valueOf(java.lang.Math.floorMod(h, n))
    }
  }
}
