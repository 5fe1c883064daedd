package graft.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapred.FileSplit
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetInputFormat
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Vectorized (ColumnarBatch) read path for the graft DSv2 connector —
  * the 100 TB read path's hot loop.
  *
  * The row-based [[GraftRowReader]] decodes via parquet-mr's example
  * `Group` API: every value boxes, every record allocates a
  * `GenericInternalRow`, and the scan opts out of Spark's columnar
  * whole-stage codegen. This reader instead drives Spark's own
  * `VectorizedParquetRecordReader` — batched columnar decode straight
  * into `WritableColumnVector`s, delivered as `ColumnarBatch`es that
  * keep the plan on the `ColumnarToRow`/columnar-codegen path, exactly
  * like Spark's built-in parquet scan.
  *
  * Engaged ONLY when the whole scan qualifies (Spark's DSv2 contract
  * forbids mixing row and columnar partitions in one scan):
  *  - no outstanding deletion vectors on any scheduled file — the DV
  *    sorted-pointer skip needs per-record row indexes, which batched
  *    decode does not surface (a DV'd table reads via the row path
  *    until compaction settles the masks);
  *  - no synthesized `_gfile`/`_gpos` metadata columns (row-level ops
  *    need per-record addresses);
  *  - no metadata-answered aggregate (that path emits one local row).
  *
  * Pushed filters still reach parquet-mr through the conf
  * ([[ParquetInputFormat.setFilterPredicate]]), so row-group stats and
  * dictionary skipping happen BELOW the batched decode; Spark
  * re-applies every filter row-level above (all filters stay residual,
  * the connector's standing contract). */
class GraftColumnarReader(path: String, schema: StructType, limit: Int,
    filters: Array[Filter] = Array.empty,
    partValues: Seq[(String, Option[String])] = Seq.empty,
    hadoopConf: Configuration = new Configuration())
    extends PartitionReader[ColumnarBatch] {

  // hive-partitioned files: path-encoded columns come back as the
  // vectorized reader's CONSTANT partition vectors (initBatch), and a
  // zero-copy column permutation restores the scan's declared order
  // (the reader appends partition vectors after the data columns)
  private val partMap = partValues.toMap
  private val dataFields = schema.fields.filterNot(f => partMap.contains(f.name))
  private val partFields = schema.fields.filter(f => partMap.contains(f.name))
  private val dataSchema = StructType(dataFields)
  // output position i ← underlying batch column outPerm(i)
  private val outPerm: Array[Int] = {
    val dataIdx = dataFields.map(_.name).zipWithIndex.toMap
    val partIdx = partFields.map(_.name).zipWithIndex.toMap
    schema.fields.map(f => dataIdx.get(f.name)
      .getOrElse(dataFields.length + partIdx(f.name)))
  }
  private val needsPerm = !outPerm.zipWithIndex.forall { case (p, i) => p == i }

  private val reader: VectorizedParquetRecordReader = {
    val conf = hadoopConf // driver's conf, shipped (fs creds/endpoints)
    // the conf keys SpecificParquetRecordReaderBase.initialize reads:
    // Spark's ParquetReadSupport clips the file schema to the
    // requested Catalyst schema (nested pruning included); columns the
    // file lacks (evolved chains) come back as null vectors
    conf.set(ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, dataSchema.json)
    conf.setBoolean("spark.sql.caseSensitive", false)
    conf.setBoolean("spark.sql.parquet.binaryAsString", false)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    // ParquetToSparkSchemaConverter(conf) does a raw .toBoolean on this
    // key (no default) — the catalog never writes NANOS timestamps
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    conf.setBoolean("spark.sql.optimizer.nestedSchemaPruning.enabled", true)
    // row-group stats + dictionary skipping below the decode; the
    // translation is conservative (see GraftParquetIO.toParquetFilter)
    // and Spark re-applies every residual above
    if (filters.nonEmpty)
      GraftParquetIO.toParquetFilter(filters.toSeq,
          GraftParquetIO.fileSchema(path, conf))
        .foreach(ParquetInputFormat.setFilterPredicate(conf, _))
    val p = new Path(path)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    // rebase modes CORRECTED: the catalog writes Spark-4 parquet
    // (proleptic-Gregorian micros); no pre-1582 legacy data exists
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, /* capacity = */ 4096)
    r.initialize(new FileSplit(p, 0, len, Array.empty[String]),
      new TaskAttemptContextImpl(conf, new TaskAttemptID()))
    val partRow: InternalRow =
      if (partFields.isEmpty) InternalRow.empty
      else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        partFields.map(f =>
          GraftPartitions.castValue(partMap(f.name), f.dataType)))
    r.initBatch(StructType(partFields), partRow)
    r.enableReturningBatches()
    r
  }

  private var batch: ColumnarBatch = _
  private var emitted = 0L

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false // partial pushdown:
    // Spark applies the exact limit above; stopping early just saves IO
    if (!reader.nextKeyValue()) return false
    val underlying = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
    batch =
      if (!needsPerm) underlying
      else new ColumnarBatch( // zero-copy vector re-order
        outPerm.map(underlying.column), underlying.numRows())
    emitted += batch.numRows()
    true
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = reader.close()
}
