package graft.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side parquet record reading for the [[GraftSource]]
  * DataSource V2 connector: opens one catalog data file with a
  * COLUMN-PRUNED requested schema (parquet-hadoop reads only the
  * projected columns' pages — the pruning is physical, not cosmetic)
  * and converts `Group` records to `InternalRow`.
  *
  * Runs per-file inside a `PartitionReader`, so the only state is the
  * open reader — no Spark session, no driver round-trips. Record order
  * is parquet physical order (row groups then rows in order), which is
  * the contract that makes the running row counter equal
  * `_metadata.row_index` — the address space the catalog's deletion
  * vectors mask. Supported Spark types cover everything the catalog
  * writes from the test tables (bool/int/long/float/double/string/
  * binary/date/timestamp + arrays of primitives); decimals and nested
  * structs fail loudly rather than silently miscoding.
  */
object GraftParquetIO {

  /** Footer schema of a parquet file (driver- or executor-side; one
    * footer read, no data pages). */
  def fileSchema(path: String, conf: Configuration): MessageType = {
    val rd = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    try rd.getFooter.getFileMetaData.getSchema finally rd.close()
  }

  /** Projection of `full` keeping only `names`, in `names` order.
    * Names ABSENT from the file are skipped — an evolved chain's
    * older files simply lack the newer columns, which the record
    * converter then reads as null (schema-union semantics). A file
    * containing NONE of the names degrades to its first column
    * (record boundaries still needed). */
  def projectSchema(full: MessageType, names: Seq[String]): MessageType = {
    val kept = names.filter(full.containsField)
      .map(n => full.getType(full.getFieldIndex(n)))
    val b = Types.buildMessage()
    if (kept.isEmpty) b.addField(full.getFields.get(0))
    else kept.foreach(b.addField)
    b.named(full.getName)
  }

  /** Clip one file type to the requested Spark shape: a struct keeps
    * only the requested subfields (recursive — PHYSICAL prune-into-
    * struct, unrequested leaves' pages are never decompressed);
    * primitives/lists pass through whole. */
  private def clipType(fileType: Type, dt: DataType): Type = dt match {
    case st: StructType if !fileType.isPrimitive &&
        fileType.getLogicalTypeAnnotation == null => // plain group = struct
      val g = fileType.asGroupType()
      val kept = st.fields.toSeq
        .filter(f => g.containsField(f.name))
        .map(f => clipType(g.getType(g.getFieldIndex(f.name)), f.dataType))
      if (kept.isEmpty) fileType // degenerate: nothing requested exists
      else {
        val gb = Types.buildGroup(g.getRepetition)
        kept.foreach(gb.addField)
        gb.named(g.getName)
      }
    case _ => fileType
  }

  /** [[projectSchema]] shaped by a Spark StructType — required for
    * nested columns, where the projection must descend INTO structs
    * (Spark's nested schema pruning hands the scan a struct holding
    * only the referenced subfields). */
  def projectSchemaFor(full: MessageType, required: StructType): MessageType = {
    val kept = required.fields.toSeq
      .filter(f => full.containsField(f.name))
      .map(f => clipType(full.getType(full.getFieldIndex(f.name)), f.dataType))
    val b = Types.buildMessage()
    if (kept.isEmpty) b.addField(full.getFields.get(0))
    else kept.foreach(b.addField)
    b.named(full.getName)
  }

  /** [[openReader]] with a Spark-shaped projection (nested pruning).
    * `range` restricts the read to the byte window [start, end) — a
    * row group belongs to the window containing its midpoint
    * (parquet's split contract), which is how large files scan as
    * multiple tasks. Callers relying on the running row counter as
    * `_metadata.row_index` must pass whole-file ranges only. */
  def openReaderFor(path: String, conf: Configuration, required: StructType,
      filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate] = None,
      range: Option[(Long, Long)] = None)
      : ParquetReader[Group] = {
    val full = fileSchema(path, conf)
    val proj =
      if (required.isEmpty) projectSchema(full, Seq.empty)
      else projectSchemaFor(full, required)
    val c = new Configuration(conf)
    c.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
    var b = ParquetReader.builder(new GroupReadSupport(), new Path(path))
      .withConf(c)
    range.foreach { case (s, e) => b = b.withFileRange(s, e) }
    filter.map(f => b.withFilter(
        org.apache.parquet.filter2.compat.FilterCompat.get(f)))
      .getOrElse(b).build()
  }

  /** Open a Group reader over `path` restricted to `names` (empty =
    * all columns — a COUNT(*)-shaped scan still needs record
    * boundaries, so project the first column). An optional parquet
    * [[FilterPredicate]] engages ROW-GROUP statistics skipping,
    * dictionary filtering and record-level filtering inside
    * parquet-hadoop itself — pages of non-matching row groups are
    * never decompressed. CALLERS MUST NOT pass a filter when they rely
    * on the running row counter matching `_metadata.row_index` (DV
    * masking): filtered readers renumber survivors. */
  def openReader(path: String, conf: Configuration, names: Seq[String],
      filter: Option[org.apache.parquet.filter2.predicate.FilterPredicate] = None)
      : ParquetReader[Group] = {
    val full = fileSchema(path, conf)
    val proj =
      if (names.isEmpty) projectSchema(full, Seq(full.getFields.get(0).getName))
      else projectSchema(full, names)
    val c = new Configuration(conf)
    c.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
    val b = ParquetReader.builder(new GroupReadSupport(), new Path(path))
      .withConf(c)
    filter.map(f => b.withFilter(
        org.apache.parquet.filter2.compat.FilterCompat.get(f)))
      .getOrElse(b).build()
  }

  /** Best-effort translation of Spark source filters to a parquet
    * [[FilterPredicate]] over `schema`'s physical types. Conjunctions
    * may drop untranslatable legs (weaker filter = safe — Spark
    * re-applies every residual); disjunctions translate only whole.
    * Strings push equality/IN only (parquet compares binaries
    * unsigned-lexicographically, which disagrees with Spark's UTF-16
    * ordering on supplementary characters — range pushes would be
    * unsound). Micros timestamps push exactly (the catalog's write
    * format); other timestamp units stay excluded. */
  def toParquetFilter(filters: Seq[org.apache.spark.sql.sources.Filter],
      schema: MessageType)
      : Option[org.apache.parquet.filter2.predicate.FilterPredicate] = {
    import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
    import org.apache.spark.sql.sources._

    sealed trait Cmp
    case object OpEq extends Cmp; case object OpGt extends Cmp
    case object OpGe extends Cmp; case object OpLt extends Cmp
    case object OpLe extends Cmp

    def physical(name: String): Option[PrimitiveType] =
      if (!schema.containsField(name)) None
      else {
        val t = schema.getType(schema.getFieldIndex(name))
        if (t.isPrimitive) Some(t.asPrimitiveType()) else None
      }
    def longVal(v: Any): Option[java.lang.Long] = v match {
      case n: Byte => Some(n.toLong); case n: Short => Some(n.toLong)
      case n: Int => Some(n.toLong); case n: Long => Some(n)
      case _ => None
    }
    def microsVal(v: Any): Option[java.lang.Long] = v match {
      case t: java.sql.Timestamp => Some(
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
      case i: java.time.Instant => Some(
        i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case l: java.time.LocalDateTime => Some(
        l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          l.getNano / 1000L)
      case _ => None
    }
    def intVal(v: Any): Option[java.lang.Integer] = v match {
      case n: Byte => Some(n.toInt); case n: Short => Some(n.toInt)
      case n: Int => Some(n)
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
      case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
      case _ => None
    }
    def intLike(ann: LogicalTypeAnnotation): Boolean = ann == null ||
      ann.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation] ||
      ann.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]

    def cmp(name: String, v: Any, op: Cmp): Option[FilterPredicate] =
      physical(name).flatMap { pt =>
        (pt.getPrimitiveTypeName, pt.getLogicalTypeAnnotation) match {
          case (INT64, ann) if intLike(ann) => longVal(v).map { x =>
            val c = FilterApi.longColumn(name)
            op match {
              case OpEq => FilterApi.eq(c, x); case OpGt => FilterApi.gt(c, x)
              case OpGe => FilterApi.gtEq(c, x); case OpLt => FilterApi.lt(c, x)
              case OpLe => FilterApi.ltEq(c, x)
            }
          }
          case (INT32, ann) if intLike(ann) => intVal(v).map { x =>
            val c = FilterApi.intColumn(name)
            op match {
              case OpEq => FilterApi.eq(c, x); case OpGt => FilterApi.gt(c, x)
              case OpGe => FilterApi.gtEq(c, x); case OpLt => FilterApi.lt(c, x)
              case OpLe => FilterApi.ltEq(c, x)
            }
          }
          // micros timestamps (the catalog's write format): the
          // predicate value converts exactly to the physical int64
          case (INT64, ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
              if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS =>
            microsVal(v).map { x =>
              val c = FilterApi.longColumn(name)
              op match {
                case OpEq => FilterApi.eq(c, x); case OpGt => FilterApi.gt(c, x)
                case OpGe => FilterApi.gtEq(c, x); case OpLt => FilterApi.lt(c, x)
                case OpLe => FilterApi.ltEq(c, x)
              }
            }
          case (DOUBLE, _) => (v match {
            case n: Double => Some(java.lang.Double.valueOf(n))
            case n: Float => Some(java.lang.Double.valueOf(n.toDouble))
            case _ => None
          }).map { x =>
            val c = FilterApi.doubleColumn(name)
            op match {
              case OpEq => FilterApi.eq(c, x); case OpGt => FilterApi.gt(c, x)
              case OpGe => FilterApi.gtEq(c, x); case OpLt => FilterApi.lt(c, x)
              case OpLe => FilterApi.ltEq(c, x)
            }
          }
          case (FLOAT, _) => (v match {
            case n: Float => Some(java.lang.Float.valueOf(n))
            case _ => None
          }).map { x =>
            val c = FilterApi.floatColumn(name)
            op match {
              case OpEq => FilterApi.eq(c, x); case OpGt => FilterApi.gt(c, x)
              case OpGe => FilterApi.gtEq(c, x); case OpLt => FilterApi.lt(c, x)
              case OpLe => FilterApi.ltEq(c, x)
            }
          }
          case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation)
              if op == OpEq => (v match {
            case s: String => Some(s)
            case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
            case _ => None
          }).map(s => FilterApi.eq(FilterApi.binaryColumn(name),
            org.apache.parquet.io.api.Binary.fromString(s)))
          case _ => None
        }
      }

    // `strict` = the translation must be exact (OR legs); under AND,
    // dropping a leg is safe
    def convert(f: Filter, strict: Boolean): Option[FilterPredicate] = f match {
      case EqualTo(c, v)            => cmp(c, v, OpEq)
      case GreaterThan(c, v)        => cmp(c, v, OpGt)
      case GreaterThanOrEqual(c, v) => cmp(c, v, OpGe)
      case LessThan(c, v)           => cmp(c, v, OpLt)
      case LessThanOrEqual(c, v)    => cmp(c, v, OpLe)
      case In(c, vs) if vs.nonEmpty =>
        val legs = vs.toSeq.map(v => cmp(c, v, OpEq))
        if (legs.exists(_.isEmpty)) None
        else Some(legs.flatten.reduce(FilterApi.or))
      case And(l, r) =>
        (convert(l, strict), convert(r, strict)) match {
          case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
          case (one, other) if !strict => one.orElse(other)
          case _ => None
        }
      case Or(l, r) =>
        for { a <- convert(l, strict = true); b <- convert(r, strict = true) }
          yield FilterApi.or(a, b)
      case _ => None
    }

    val legs = filters.flatMap(convert(_, strict = false))
    legs.reduceOption(FilterApi.and)
  }

  private val JulianEpochDay = 2440588L // 1970-01-01 as julian day number

  /** INT96 timestamp: 8 LE bytes nanos-of-day + 4 LE bytes julian day
    * → micros since epoch (how Spark's legacy parquet timestamps
    * encode). */
  private def int96Micros(bytes: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = bb.getLong
    val julianDay = bb.getInt.toLong
    (julianDay - JulianEpochDay) * 86400000000L + nanosOfDay / 1000L
  }

  private def timestampMicros(g: Group, idx: Int, pt: PrimitiveType): Long =
    pt.getPrimitiveTypeName match {
      case INT96 => int96Micros(g.getInt96(idx, 0).getBytes)
      case INT64 =>
        val raw = g.getLong(idx, 0)
        pt.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => raw * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => raw
              case LogicalTypeAnnotation.TimeUnit.NANOS  => raw / 1000L
            }
          case _ => raw // bare INT64: assume micros
        }
      case other =>
        throw new UnsupportedOperationException(
          s"timestamp physical type $other")
    }

  /** One leaf value from a (possibly repeated-list element) position. */
  private def primitive(g: Group, idx: Int, rep: Int, dt: DataType,
      pt: PrimitiveType): Any = dt match {
    case LongType => pt.getPrimitiveTypeName match {
      case INT32 => g.getInteger(idx, rep).toLong
      case _     => g.getLong(idx, rep)
    }
    case IntegerType | DateType => g.getInteger(idx, rep)
    case ShortType   => g.getInteger(idx, rep).toShort
    case ByteType    => g.getInteger(idx, rep).toByte
    case DoubleType  => g.getDouble(idx, rep)
    case FloatType   => g.getFloat(idx, rep)
    case BooleanType => g.getBoolean(idx, rep)
    case StringType  => UTF8String.fromBytes(g.getBinary(idx, rep).getBytes)
    case BinaryType  => g.getBinary(idx, rep).getBytes
    case TimestampType | TimestampNTZType =>
      require(rep == 0, "repeated timestamps unsupported")
      timestampMicros(g, idx, pt)
    case other =>
      throw new UnsupportedOperationException(
        s"graft connector: unsupported type $other (project it away or " +
          "read via TableCatalog.read)")
  }

  /** Spark-written 3-level list: `optional group f (LIST) { repeated
    * group list { optional elem element } }`. */
  private def listValue(g: Group, idx: Int, et: DataType): ArrayData = {
    val lg = g.getGroup(idx, 0).asInstanceOf[Group]
    val n = lg.getFieldRepetitionCount(0)
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      val elemHolder = lg.getGroup(0, j).asInstanceOf[Group]
      out(j) =
        if (elemHolder.getFieldRepetitionCount(0) == 0) null
        else {
          val ept = elemHolder.getType.getType(0).asPrimitiveType()
          primitive(elemHolder, 0, 0, et, ept)
        }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** One field's Spark value from a Group record (name lookup; a
    * column the file predates reads as null — schema union). */
  def valueOf(g: Group, f: StructField): Any = {
    val gt: GroupType = g.getType
    if (!gt.containsField(f.name)) return null
    val idx = gt.getFieldIndex(f.name)
    if (g.getFieldRepetitionCount(idx) == 0) null
    else f.dataType match {
      case ArrayType(et, _) => listValue(g, idx, et)
      case st: StructType => // nested group → InternalRow (recursive)
        structRow(g.getGroup(idx, 0).asInstanceOf[Group], st)
      case dt =>
        val ft = gt.getType(idx)
        require(ft.isPrimitive, s"nested column ${f.name} unsupported")
        primitive(g, idx, 0, dt, ft.asPrimitiveType())
    }
  }

  private def structRow(g: Group, st: StructType): InternalRow = {
    val vals = new Array[Any](st.length)
    var i = 0
    while (i < st.length) { vals(i) = valueOf(g, st(i)); i += 1 }
    new GenericInternalRow(vals)
  }

  /** Convert one Group record to an InternalRow shaped by `schema`
    * (field lookup by name — the projection may reorder columns
    * relative to the file). */
  def toInternalRow(g: Group, schema: StructType): InternalRow = {
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      vals(i) = valueOf(g, schema(i))
      i += 1
    }
    new GenericInternalRow(vals)
  }

  /** Driver-side small-file read (DV sidecars: columns `file` string,
    * `row_index` long) — metadata-sized, no Spark job at planning
    * time. Returns (file, row_index) pairs. */
  def readDvPairs(paths: Seq[String], conf: Configuration): Seq[(String, Long)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    paths.foreach { p =>
      val rd = openReader(p, conf, Seq("file", "row_index"))
      try {
        var g = rd.read()
        while (g != null) {
          val gt = g.getType
          buf += ((g.getBinary(gt.getFieldIndex("file"), 0).toStringUsingUTF8,
            g.getLong(gt.getFieldIndex("row_index"), 0)))
          g = rd.read()
        }
      } finally rd.close()
    }
    buf.toSeq
  }
}
