package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-width (columnar position) file parsing — the config-compiled
  * cousin of the CSV stage reader for the fixed-layout interchange
  * files common in healthcare feeds. A field spec list compiles to a
  * single substring/trim/cast projection over the raw line scan:
  * scan-local, fully codegen'd, no shuffle — the same "config compiles
  * to a declarative plan" discipline as the mapping projections
  * (reference analog: the per-practice layout configs,
  * SF_Notebooks/practice_ingest_config.json).
  */
object FixedWidthReader {

  /** 1-based `start`, byte `len`; `typ` is any castable Spark type
    * name. Values are trimmed before the cast (fixed-width pads with
    * spaces). */
  final case class FieldSpec(name: String, start: Int, len: Int,
      typ: String = "string")

  /** Compile the layout into a projection over `lineCol` of `lines`. */
  def parse(lines: DataFrame, lineCol: String,
      fields: Seq[FieldSpec]): DataFrame = {
    require(fields.nonEmpty, "empty fixed-width layout")
    fields.foreach(f => require(f.start >= 1 && f.len >= 1,
      s"bad field spec $f"))
    lines.select(fields.map(f =>
      trim(substring(col(lineCol), f.start, f.len)).cast(f.typ)
        .as(f.name)): _*)
  }

  /** Render rows into fixed-width lines (inverse, for sinks/tests):
    * string-casts each column and right-pads to its width. Values wider
    * than the field are rejected at runtime (overflow would silently
    * corrupt neighboring fields). */
  def render(df: DataFrame, fields: Seq[FieldSpec]): DataFrame = {
    val parts = fields.map { f =>
      val s = col(f.name).cast("string")
      when(length(s) > f.len,
        raise_error(concat(lit(s"fixed-width overflow in ${f.name}: "), s)))
        .otherwise(rpad(s, f.len, " "))
    }
    df.select(concat(parts: _*).as("value"))
  }
}
