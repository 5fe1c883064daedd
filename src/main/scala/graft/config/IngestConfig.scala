package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Case-class model of the engine's declarative ingest config.
  *
  * Mirrors the shape of the reference's practice config
  * (reference: SF_Notebooks/practice_ingest_config.json — practices[] ×
  * ingest[] with source / precheck / snowflake{transform,curated,sync}
  * blocks), re-expressed as a typed Scala model parsed with Jackson's
  * tree API (no reflection, no extra dependencies beyond Spark's own
  * jackson jars).
  *
  * Fields whose config value is the literal "N/A" are treated as absent
  * (reference: SF_Notebooks/RAW_ADLS_TO_RAW_SNOWFLAKE.py:651-660).
  */
final case class EngineConfig(
    practices: Seq[Practice],
    archiveNotificationUrl: Option[String])

final case class Practice(
    practiceName: String,
    displayName: Option[String],
    siteServiceKey: Option[String],
    ingest: Seq[IngestSpec])

final case class IngestSpec(
    fileType: String,
    sourceType: String, // file | query | api
    source: SourceSpec,
    archive: Option[PathSpec],
    error: Option[PathSpec],
    precheck: Option[PrecheckSpec],
    target: TargetSpec)

final case class SourceSpec(
    container: Option[String],
    directory: Option[String],
    filePattern: Option[String],
    delimiter: String,
    header: Boolean,
    columns: Seq[String], // fixed schema for headerless files
    query: Option[String],
    api: Map[String, String])

final case class PathSpec(container: String, directory: String)

final case class PrecheckSpec(
    expectedColumns: Seq[String],
    minRowCount: Long,
    maxRowCount: Option[Long],
    requireAllColumns: Boolean,
    allowExtraColumns: Boolean,
    caseSensitiveHeaders: Boolean)

/** RAW/REFINED/CURATED table targets + transform/sync specs. */
final case class TargetSpec(
    rawTable: Option[String], // db.schema.table
    loadMode: String, // append | overwrite
    refinedTable: Option[String],
    regexReplace: Seq[RegexReplaceSpec],
    reformat: Seq[ReformatSpec],
    columnStrip: Seq[StripSpec],
    curatedTable: Option[String],
    curatedMapping: Seq[MappingSpec],
    curatedLookup: Option[LookupSpec],
    sourceFilter: Seq[FilterSpec],
    sync: Option[SyncSpec])

/** Chained conditional regex rewrite of one column.
  * reference: RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:412-473 */
final case class RegexReplaceSpec(column: String, rules: Seq[RegexRule])
final case class RegexRule(matchSubstring: Option[String], search: String, replace: String)

/** split → reorder parts → join (provider "Last, First" → "First Last").
  * reference: RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:478-541 */
final case class ReformatSpec(
    column: String,
    splitBy: String,
    partOrder: Seq[Int],
    joinWith: String,
    trimParts: Boolean)

/** Strip a set of characters (e.g. "{}" wrappers).
  * reference: RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:544-590 */
final case class StripSpec(column: String, chars: String)

/** target ← source column mapping with optional concat/fallback.
  * reference: REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1309-1366 */
final case class MappingSpec(
    target: String,
    source: String,
    concatWith: Option[String],
    concatSeparator: String,
    fallback: Option[String])

/** LEFT JOIN lookup → NEW/UPDATE record classification.
  * reference: REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1396-1421 */
final case class LookupSpec(
    lookupTable: String,
    sourceKey: String,
    lookupKey: String,
    resultColumn: String,
    matchValue: String,
    noMatchValue: String)

/** One conjunct of a config-driven WHERE clause.
  * reference: REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1267-1299 */
final case class FilterSpec(column: String, operator: String, value: String)

/** External sync block (CRM sink); engine-side it drives the
  * row→payload field builder + batching, behind a sink trait. */
final case class SyncSpec(
    enabled: Boolean,
    batchSize: Int,
    futureOnly: Option[FutureOnlySpec],
    fieldMappings: Map[String, FieldValueSpec])

/** Future-only filter over concat'd datetime columns.
  * reference: REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1539-1557 */
final case class FutureOnlySpec(datetimeColumns: Seq[String], separator: String)

/** Per-field value builder: direct / concat list / coalesce list /
  * value-remap transform + prefix/suffix.
  * reference: REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:417-470 */
final case class FieldValueSpec(
    source: Option[String],
    concat: Seq[String],
    separator: String,
    coalesce: Seq[String],
    transform: Map[String, String], // case-insensitive value remap
    prefix: String,
    suffix: String)

object IngestConfig {
  private val mapper = new ObjectMapper()

  def parse(json: String): EngineConfig = {
    val root = mapper.readTree(json)
    EngineConfig(
      practices = arr(root, "Practices").map(parsePractice),
      archiveNotificationUrl =
        opt(root.path("ArchiveNotification"), "logic_app_url"))
  }

  def parseFile(path: String): EngineConfig =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  private def parsePractice(n: JsonNode): Practice = Practice(
    practiceName = str(n, "practice_name"),
    displayName = opt(n, "display_name"),
    siteServiceKey = opt(n, "site_service_key"),
    ingest = arr(n, "ingest").map(parseIngest))

  private def parseIngest(n: JsonNode): IngestSpec = {
    val src = n.path("source")
    val sf = n.path("snowflake")
    IngestSpec(
      fileType = str(n, "file_type"),
      sourceType = opt(n, "source_type").getOrElse("file"),
      source = SourceSpec(
        container = opt(src, "container"),
        directory = opt(src, "directory"),
        filePattern = opt(src, "file_pattern"),
        delimiter = opt(src, "delimiter").getOrElse(","),
        header = !src.path("columns").isArray || src.path("columns").isEmpty,
        columns = arr(src, "columns").map(_.asText),
        query = opt(src, "query"),
        api = obj(src).collect { case (k, v) if k.startsWith("api_") => k -> v.asText }.toMap),
      archive = pathSpec(n.path("archive")),
      error = pathSpec(n.path("error")),
      precheck = precheckSpec(n.path("precheck")),
      target = TargetSpec(
        rawTable = fqTable(sf, "database", "schema", "table"),
        loadMode = opt(sf, "load_mode").getOrElse("append"),
        refinedTable = fqTable(sf, "refined_database", "refined_schema", "refined_table"),
        regexReplace = arr(sf, "column_regex_replace").map(rr),
        reformat = arr(sf, "column_reformat").map(rf),
        columnStrip = arr(sf, "column_strip").map(st),
        curatedTable = fqTable(sf, "curated_database", "curated_schema", "curated_table"),
        curatedMapping = arr(sf, "curated_column_mapping").map(mp),
        curatedLookup = lookupSpec(sf.path("curated_lookup")),
        sourceFilter = arr(sf, "source_filter").map(fs),
        sync = syncSpec(sf.path("dataverse_sync"))))
  }

  private def rr(n: JsonNode) = RegexReplaceSpec(
    str(n, "column"),
    arr(n, "rules").map(r => RegexRule(opt(r, "match_substring"), str(r, "search"), str(r, "replace"))))
  private def rf(n: JsonNode) = ReformatSpec(
    str(n, "column"), opt(n, "split_by").getOrElse(","),
    arr(n, "part_order").map(_.asInt),
    opt(n, "join_with").getOrElse(" "),
    n.path("trim_parts").asBoolean(true))
  private def st(n: JsonNode) = StripSpec(str(n, "column"), str(n, "chars"))
  private def mp(n: JsonNode) = MappingSpec(
    str(n, "target"), str(n, "source"), opt(n, "concat_with"),
    opt(n, "concat_separator").getOrElse(" "), opt(n, "fallback"))
  private def fs(n: JsonNode) = FilterSpec(str(n, "column"), str(n, "operator"), str(n, "value"))

  private def lookupSpec(n: JsonNode): Option[LookupSpec] =
    if (n.isMissingNode || n.isNull) None
    else Some(LookupSpec(
      str(n, "lookup_table"), str(n, "source_key"), str(n, "lookup_key"),
      opt(n, "result_column").getOrElse("RECORD_TYPE"),
      opt(n, "match_value").getOrElse("UPDATE"),
      opt(n, "no_match_value").getOrElse("NEW")))

  private def syncSpec(n: JsonNode): Option[SyncSpec] =
    if (n.isMissingNode || n.isNull) None
    else Some(SyncSpec(
      enabled = n.path("enabled").asBoolean(false),
      batchSize = n.path("batch_size").asInt(1000),
      futureOnly = {
        val f = n.path("future_only_filter")
        if (f.isMissingNode || !f.path("enabled").asBoolean(false)) None
        else Some(FutureOnlySpec(arr(f, "datetime_columns").map(_.asText),
          opt(f, "separator").getOrElse(" ")))
      },
      fieldMappings = obj(n.path("field_mapping")).map { case (k, v) => k -> fieldValue(v) }.toMap))

  private def fieldValue(n: JsonNode): FieldValueSpec =
    if (n.isTextual) FieldValueSpec(Some(n.asText), Nil, " ", Nil, Map.empty, "", "")
    else FieldValueSpec(
      source = opt(n, "source"),
      concat = arr(n, "concat").map(_.asText),
      separator = opt(n, "separator").getOrElse(" "),
      coalesce = arr(n, "coalesce").map(_.asText),
      transform = obj(n.path("transform")).map { case (k, v) => k -> v.asText }.toMap,
      prefix = opt(n, "prefix").getOrElse(""),
      suffix = opt(n, "suffix").getOrElse(""))

  private def pathSpec(n: JsonNode): Option[PathSpec] =
    (opt(n, "container"), opt(n, "directory")) match {
      case (Some(c), Some(d)) => Some(PathSpec(c, d))
      case _ => None
    }

  private def precheckSpec(n: JsonNode): Option[PrecheckSpec] =
    if (n.isMissingNode || n.isNull) None
    else Some(PrecheckSpec(
      expectedColumns = arr(n, "expected_columns").map(_.asText),
      minRowCount = n.path("min_row_count").asLong(0L),
      maxRowCount = if (n.has("max_row_count")) Some(n.path("max_row_count").asLong) else None,
      requireAllColumns = n.path("require_all_columns").asBoolean(true),
      allowExtraColumns = n.path("allow_extra_columns").asBoolean(false),
      caseSensitiveHeaders = n.path("case_sensitive_headers").asBoolean(false)))

  private def fqTable(n: JsonNode, db: String, sch: String, tbl: String): Option[String] =
    (opt(n, db), opt(n, sch), opt(n, tbl)) match {
      case (Some(d), Some(s), Some(t)) => Some(s"$d.$s.$t")
      case _ => None
    }

  // "N/A" (any case) means unconfigured.
  private def opt(n: JsonNode, field: String): Option[String] = {
    val v = n.path(field)
    if (v.isMissingNode || v.isNull) None
    else {
      val s = v.asText
      if (s.isEmpty || s.equalsIgnoreCase("N/A")) None else Some(s)
    }
  }
  private def str(n: JsonNode, field: String): String = n.path(field).asText
  private def arr(n: JsonNode, field: String): Seq[JsonNode] = {
    val v = n.path(field)
    if (v.isArray) v.elements().asScala.toSeq else Nil
  }
  private def obj(n: JsonNode): Seq[(String, JsonNode)] =
    if (n.isObject) n.properties().asScala.toSeq.map(e => e.getKey -> e.getValue) else Nil
}
