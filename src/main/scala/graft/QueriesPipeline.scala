package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import graft.config.IngestConfig
import graft.plans.{Pipeline, RunContext}

/** The medallion pipeline itself under the oracle gate: stage a CSV
  * drop derived from the customer table, run precheck → RAW → REFINED
  * (regex rules + split-reorder + strip + uppercase + flag machine) →
  * CURATED (mapping + broadcast lookup classification + filter), and
  * return the curated rows. The DuckDB oracle expresses the entire
  * transform chain as plain SQL over the same `customer` table — so an
  * end-to-end pipeline run, including the catalog's copy-on-write flag
  * clears, must produce exactly the declared relational semantics.
  */
object QueriesPipeline {

  // exposed for plan/profiling diagnostics (Explain, dev scripts)
  val configJson =
    """{
      "Practices": [{
        "practice_name": "oracle_practice",
        "ingest": [{
          "file_type": "CustomerDrop", "source_type": "file",
          "source": {"container": "c", "directory": "d",
                     "file_pattern": ".*\\.csv$", "delimiter": ","},
          "precheck": {"expected_columns": ["cust id", "Cust Name", "Segment"],
                       "min_row_count": 1, "require_all_columns": true,
                       "allow_extra_columns": false},
          "snowflake": {
            "database": "R", "schema": "S", "table": "CUST",
            "refined_database": "RF", "refined_schema": "S", "refined_table": "CUST",
            "column_regex_replace": [
              {"column": "Segment", "rules": [
                {"match_substring": "BUILDING", "search": "BUILDING", "replace": "BLDG"},
                {"search": "MACH", "replace": "MCH"}]}],
            "column_reformat": [
              {"column": "Cust Name", "type": "split_reorder", "split_by": "#",
               "part_order": [1, 0], "join_with": " ", "trim_parts": true}],
            "column_strip": [{"column": "cust id", "chars": "#"}],
            "curated_database": "CU", "curated_schema": "S", "curated_table": "CUST",
            "curated_column_mapping": [
              {"target": "cust_key", "source": "CUST_ID"},
              {"target": "cust_name", "source": "CUST_NAME"},
              {"target": "segment", "source": "SEGMENT"},
              {"target": "seg_name", "source": "SEGMENT", "concat_with": "CUST_NAME",
               "concat_separator": "/"}],
            "curated_lookup": {
              "lookup_table": "LK.S.KNOWN", "source_key": "CUST_ID",
              "lookup_key": "KNOWN_ID", "result_column": "RECORD_TYPE",
              "match_value": "UPDATE", "no_match_value": "NEW"},
            "source_filter": [{"column": "SEGMENT", "operator": "!=", "value": "FURNITURE"}]
          }
        }]
      }]
    }"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_pipeline_medallion" -> ((s, dir) => {
      // stage: customer → CSV drop (strings survive the round-trip:
      // integer keys render identically in both engines)
      val work = graft.Scratch.dir("graft_pipeline")
      val stage = s"$work/stage"
      val c = Queries.table(s, dir, "customer").filter(col("c_custkey") < 500)
      c.select(
          concat(lit("#"), col("c_custkey").cast("string")).as("cust id"),
          col("c_name").as("Cust Name"),
          col("c_mktsegment").as("Segment"))
        .coalesce(1)
        .write.option("header", "true").mode("overwrite").csv(stage)

      val cat = new TableCatalog(s, s"$work/warehouse")
      import s.implicits._
      // lookup: every third key is "known" → UPDATE
      cat.append("LK.S.KNOWN",
        c.select(col("c_custkey").cast("string").as("KNOWN_ID"))
          .filter(col("KNOWN_ID").cast("long") % 3 === 0))

      val spec = IngestConfig.parse(configJson).practices.head.ingest.head
      val results = new Pipeline(s, cat).run(RunContext(), "oracle_practice",
        spec, stage)
      require(results.forall(_._2.status == "SUCCESS"),
        s"pipeline failed: $results")
      cat.read("CU.S.CUST")
        .select("cust_key", "cust_name", "segment", "seg_name", "RECORD_TYPE")
    }),

    // stateful streaming dedup under the oracle: one AvailableNow drain
    // sees all rows per key in one batch, so first-seen = min(seenAt,
    // payload) per key — declaratively expressible in SQL
    "q48_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      val work = graft.Scratch.dir("graft_sdedup")
      Queries.events(s, dir)
        .filter(col("user_id") < 40)
        .select(col("user_id").as("key"), col("event_type").as("payload"),
          col("event_id").as("seenAt"))
        .as[graft.streaming.StreamingDedup.Keyed]
        .coalesce(4)
        .write.mode("overwrite").parquet(s"$work/in")
      graft.streaming.StreamingDedup.runToCompletion(s, s"$work/in",
        queryName = s"sdedup_${work.hashCode.abs}", stateTtlMs = 0)
    }))

  /** The same transform chain, declared directly in SQL. */
  val oracles: Map[String, String] = Map(
    "q47_pipeline_medallion" ->
      """WITH raw AS (
           SELECT CAST(c_custkey AS VARCHAR) AS cust_id,  -- '#' strip undoes the prefix
             concat_ws(' ', TRIM(split_part(c_name, '#', 2)),
                            TRIM(split_part(c_name, '#', 1))) AS cust_name,
             CASE WHEN contains(c_mktsegment, 'BUILDING')
                  THEN regexp_replace(c_mktsegment, 'BUILDING', 'BLDG', 'g')
                  ELSE c_mktsegment END AS seg1
           FROM customer WHERE c_custkey < 500),
         refined AS (
           SELECT cust_id, cust_name,
             regexp_replace(seg1, 'MACH', 'MCH', 'g') AS segment
           FROM raw),
         filtered AS (SELECT * FROM refined WHERE segment <> 'FURNITURE')
         SELECT f.cust_id AS cust_key, f.cust_name, f.segment,
           concat_ws('/', COALESCE(f.segment, ''), COALESCE(f.cust_name, '')) AS seg_name,
           CASE WHEN CAST(f.cust_id AS BIGINT) % 3 = 0 THEN 'UPDATE' ELSE 'NEW' END AS "RECORD_TYPE"
         FROM filtered f""",

    "q48_stream_dedup" ->
      """WITH k AS (SELECT user_id AS key, event_type AS payload,
                      event_id AS "seenAt"
                    FROM events WHERE user_id < 40),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                 ORDER BY "seenAt", payload) AS rn FROM k)
         SELECT key, payload, "seenAt" FROM r WHERE rn = 1""")
}
