package graft.sources

import org.apache.spark.sql.SparkSession
import graft.catalog.TableCatalog
import graft.plans.RunContext

/** Daily API harvest orchestration: loop practices × endpoints in
  * config order, continue-on-failure per unit, one result row per
  * endpoint run.
  * reference: SF_Notebooks/ELLKAY_DAILY_INGEST_TO_RAW_SNOWFLAKE.py
  * :269-383 (practice loop), :609-655 (continue-on-error),
  * endpoint ordering contract (UpdatedPatients before patient loops —
  * SURVEY §3.2).
  */
object ApiOrchestrator {

  final case class Endpoint(
      name: String,
      /** single | beginNext | patientLoop */
      pattern: String,
      url: String,
      nextUrl: String = "",
      /** table whose ids drive a patientLoop fan-out */
      patientSourceTable: String = "",
      patientIdColumn: String = "",
      targetTable: String)

  final case class EndpointResult(
      practice: String, endpoint: String, status: String,
      records: Long, error: String)

  /** Run all endpoints for all practices; a failing endpoint records
    * FAILED and the loop continues. */
  def run(spark: SparkSession, catalog: TableCatalog, http: HttpClient,
      ctx: RunContext, practices: Seq[(String, Map[String, String])],
      endpoints: Seq[Endpoint],
      policy: RestSource.RetryPolicy = RestSource.RetryPolicy())
      : Seq[EndpointResult] = {
    practices.flatMap { case (practice, headers) =>
      endpoints.map { ep =>
        try {
          val records = ep.pattern match {
            case "single" =>
              RestSource.fetchSingle(http, ep.url, headers, None, policy)
            case "beginNext" =>
              RestSource.fetchPaginated(http, ep.url, ep.nextUrl, headers,
                policy = policy)
            case "patientLoop" =>
              // ids come from a previously-loaded table (endpoint order matters)
              val ids = catalog.read(ep.patientSourceTable)
                .select(ep.patientIdColumn).distinct()
                .collect().map(r => Option(r.get(0)).map(_.toString).getOrElse(""))
                .filter(_.nonEmpty).toSeq
              val (recs, _) = RestSource.fetchPerId(http,
                id => s"${ep.url}/$id", headers, ids, policy = policy,
                sleeper = _ => ())
              recs
            case other =>
              throw new IllegalArgumentException(s"unknown pattern $other")
          }
          val df = RestSource.withApiMetadata(
            RestSource.toDataFrame(spark, records),
            s"${practice}_${ep.name}", ctx.parentRunId)
          if (records.nonEmpty) catalog.append(ep.targetTable, df)
          EndpointResult(practice, ep.name, "SUCCESS", records.size.toLong, "")
        } catch {
          case e: Exception =>
            EndpointResult(practice, ep.name, "FAILED", 0, String.valueOf(e.getMessage))
        }
      }
    }
  }
}
