package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Injectable HTTP boundary: the engine core never opens sockets;
  * production wires a real client, tests wire a scripted stub. */
trait HttpClient {
  /** Returns (statusCode, body). */
  def request(method: String, url: String, headers: Map[String, String],
      body: Option[String]): (Int, String)
}

final case class RestError(message: String, status: Int) extends RuntimeException(message)

/** REST ingestion sources (driver-side fetch → distributed DataFrame),
  * re-implementing the reference's API patterns as pure functions over
  * an abstract HTTP client:
  *
  *  - record extraction rules (bare list / first list-valued key /
  *    singleton object)      — reference: SF_Notebooks/ELLKAY_API_TO_RAW_SNOWFLAKE.py:416-438
  *  - begin/next token pagination (≤ maxPages)
  *                           — reference: ELLKAY_API_TO_RAW_SNOWFLAKE.py:625-691
  *  - per-id fan-out with `_source_patient_id` tagging, continue-on-error
  *                           — reference: ELLKAY_API_TO_RAW_SNOWFLAKE.py:548-623
  *  - retry wrapper: N retries with linear backoff; rate-limit responses
  *    wait without consuming retries; 4xx fail fast
  *                           — reference: ELLKAY_API_TO_RAW_SNOWFLAKE.py:335-389
  *  - dot-path extraction (`query_result.data.rows`)
  *                           — reference: SF_Notebooks/API_TO_RAW_SNOWFLAKE.py:283-289
  *  - nested values serialized to JSON strings before tabularization
  *                           — reference: ELLKAY_API_TO_RAW_SNOWFLAKE.py:709-723
  *
  * Fetching is inherently driver-side (external API rate limits are the
  * bottleneck, not cluster parallelism — the reference sleeps
  * api_delay_ms between calls); the result becomes a distributed
  * DataFrame immediately via json line parsing on executors.
  */
object RestSource {
  private val mapper = new ObjectMapper()

  // ---- record extraction -------------------------------------------------

  /** Tolerant extraction: bare array → records; object → first
    * array-valued field; else the object itself as a singleton. */
  def extractRecords(body: String): Seq[JsonNode] = {
    val root = mapper.readTree(body)
    extractRecords(root)
  }

  def extractRecords(root: JsonNode): Seq[JsonNode] = root match {
    case a: ArrayNode => a.elements().asScala.toSeq
    case o: ObjectNode =>
      o.properties().asScala.map(_.getValue).find(_.isArray) match {
        case Some(arr) => arr.elements().asScala.toSeq
        case None => Seq(o)
      }
    case _ => Nil
  }

  /** Walk a dot path ("query_result.data.rows") into a JSON tree. */
  def nestedValue(root: JsonNode, dotPath: String): Option[JsonNode] =
    dotPath.split('.').foldLeft(Option(root)) { (acc, seg) =>
      acc.flatMap { n => val v = n.path(seg); if (v.isMissingNode) None else Some(v) }
    }

  // ---- retry / rate-limit wrapper ---------------------------------------

  final case class RetryPolicy(
      maxRetries: Int = 3,
      backoffMs: Int = 5000,
      rateLimitWaitMs: Int = 30000,
      maxRateLimitWaits: Int = 3,
      sleeper: Long => Unit = Thread.sleep)

  /** 429 / rate-limit body → wait without consuming a retry; other 4xx →
    * fail fast; 5xx/errors → linear backoff retry. */
  def withRetry(policy: RetryPolicy)(call: () => (Int, String)): (Int, String) = {
    var attempt = 0
    var rateWaits = 0
    while (true) {
      val (status, body) =
        try call()
        catch {
          case e: RestError => throw e
          case e: Exception => (-1, e.getMessage)
        }
      val rateLimited = status == 429 ||
        (status >= 400 && body != null && body.contains("ExternalApiRateLimitReached"))
      if (status >= 200 && status < 300) return (status, body)
      else if (rateLimited) {
        rateWaits += 1
        if (rateWaits > policy.maxRateLimitWaits)
          throw RestError(s"rate limit persisted after ${policy.maxRateLimitWaits} waits", status)
        policy.sleeper(policy.rateLimitWaitMs.toLong)
      } else if (status >= 400 && status < 500) {
        throw RestError(s"client error $status: ${truncate(body)}", status)
      } else {
        attempt += 1
        if (attempt > policy.maxRetries)
          throw RestError(s"failed after ${policy.maxRetries} retries: ${truncate(body)}", status)
        policy.sleeper(policy.backoffMs.toLong * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def truncate(s: String): String =
    if (s == null) "" else s.take(200)

  // ---- auth --------------------------------------------------------------

  /** OAuth2 client-credentials token fetch; returns the bearer token.
    * reference: ELLKAY_API_TO_RAW_SNOWFLAKE.py:258-308 */
  def fetchToken(http: HttpClient, tokenUrl: String, clientId: String,
      clientSecret: String, policy: RetryPolicy = RetryPolicy()): String = {
    val form = s"grant_type=client_credentials&client_id=$clientId&client_secret=$clientSecret"
    val (_, body) = withRetry(policy)(() => http.request("POST", tokenUrl,
      Map("Content-Type" -> "application/x-www-form-urlencoded"), Some(form)))
    val tok = mapper.readTree(body).path("access_token")
    if (tok.isMissingNode || tok.asText.isEmpty)
      throw RestError("no access_token in token response", 200)
    tok.asText
  }

  /** Standard auth headers: bearer token + per-practice service key.
    * reference: ELLKAY_API_TO_RAW_SNOWFLAKE.py:391-402 */
  def authHeaders(token: String, siteServiceKey: Option[String]): Map[String, String] =
    Map("Authorization" -> s"Bearer $token") ++
      siteServiceKey.map("SiteServiceKey" -> _)

  /** Strip a leading engine error-code prefix from error text before
    * logging/notification.
    * reference: RAW_ADLS_TO_RAW_SNOWFLAKE.py:760-766 */
  def cleanErrorMessage(msg: String): String =
    if (msg == null) ""
    else msg.replaceFirst("^\\(?\\d{4,6}\\)?\\s*(\\(\\w+\\))?:?\\s*", "").trim

  // ---- fetch patterns ----------------------------------------------------

  /** Single-call fetch (S8). */
  def fetchSingle(http: HttpClient, url: String, headers: Map[String, String],
      body: Option[String] = None, policy: RetryPolicy = RetryPolicy()): Seq[JsonNode] = {
    val (_, respBody) = withRetry(policy)(() => http.request("POST", url, headers, body))
    extractRecords(respBody)
  }

  /** Begin/Next token pagination (S9): Begin yields a nextToken; loop
    * Next ≤ maxPages, separating token items from data items. */
  def fetchPaginated(http: HttpClient, beginUrl: String, nextUrl: String,
      headers: Map[String, String], maxPages: Int = 1000,
      policy: RetryPolicy = RetryPolicy()): Seq[JsonNode] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
    def split(records: Seq[JsonNode]): (Option[String], Seq[JsonNode]) = {
      val (tokens, data) = records.partition(r =>
        r.isObject && r.has("nextToken") && r.size() == 1)
      val token = tokens.headOption.map(_.path("nextToken").asText)
        .orElse(records.find(_.has("nextToken")).map(_.path("nextToken").asText))
        .filter(_.nonEmpty)
      (token, data.filterNot(r => r.isObject && r.has("nextToken") && r.size() == 1))
    }
    val (firstToken, firstData) = split(fetchSingle(http, beginUrl, headers, None, policy))
    out ++= firstData
    var token = firstToken
    var pages = 0
    while (token.isDefined && pages < maxPages) {
      val body = Some(s"""{"nextToken":"${token.get}"}""")
      val (t, data) = split(fetchSingle(http, nextUrl, headers, body, policy))
      out ++= data
      token = t
      pages += 1
    }
    out.toSeq
  }

  /** Per-id fan-out (S10): one call per id, each record tagged with
    * `_source_patient_id`; failures skip that id (continue-on-error). */
  def fetchPerId(http: HttpClient, urlFor: String => String,
      headers: Map[String, String], ids: Seq[String],
      delayMs: Long = 0, policy: RetryPolicy = RetryPolicy(),
      sleeper: Long => Unit = Thread.sleep): (Seq[JsonNode], Seq[String]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    ids.foreach { id =>
      try {
        val records = fetchSingle(http, urlFor(id), headers, None, policy)
        records.foreach {
          case o: ObjectNode => out += o.deepCopy[ObjectNode]().put("_source_patient_id", id)
          case other => out += other
        }
      } catch { case _: Exception => failures += id }
      if (delayMs > 0) sleeper(delayMs)
    }
    (out.toSeq, failures.toSeq)
  }

  /** Refresh-then-fetch (S7): POST refresh, wait, GET results, walk the
    * dot path to the row array. */
  def fetchRefreshThenGet(http: HttpClient, refreshUrl: String, resultsUrl: String,
      headers: Map[String, String], rowsPath: String,
      waitMs: Long = 120000, sleeper: Long => Unit = Thread.sleep,
      policy: RetryPolicy = RetryPolicy()): Seq[JsonNode] = {
    withRetry(policy)(() => http.request("POST", refreshUrl, headers, None))
    sleeper(waitMs)
    val (_, body) = withRetry(policy)(() => http.request("GET", resultsUrl, headers, None))
    nestedValue(mapper.readTree(body), rowsPath).map(extractRecords).getOrElse(Nil)
  }

  // ---- tabularization ----------------------------------------------------

  /** Records → DataFrame. Nested objects/arrays become JSON-string
    * columns (S12's pandas bridge, without pandas): each record is
    * flattened driver-side to a one-level JSON object, then parsed
    * distributed via spark.read.json so schema inference runs on
    * executors. */
  def toDataFrame(spark: SparkSession, records: Seq[JsonNode]): DataFrame = {
    import spark.implicits._
    val lines = records.map { r =>
      val flat = mapper.createObjectNode()
      r match {
        case o: ObjectNode =>
          o.properties().asScala.foreach { e =>
            val v = e.getValue
            if (v.isContainerNode) flat.put(e.getKey, mapper.writeValueAsString(v))
            else flat.set[JsonNode](e.getKey, v)
          }
        case other => flat.put("value", other.asText)
      }
      mapper.writeValueAsString(flat)
    }
    if (lines.isEmpty) spark.emptyDataFrame
    else spark.read.json(lines.toDS())
  }

  /** API-source metadata columns (underscore-prefixed).
    * reference: ELLKAY_API_TO_RAW_SNOWFLAKE.py:726-731 */
  def withApiMetadata(df: DataFrame, sourceName: String, parentRunId: String): DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn("_FILE_NAME", lit(sourceName))
      .withColumn("_FILE_LOAD_TIME", current_timestamp())
      .withColumn("_PARENT_RUN_ID", lit(parentRunId))
  }
}
