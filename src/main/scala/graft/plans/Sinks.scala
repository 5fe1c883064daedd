package graft.plans

import org.apache.spark.sql.DataFrame

/** Pluggable external-effect boundaries. The reference's Logic App /
  * Teams / Dataverse HTTP calls become these traits; the engine core
  * never talks to the network itself.
  */
trait Notifier {
  def notify(event: String, payload: Map[String, String]): Unit
}

object NoopNotifier extends Notifier {
  def notify(event: String, payload: Map[String, String]): Unit = ()
}

final class RecordingNotifier extends Notifier {
  val events = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
  def notify(event: String, payload: Map[String, String]): Unit =
    events += ((event, payload))
}

/** One CRM operation: upsert-by-alternate-key / update-by-id / create.
  * reference: SF_Notebooks/REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:472-648 */
final case class CrmOp(method: String, entity: String, key: Option[String],
    fields: Map[String, String])

/** One CRM operation with the wire body pre-rendered as a flat JSON
  * object — what the executor delivery path emits via a single
  * codegen'd `to_json(struct(...))` projection, so no per-row field
  * Map is boxed on the Spark hot path. */
final case class CrmJsonOp(method: String, entity: String,
    key: Option[String], body: String) {
  /** Map form, parsed at the sink boundary only. */
  def toFieldsOp: CrmOp = CrmOp(method, entity, key, CrmJson.parseFlat(body))
}

object CrmJson {
  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  /** Parse a flat one-level JSON object into (field -> string-or-null). */
  def parseFlat(body: String): Map[String, String] = {
    val node = mapper.readTree(body)
    val b = Map.newBuilder[String, String]
    node.fields().forEachRemaining { e =>
      b += (e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText()))
    }
    b.result()
  }
}

trait CrmSink extends Serializable {
  /** Deliver one batch of ops; returns per-op status codes. */
  def deliver(batch: Seq[CrmOp]): Seq[Int]
  /** JSON-body delivery. Default bridges to [[deliver]] by parsing at
    * the sink boundary (delivery cost is HTTP-dominated there); a
    * wire-native sink overrides this and splices `body` straight into
    * the $batch envelope ([[CrmBatch.renderJson]]) without ever
    * building a Map. */
  def deliverJson(batch: Seq[CrmJsonOp]): Seq[Int] =
    deliver(batch.map(_.toFieldsOp))
}

/** Dry-run sink: succeeds everything (DATAVERSE_DRY_RUN analog,
  * reference: REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:511-520). */
object DryRunCrmSink extends CrmSink {
  def deliver(batch: Seq[CrmOp]): Seq[Int] = batch.map(_ => 204)
  override def deliverJson(batch: Seq[CrmJsonOp]): Seq[Int] =
    batch.map(_ => 204)
}

/** Paged read of an existing CRM entity set — the `$select` +
  * `odata.maxpagesize` + `@odata.nextLink` loop the reference drives
  * before syncing, to decide update-vs-create per row
  * (REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1709-1754). Pluggable
  * boundary like [[CrmSink]]: the engine never talks HTTP itself. */
trait CrmFetcher {
  /** One page of `select`-projected rows plus the continuation link
    * (None = last page). `link` is None on the first call. */
  def fetchPage(entity: String, select: Seq[String],
      link: Option[String]): (Seq[Map[String, String]], Option[String])
}

object CrmFetch {
  /** Drain the paged entity set into a DataFrame with columns
    * `select` (all strings, missing fields null). Pages accumulate on
    * the driver — the same shape as the reference's pandas frame; the
    * result immediately becomes a relational snapshot for the probe
    * join, so a large existing set is handled by Spark from here on. */
  def fetchExisting(spark: org.apache.spark.sql.SparkSession, fetcher: CrmFetcher,
      entity: String, select: Seq[String], maxPages: Int = 100000): DataFrame = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    var link: Option[String] = None
    var pages = 0
    var more = true
    while (more && pages < maxPages) {
      val (page, next) = fetcher.fetchPage(entity, select, link)
      rows ++= page
      link = next
      pages += 1
      more = next.isDefined
    }
    val schema = org.apache.spark.sql.types.StructType(select.map(c =>
      org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.StringType)))
    val data = rows.toSeq.map(m =>
      org.apache.spark.sql.Row(select.map(c => m.getOrElse(c, null)): _*))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, data.size / 5000)), schema)
  }
}

object CrmBatch {
  /** Render a Dataverse-style multipart $batch request body (pure
    * function — unit-testable without any network).
    * reference: REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:528-648 */
  def render(batchId: String, ops: Seq[CrmOp]): String =
    renderParts(batchId,
      ops.map(op => (op.method, op.entity, op.key, jsonObject(op.fields))))

  /** Envelope for pre-rendered JSON bodies ([[CrmJsonOp]]): the body
    * produced by the executor's `to_json` projection goes onto the wire
    * verbatim — no Map is ever materialized. */
  def renderJson(batchId: String, ops: Seq[CrmJsonOp]): String =
    renderParts(batchId, ops.map(op => (op.method, op.entity, op.key, op.body)))

  private def renderParts(batchId: String,
      parts: Seq[(String, String, Option[String], String)]): String = {
    val sb = new StringBuilder
    val changeset = s"changeset_$batchId"
    sb.append(s"--batch_$batchId\r\n")
    sb.append(s"Content-Type: multipart/mixed; boundary=$changeset\r\n\r\n")
    parts.zipWithIndex.foreach { case ((method, entity, key, body), i) =>
      sb.append(s"--$changeset\r\n")
      sb.append("Content-Type: application/http\r\n")
      sb.append(s"Content-ID: ${i + 1}\r\n\r\n")
      val target = key match {
        case Some(k) => s"$entity($k)"
        case None => entity
      }
      sb.append(s"$method $target HTTP/1.1\r\n")
      sb.append("Content-Type: application/json; type=entry\r\n")
      if (method == "PATCH" && key.exists(!_.contains("=")))
        sb.append("If-Match: *\r\n")
      sb.append("\r\n")
      sb.append(body).append("\r\n")
    }
    sb.append(s"--$changeset--\r\n")
    sb.append(s"--batch_$batchId--\r\n")
    sb.toString
  }

  /** Parse per-op HTTP status codes out of a multipart batch response.
    * reference: REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:610-633 */
  def parseStatuses(responseBody: String): Seq[Int] =
    raw"HTTP/1\.1 (\d{3})".r.findAllMatchIn(responseBody)
      .map(_.group(1).toInt).toSeq

  private def jsonObject(fields: Map[String, String]): String =
    fields.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + escape(k) + "\":" + (if (v == null) "null" else "\"" + escape(v) + "\"")
    }.mkString("{", ",", "}")

  private def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Delivery with an existing-entity probe: left-join the payload
    * against the fetched snapshot on `keyColumn`; rows whose key
    * pre-exists PATCH by the snapshot GUID, the rest POST — the
    * reference's per-row `if key in existing` decision
    * (REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:917-977) re-expressed
    * as one relational join (broadcast for a small snapshot, shuffle
    * join at scale — Catalyst picks). Returns (delivered, failed). */
  def deliverWithProbe(payload: DataFrame, entity: String, keyColumn: String,
      existing: DataFrame, idColumn: String, batchSize: Int,
      sink: CrmSink): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val snapshot = existing.select(
      col(keyColumn), col(idColumn).as("__crm_id")).distinct()
    val probed = payload.join(snapshot, Seq(keyColumn), "left")
    deliverRendered(renderBodies(probed, payload.columns, Some("__crm_id")),
      entity, batchSize, sink)
  }

  /** Partition-parallel batched delivery: rows never collect to the
    * driver; each partition builds ≤batchSize batches and hands them to
    * the sink. Returns (delivered, failed) counts. */
  def deliverPartitioned(df: DataFrame, entity: String, keyColumn: Option[String],
      batchSize: Int, sink: CrmSink): (Long, Long) =
    deliverRendered(renderBodies(df, df.columns, keyColumn), entity,
      batchSize, sink)

  /** Project each payload row to (wire body, op key) in ONE codegen'd
    * `to_json(struct(...))` pass — fields stay inside whole-stage
    * codegen until the delivery boundary; the old formulation boxed
    * every field of every row into a Scala Map inside the iterator. */
  private def renderBodies(df: DataFrame, fieldCols: Seq[String],
      keyColumn: Option[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, struct, to_json}
    val body = to_json(
      struct(fieldCols.map(c => col(c).cast("string").as(c)): _*),
      Map("ignoreNullFields" -> "false"))
    val key = keyColumn.map(k => col(k).cast("string")).getOrElse(
      lit(null).cast("string"))
    df.select(body.as("__body"), key.as("__op_key"))
  }

  private def deliverRendered(rendered: DataFrame, entity: String,
      batchSize: Int, sink: CrmSink): (Long, Long) = {
    val counts = rendered.rdd.mapPartitions { rows =>
      var ok = 0L; var bad = 0L
      rows.grouped(batchSize).foreach { group =>
        val ops = group.map { r =>
          val key = if (r.isNullAt(1)) None else Some(r.getString(1))
          CrmJsonOp(if (key.isDefined) "PATCH" else "POST", entity, key,
            r.getString(0))
        }
        val statuses = sink.deliverJson(ops.toSeq)
        ok += statuses.count(s => s >= 200 && s < 300)
        bad += statuses.count(s => s < 200 || s >= 300)
      }
      Iterator((ok, bad))
    }.collect()
    (counts.map(_._1).sum, counts.map(_._2).sum)
  }
}
