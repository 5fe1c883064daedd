package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

class RestSourceSpec extends AnyFunSuite {

  /** Scripted HTTP stub: responses served in order per URL. */
  class StubHttp(script: Map[String, Seq[(Int, String)]]) extends HttpClient {
    private val counters = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, String, Option[String])]
    def request(method: String, url: String, headers: Map[String, String],
        body: Option[String]): (Int, String) = {
      calls += ((method, url, body))
      val responses = script.getOrElse(url, Seq((404, "not found")))
      val i = math.min(counters(url), responses.length - 1)
      counters(url) += 1
      responses(i)
    }
  }

  private val noSleep: Long => Unit = _ => ()
  private def policy = RestSource.RetryPolicy(sleeper = noSleep)

  test("record extraction: bare list / first list key / singleton") {
    assert(RestSource.extractRecords("""[{"a":1},{"a":2}]""").size == 2)
    assert(RestSource.extractRecords("""{"facilities":[{"f":1}],"count":1}""").size == 1)
    assert(RestSource.extractRecords("""{"id":7,"name":"x"}""").size == 1)
  }

  test("dot-path extraction walks nested objects") {
    val body = """{"query_result":{"data":{"rows":[{"r":1},{"r":2}]}}}"""
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rows = RestSource.nestedValue(mapper.readTree(body), "query_result.data.rows")
    assert(rows.exists(_.isArray))
    assert(RestSource.extractRecords(rows.get).size == 2)
  }

  test("retry: 5xx retries with backoff then succeeds") {
    val http = new StubHttp(Map("u" -> Seq((500, "boom"), (500, "boom"), (200, "[]"))))
    val (status, _) = RestSource.withRetry(policy)(() => http.request("GET", "u", Map(), None))
    assert(status == 200)
    assert(http.calls.size == 3)
  }

  test("retry: 4xx fails fast without retries") {
    val http = new StubHttp(Map("u" -> Seq((403, "denied"))))
    val e = intercept[RestError](
      RestSource.withRetry(policy)(() => http.request("GET", "u", Map(), None)))
    assert(e.status == 403)
    assert(http.calls.size == 1)
  }

  test("retry: rate limit waits don't consume retries; gives up after cap") {
    val http = new StubHttp(Map("u" -> Seq.fill(5)((429, "slow down"))))
    val e = intercept[RestError](
      RestSource.withRetry(policy)(() => http.request("GET", "u", Map(), None)))
    assert(e.message.contains("rate limit"))
    assert(http.calls.size == 4) // initial + 3 rate-limit waits
  }

  test("begin/next pagination separates tokens from data and stops") {
    val http = new StubHttp(Map(
      "begin" -> Seq((200, """[{"nextToken":"t1"},{"d":1}]""")),
      "next" -> Seq(
        (200, """[{"nextToken":"t2"},{"d":2},{"d":3}]"""),
        (200, """[{"d":4}]"""))))
    val records = RestSource.fetchPaginated(http, "begin", "next", Map(), policy = policy)
    assert(records.size == 4)
    assert(http.calls.count(_._2 == "next") == 2)
    assert(http.calls.exists(_._3.contains("""{"nextToken":"t1"}""")))
  }

  test("per-id fan-out tags _source_patient_id and continues on error") {
    val http = new StubHttp(Map(
      "api/p1" -> Seq((200, """[{"enc":"e1"},{"enc":"e2"}]""")),
      "api/p2" -> Seq((500, "x"), (500, "x"), (500, "x"), (500, "x")),
      "api/p3" -> Seq((200, """[{"enc":"e3"}]"""))))
    val (records, failures) = RestSource.fetchPerId(
      http, id => s"api/$id", Map(), Seq("p1", "p2", "p3"),
      policy = policy, sleeper = noSleep)
    assert(records.size == 3)
    assert(failures == Seq("p2"))
    assert(records.forall(_.has("_source_patient_id")))
  }

  test("refresh-then-fetch waits then walks rows path") {
    var waited = 0L
    val http = new StubHttp(Map(
      "refresh" -> Seq((200, "ok")),
      "results" -> Seq((200, """{"query_result":{"data":{"rows":[{"a":1}]}}}"""))))
    val rows = RestSource.fetchRefreshThenGet(http, "refresh", "results", Map(),
      "query_result.data.rows", waitMs = 120000, sleeper = ms => waited = ms,
      policy = policy)
    assert(rows.size == 1)
    assert(waited == 120000)
  }
}

class RestToDataFrameSpec extends SparkTestBase {
  test("records with nested values become JSON-string columns") {
    val records = RestSource.extractRecords(
      """[{"id":1,"tags":["a","b"],"meta":{"k":"v"}},{"id":2,"tags":[],"meta":{}}]""")
    val df = RestSource.toDataFrame(spark, records)
    assert(df.count() == 2)
    val row = df.filter(org.apache.spark.sql.functions.col("id") === 1).head()
    assert(row.getAs[String]("tags") == """["a","b"]""")
    assert(row.getAs[String]("meta") == """{"k":"v"}""")
    val withMeta = RestSource.withApiMetadata(df, "src1", "run1")
    assert(withMeta.columns.toSet.intersect(
      Set("_FILE_NAME", "_FILE_LOAD_TIME", "_PARENT_RUN_ID")).size == 3)
  }
}
