package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

class RestAuthSpec extends AnyFunSuite {
  private val noSleep = RestSource.RetryPolicy(sleeper = _ => ())

  test("oauth client-credentials token fetch") {
    val http = new HttpClient {
      def request(method: String, url: String, headers: Map[String, String],
          body: Option[String]): (Int, String) = {
        assert(method == "POST" && url == "token")
        assert(body.exists(_.contains("grant_type=client_credentials")))
        assert(headers("Content-Type") == "application/x-www-form-urlencoded")
        (200, """{"access_token":"tok123","expires_in":3600}""")
      }
    }
    assert(RestSource.fetchToken(http, "token", "id", "secret", noSleep) == "tok123")
    val h = RestSource.authHeaders("tok123", Some("svc-key"))
    assert(h == Map("Authorization" -> "Bearer tok123", "SiteServiceKey" -> "svc-key"))
  }

  test("token fetch fails when access_token missing") {
    val http = new HttpClient {
      def request(m: String, u: String, h: Map[String, String],
          b: Option[String]): (Int, String) = (200, """{"error":"nope"}""")
    }
    intercept[RestError](RestSource.fetchToken(http, "token", "a", "b", noSleep))
  }

  test("error message cleaner strips engine code prefixes") {
    assert(RestSource.cleanErrorMessage("100038 (22018): Numeric value 'x' is not recognized")
      == "Numeric value 'x' is not recognized")
    assert(RestSource.cleanErrorMessage("plain message") == "plain message")
    assert(RestSource.cleanErrorMessage(null) == "")
  }
}

class CatalogPartitionSpec extends SparkTestBase {
  import spark.implicits._
  test("partitioned overwrite prunes partitions on read") {
    val cat = new graft.catalog.TableCatalog(spark, tempDir("part"))
    val df = Seq(("p1", "2024-01-01", 1), ("p1", "2024-01-02", 2),
      ("p2", "2024-01-01", 3)).toDF("practice", "load_date", "v")
    cat.overwritePartitioned("d.s.t", df, Seq("practice", "load_date"))
    val read = cat.read("d.s.t")
    assert(read.count() == 3)
    val pruned = read.filter(org.apache.spark.sql.functions.col("practice") === "p1")
    assert(pruned.count() == 2)
    // partition filter reaches the scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("practice"))
  }
}
