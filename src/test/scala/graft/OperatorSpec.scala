package graft

import org.apache.spark.sql.functions._
import graft.config._
import graft.operators._
import graft.plans.{CrmBatch, CrmOp}
import graft.sources.{ArchiveMover, Params}

class OperatorSpec extends SparkTestBase {
  import spark.implicits._

  test("normName resolution is alnum-normalized and case-insensitive") {
    assert(RefinedOps.normName("Appt Provider") == "apptprovider")
    assert(RefinedOps.resolve(Seq("APPT_PROVIDER", "x"), "Appt Provider")
      .contains("APPT_PROVIDER"))
    assert(RefinedOps.resolve(Seq("a"), "missing").isEmpty)
  }

  test("splitReorder handles out-of-range parts as empty") {
    val df = Seq("OnlyOne").toDF("name")
    val out = RefinedOps.splitReorder(df,
      Seq(ReformatSpec("name", ",", Seq(1, 0), " ", trimParts = true)))
    assert(out.as[String].head() == " OnlyOne")
  }

  test("fieldValue: transform remap is case-insensitive with passthrough") {
    val df = Seq("declined", "DECLINED", "other").toDF("status")
    val spec = FieldValueSpec(Some("status"), Nil, " ", Nil,
      Map("declined" -> "100000001"), "", "")
    val out = df.select(CuratedOps.fieldValue(df, spec).as("v")).as[String].collect()
    assert(out.toSeq == Seq("100000001", "100000001", "other"))
  }

  test("fieldValue: coalesce list and prefix/suffix") {
    val df = Seq((null.asInstanceOf[String], "b1"), ("a2", "b2")).toDF("a", "b")
    val spec = FieldValueSpec(None, Nil, " ", Seq("a", "b"), Map.empty, "<", ">")
    val out = df.select(CuratedOps.fieldValue(df, spec).as("v")).as[String].collect()
    assert(out.toSeq == Seq("<b1>", "<a2>"))
  }

  test("canceledFlag matches set membership and substring, case-insensitive") {
    val df = Seq("Canceled", "CANCELLED APPT", "Scheduled", null).toDF("s")
    val out = df.select(CuratedOps.canceledFlag(col("s"),
      Seq("canceled"), Seq("cancelled")).as("f")).as[String].collect()
    assert(out.toSeq == Seq("Y", "Y", "N", "N"))
  }

  test("dummyKey synthesizes NOMBI_ for blank naturals") {
    val df = Seq(("MBI1", 1L), ("", 2L), (null.asInstanceOf[String], 3L)).toDF("mbi", "pn")
    val out = df.select(CuratedOps.dummyKey(col("mbi"), col("pn")).as("k"))
      .as[String].collect()
    assert(out.toSeq == Seq("MBI1", "NOMBI_2", "NOMBI_3"))
  }

  test("compileFilter rejects unknown operators") {
    val df = Seq(1).toDF("a")
    intercept[IllegalArgumentException] {
      CuratedOps.compileFilter(df, Seq(FilterSpec("a", "BETWEEN", "1")))
    }
  }

  test("merge is idempotent when source reapplied") {
    val t = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val s = Seq((2, "B"), (3, "C")).toDF("k", "v")
    val once = MergeOps.upsert(t, s, Seq("k"))
    val twice = MergeOps.upsert(once, s, Seq("k"))
    assert(twice.as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (3, "C")))
  }

  test("CrmBatch renders multipart body and parses statuses") {
    val ops = Seq(
      CrmOp("PATCH", "contacts", Some("key='A1'"), Map("f" -> "v")),
      CrmOp("POST", "contacts", None, Map("g" -> null)))
    val body = CrmBatch.render("b1", ops)
    assert(body.contains("--batch_b1"))
    assert(body.contains("PATCH contacts(key='A1') HTTP/1.1"))
    assert(body.contains("POST contacts HTTP/1.1"))
    assert(body.contains("\"g\":null"))
    val statuses = CrmBatch.parseStatuses(
      "HTTP/1.1 204 No Content\r\n...\r\nHTTP/1.1 400 Bad Request\r\n")
    assert(statuses == Seq(204, 400))
  }

  test("ArchiveMover renames error files with _PRI_ suffix before extension") {
    assert(ArchiveMover.errorName("report_2024.csv", "r1") == "report_2024_PRI_r1.csv")
    assert(ArchiveMover.errorName("noext", "r1") == "noext_PRI_r1")
    val dir = tempDir("mv")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.csv"), "x".getBytes)
    val dest = ArchiveMover.moveToError(spark, s"$dir/f.csv", s"$dir/error", "r9")
    assert(dest.endsWith("error/f_PRI_r9.csv"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "f.csv")))
  }

  test("Params parses positional, k=v, and quoted forms") {
    val p = Params.parse("'werter|AppointmentData|run_id=abc|practice=\"x y\"'")
    assert(p(0).contains("werter"))
    assert(p(1).contains("AppointmentData"))
    assert(p.get("run_id").contains("abc"))
    assert(p.get("practice").contains("x y"))
  }
}
