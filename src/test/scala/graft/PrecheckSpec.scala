package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.PrecheckSpec
import graft.precheck.Precheck

class PrecheckSuite extends AnyFunSuite {

  private val spec = PrecheckSpec(
    expectedColumns = Seq("id", "name", "dob"),
    minRowCount = 1, maxRowCount = Some(100),
    requireAllColumns = true, allowExtraColumns = false,
    caseSensitiveHeaders = false)

  test("empty file fails fast") {
    val r = Precheck.checkFile("f.csv", 0, Nil, 0, ',', spec)
    assert(r.map(_.checkName) == Seq("file_size"))
    assert(!Precheck.gate(r))
  }

  test("clean file passes everything") {
    val lines = Seq("id,name,dob", "1,Alice,2001-01-01", "2,Bob,2002-02-02")
    val r = Precheck.checkFile("f.csv", 100, lines, 3, ',', spec)
    assert(Precheck.gate(r), r.filter(_.failed).mkString("; "))
  }

  test("BOM is stripped and warned, not failed") {
    val lines = Seq("﻿id,name,dob", "1,a,b")
    val r = Precheck.checkFile("f.csv", 50, lines, 2, ',', spec)
    assert(r.exists(c => c.checkName == "bom" && c.status == "WARN"))
    assert(Precheck.gate(r))
  }

  test("missing column fails; extra column fails unless allowed") {
    val missing = Precheck.checkColumns(Seq("id", "name"), spec)
    assert(missing.exists(c => c.checkName == "columns_required" && c.failed))
    val extra = Precheck.checkColumns(Seq("id", "name", "dob", "x"), spec)
    assert(extra.exists(c => c.checkName == "columns_extra" && c.failed))
    val allowed = Precheck.checkColumns(Seq("id", "name", "dob", "x"),
      spec.copy(allowExtraColumns = true))
    assert(!allowed.exists(_.failed))
  }

  test("reordered columns warn, not fail") {
    val r = Precheck.checkColumns(Seq("dob", "id", "name"), spec)
    assert(r.exists(c => c.checkName == "columns_order" && c.status == "WARN"))
    assert(!r.exists(_.failed))
  }

  test("case sensitivity honored") {
    val cs = spec.copy(caseSensitiveHeaders = true)
    val r = Precheck.checkColumns(Seq("ID", "NAME", "DOB"), cs)
    assert(r.exists(_.failed))
    val ci = Precheck.checkColumns(Seq("ID", "NAME", "DOB"), spec)
    assert(!ci.exists(_.failed))
  }

  test("row count bounds") {
    assert(Precheck.checkRowCount(1, spec).failed) // 0 data rows < min 1
    assert(!Precheck.checkRowCount(2, spec).failed)
    assert(Precheck.checkRowCount(102, spec).failed) // 101 > max 100
  }

  test("delimiter inconsistency detected in first 5 data rows") {
    val lines = Seq("a,b,c", "1,2,3", "1,2", "1,2,3")
    val r = Precheck.checkDelimiterConsistency(lines, ',')
    assert(r.failed)
  }

  test("header hygiene flags problematic characters") {
    val r = Precheck.checkHeaderHygiene(Seq("ok", "bad;name", "with\"quote", "x" * 129))
    assert(r.failed)
    assert(r.details.contains("semicolon"))
  }

  test("quote-aware CSV parse handles quoted delimiters and escaped quotes") {
    assert(Precheck.parseCsvLine("""a,"b,c",d""", ',') == Seq("a", "b,c", "d"))
    assert(Precheck.parseCsvLine("a,\"he said \"\"hi\"\"\",z", ',') ==
      Seq("a", "he said \"hi\"", "z"))
  }

  test("property: parse of join round-trips for delimiter-free fields") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val fields = Seq.fill(1 + rnd.nextInt(8))(
        rnd.alphanumeric.take(rnd.nextInt(15)).mkString)
      val line = fields.mkString(",")
      assert(Precheck.parseCsvLine(line, ',') == fields.map(_.trim))
    }
  }
}
