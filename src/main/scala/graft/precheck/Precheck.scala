package graft.precheck

import graft.config.PrecheckSpec

/** One validation outcome, logged with expected/actual/details.
  * reference: SF_Notebooks/ADLS_FILE_PRECHECK.py:187-237 */
final case class CheckResult(
    checkName: String,
    status: String, // PASS | FAIL | WARN
    expected: String,
    actual: String,
    details: String = "") {
  def failed: Boolean = status == "FAIL"
}

/** File-level pre-ingest validation — the reference's "constraint
  * engine" (SF_Notebooks/ADLS_FILE_PRECHECK.py §2.7 of SURVEY.md).
  * All checks are pure functions over bytes/lines so they can run
  * driver-side for a handful of files or be mapped over a DataFrame of
  * file paths for bulk validation at scale.
  */
object Precheck {

  val ProblematicHeaderChars: Seq[(String, String)] = Seq(
    "\u0000" -> "null byte", "\r" -> "carriage return", "\n" -> "line feed",
    "\t" -> "tab", "\"" -> "double quote", "'" -> "single quote",
    ";" -> "semicolon", "--" -> "sql comment", "/*" -> "block comment open",
    "*/" -> "block comment close")

  /** UTF-8 / UTF-16 / latin-1-mangled BOM prefixes.
    * reference: ADLS_FILE_PRECHECK.py:845-872 */
  val BomPrefixes: Seq[String] =
    Seq("﻿", "ï»¿", "￾", "þÿ", "ÿþ")

  def stripBom(s: String): String =
    BomPrefixes.find(s.startsWith).map(b => s.substring(b.length)).getOrElse(s)

  /** Quote-aware single-line CSV parse with naive-split fallback.
    * reference: ADLS_FILE_PRECHECK.py:798-824,874-885 */
  def parseCsvLine(line: String, delimiter: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (ch == '"') {
        if (inQuotes && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else inQuotes = !inQuotes
      } else if (ch == delimiter && !inQuotes) {
        out += cur.toString; cur.clear()
      } else cur.append(ch)
      i += 1
    }
    out += cur.toString
    out.toSeq.map(_.trim)
  }

  def checkFileSize(name: String, size: Long): CheckResult =
    if (size > 0) CheckResult("file_size", "PASS", "> 0 bytes", s"$size bytes")
    else CheckResult("file_size", "FAIL", "> 0 bytes", "0 bytes", s"$name is empty")

  def checkHeaderReadable(lines: Seq[String], delimiter: Char): (CheckResult, Seq[String]) =
    lines.headOption match {
      case None =>
        (CheckResult("header_read", "FAIL", "header line", "no lines"), Nil)
      case Some(h0) =>
        val h = stripBom(h0).stripSuffix("\r")
        val cols = parseCsvLine(h, delimiter)
        if (cols.forall(_.isEmpty))
          (CheckResult("header_read", "FAIL", "non-empty header", h.take(80)), cols)
        else (CheckResult("header_read", "PASS", "header line",
          s"${cols.length} columns"), cols)
    }

  def checkBom(firstLine: String): CheckResult =
    if (BomPrefixes.exists(firstLine.startsWith))
      CheckResult("bom", "WARN", "no BOM", "BOM present", "stripped before parse")
    else CheckResult("bom", "PASS", "no BOM", "no BOM")

  /** Header hygiene: problematic characters, blank names, over-long
    * names, non-printables. reference: ADLS_FILE_PRECHECK.py:101-113,896-941 */
  def checkHeaderHygiene(cols: Seq[String]): CheckResult = {
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    cols.zipWithIndex.foreach { case (c, i) =>
      if (c.isEmpty) problems += s"col$i: empty name"
      if (c.length > 128) problems += s"col$i: name > 128 chars"
      ProblematicHeaderChars.foreach { case (bad, label) =>
        if (c.contains(bad)) problems += s"col$i: contains $label"
      }
      if (c.exists(ch => ch < ' ' && ch != '\t')) problems += s"col$i: non-printable"
    }
    if (problems.isEmpty) CheckResult("header_hygiene", "PASS", "clean headers", "clean")
    else CheckResult("header_hygiene", "FAIL", "clean headers",
      s"${problems.length} problems", problems.mkString("; "))
  }

  /** Column presence/extras/order vs expected, case-(in)sensitive.
    * reference: ADLS_FILE_PRECHECK.py:946-1043 */
  def checkColumns(actual: Seq[String], spec: PrecheckSpec): Seq[CheckResult] = {
    if (spec.expectedColumns.isEmpty) return Nil
    def norm(s: String) = if (spec.caseSensitiveHeaders) s else s.toLowerCase
    val exp = spec.expectedColumns.map(norm)
    val act = actual.map(norm)
    val missing = exp.filterNot(act.contains)
    val extra = act.filterNot(exp.contains)
    val results = scala.collection.mutable.ArrayBuffer.empty[CheckResult]
    results += (if (missing.isEmpty)
      CheckResult("columns_required", "PASS", s"${exp.length} expected", "all present")
    else if (spec.requireAllColumns)
      CheckResult("columns_required", "FAIL", exp.mkString(","),
        act.mkString(","), s"missing: ${missing.mkString(",")}")
    else CheckResult("columns_required", "WARN", exp.mkString(","),
      act.mkString(","), s"missing (not required): ${missing.mkString(",")}"))
    results += (if (extra.isEmpty)
      CheckResult("columns_extra", "PASS", "no extras", "no extras")
    else if (spec.allowExtraColumns)
      CheckResult("columns_extra", "WARN", "no extras", extra.mkString(","), "allowed")
    else CheckResult("columns_extra", "FAIL", "no extras", extra.mkString(",")))
    if (missing.isEmpty && extra.isEmpty)
      results += (if (exp == act)
        CheckResult("columns_order", "PASS", "expected order", "expected order")
      else CheckResult("columns_order", "WARN", exp.mkString(","),
        act.mkString(","), "same set, different order"))
    results.toSeq
  }

  /** Row-count bounds; data rows = physical lines − 1 header line.
    * reference: ADLS_FILE_PRECHECK.py:1048-1093 */
  def checkRowCount(totalLines: Long, spec: PrecheckSpec): CheckResult = {
    val dataRows = math.max(0L, totalLines - 1)
    if (dataRows < spec.minRowCount)
      CheckResult("row_count", "FAIL", s">= ${spec.minRowCount}", dataRows.toString)
    else spec.maxRowCount match {
      case Some(max) if dataRows > max =>
        CheckResult("row_count", "FAIL", s"<= $max", dataRows.toString)
      case _ => CheckResult("row_count", "PASS",
        s">= ${spec.minRowCount}", dataRows.toString)
    }
  }

  /** First 5 data rows must have the header's field count.
    * reference: ADLS_FILE_PRECHECK.py:1098-1124 */
  def checkDelimiterConsistency(lines: Seq[String], delimiter: Char): CheckResult = {
    val clean = lines.map(l => stripBom(l).stripSuffix("\r"))
    clean match {
      case h +: data =>
        val headerN = parseCsvLine(h, delimiter).length
        val bad = data.take(5).zipWithIndex.collect {
          case (row, i) if parseCsvLine(row, delimiter).length != headerN =>
            s"row ${i + 1}: ${parseCsvLine(row, delimiter).length} fields"
        }
        if (bad.isEmpty) CheckResult("delimiter_consistency", "PASS",
          s"$headerN fields", s"$headerN fields")
        else CheckResult("delimiter_consistency", "FAIL",
          s"$headerN fields", bad.mkString("; "))
      case _ => CheckResult("delimiter_consistency", "FAIL", "data rows", "no rows")
    }
  }

  /** Run the full check battery over one file's sampled lines. */
  def checkFile(name: String, size: Long, lines: Seq[String], totalLines: Long,
      delimiter: Char, spec: PrecheckSpec): Seq[CheckResult] = {
    val sizeCheck = checkFileSize(name, size)
    if (sizeCheck.failed) return Seq(sizeCheck)
    val (headerCheck, cols) = checkHeaderReadable(lines, delimiter)
    val bomCheck = lines.headOption.map(checkBom).toSeq
    if (headerCheck.failed) return Seq(sizeCheck, headerCheck) ++ bomCheck
    Seq(sizeCheck, headerCheck) ++ bomCheck ++
      Seq(checkHeaderHygiene(cols)) ++
      checkColumns(cols, spec) ++
      Seq(checkRowCount(totalLines, spec),
        checkDelimiterConsistency(lines, delimiter))
  }

  def gate(results: Seq[CheckResult]): Boolean = !results.exists(_.failed)
}
