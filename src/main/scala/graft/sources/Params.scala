package graft.sources

/** Shared stage-parameter parsing: pipe-delimited positional args,
  * `k=v` pairs, and quote stripping — one implementation replacing the
  * reference's five near-copies
  * (reference: SF_Notebooks/RAW_ADLS_TO_RAW_SNOWFLAKE.py:68-218 and
  * the four variants cited in SURVEY §2.8).
  */
object Params {

  final case class Parsed(positional: Seq[String], named: Map[String, String]) {
    def apply(i: Int): Option[String] = positional.lift(i).filter(_.nonEmpty)
    def get(key: String): Option[String] = named.get(key.toLowerCase)
  }

  def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
      ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** "a|b|c" or "practice=x|file_type=y" or a mix; quotes stripped. */
  def parse(raw: String): Parsed = {
    val parts = stripQuotes(raw).split('|').map(stripQuotes).toSeq
    val named = parts.collect {
      case p if p.contains('=') =>
        val Array(k, v) = p.split("=", 2)
        k.trim.toLowerCase -> stripQuotes(v)
    }.toMap
    Parsed(parts.filterNot(_.contains('=')), named)
  }
}
