package graft

import org.scalatest.funsuite.AnyFunSuite

/** Build-time gate over every generated oracle SQL string.
  *
  * Round 10 shipped two red correctness rows (e71/e73) caused purely by
  * SQL-string generation: a stripMargin-ed CTE fragment was interpolated
  * into a second stripMargin template, and the second pass ate one pipe
  * of a continuation line that began with `||` — turning string concat
  * into DuckDB's bitwise-or over VARCHARs. The engine output was exact;
  * only the oracle text was broken. This spec gates the whole class:
  * a lone `|` (not part of `||`) in any [[SparkEntry.oracleSql]] value
  * is never intentional — DuckDB's `|` is integer bitwise-or and no
  * oracle uses it. Pipes inside single-quoted string literals (regex
  * alternation like BpePattern) are legitimate and excluded.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  /** Strip single-quoted SQL string literals (with `''` escapes) so
    * regex-alternation pipes inside them don't trip the lint. */
  private def withoutStringLiterals(sql: String): String =
    sql.replaceAll("'(?:[^']|'')*'", "''")

  private val LonePipe = "(?<!\\|)\\|(?!\\|)".r

  /** Returns the offending lines (for a readable failure message). */
  private def lonePipeLines(sql: String): Seq[String] =
    withoutStringLiterals(sql).linesIterator
      .filter(l => LonePipe.findFirstIn(l).isDefined)
      .toSeq

  test("the lint itself flags a double-stripMargin casualty") {
    // The exact shape of the round-10 bug: a continuation line that
    // started with `||` and lost one pipe to a second stripMargin.
    val broken = "SELECT md5(side || ':' || t || ':'\n" +
      "| CAST(k AS VARCHAR)) FROM vocab"
    assert(lonePipeLines(broken).nonEmpty)
    // ...and does NOT flag healthy concat or quoted alternation.
    assert(lonePipeLines("SELECT a || b FROM t").isEmpty)
    assert(lonePipeLines("SELECT regexp_extract_all(t, '[a-z]+|[0-9]+')").isEmpty)
    assert(lonePipeLines("SELECT 'it''s|fine' || x").isEmpty)
  }

  test("no oracle SQL contains a lone | outside string literals") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val bad = lonePipeLines(sql)
        if (bad.isEmpty) Nil else Seq(s"$name:\n  ${bad.mkString("\n  ")}")
    }
    assert(offenders.isEmpty,
      s"lone | (bitwise-or, never intended) in generated oracle SQL — " +
        s"likely a stripMargin composition bug:\n${offenders.mkString("\n")}")
  }

  test("every query has either an oracle or is deliberately rows-only") {
    // Guard against a queries/oracleSql drift: an oracle for a query
    // that doesn't exist is dead text that silently rots.
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- q
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }
}
