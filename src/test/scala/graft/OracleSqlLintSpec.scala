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

  /** CTE names declared anywhere in the SQL — `name AS (` or
    * `name AS MATERIALIZED (` — at every nesting level. */
  private val CteDecl = "(?i)(\\w+)\\s+AS\\s+(?:MATERIALIZED\\s+)?\\(".r

  /** Names declared in a scope that ENCLOSES a later same-named
    * declaration. Two sibling nested WITHs reusing a name is fine
    * (each is its own scope, invisible to the other — e72/e85 compose
    * member oracles that way); an outer-chain name redeclared inside a
    * nested WITH is the hazard, because DuckDB's binder can resolve
    * the inner reference to the OUTER CTE (the e86 round-11 bug). */
  private def shadowedCtes(sql: String): Seq[String] = {
    val s = withoutStringLiterals(sql)
    // For every position, the stack of open-paren positions enclosing it.
    val decls = CteDecl.findAllMatchIn(s)
      .map(m => (m.group(1).toLowerCase, m.start)).toSeq
    def enclosingStack(pos: Int): List[Int] = {
      var stack = List.empty[Int]
      var i = 0
      while (i < pos) {
        s.charAt(i) match {
          case '(' => stack = i :: stack
          case ')' => if (stack.nonEmpty) stack = stack.tail
          case _ =>
        }
        i += 1
      }
      stack
    }
    val withScopes = decls.map { case (n, p) => (n, p, enclosingStack(p)) }
    (for {
      Seq((na, pa, sa), (nb, pb, sb)) <- withScopes.combinations(2)
      if na == nb
      // a's scope encloses b's iff a's enclosing-paren stack is a
      // suffix of b's (same scope = equal stacks, also a hazard)
      if sb.endsWith(sa) || sa.endsWith(sb)
    } yield na).toSeq.distinct.sorted
  }

  test("the CTE-name lint flags a nested shadowing collision") {
    // The exact shape of the round-11 bug (e86): an outer CTE chain
    // defines `sc`, a nested `WITH ... sc AS (...)` fragment is
    // interpolated inside a MATERIALIZED CTE, and DuckDB's binder
    // resolves the inner `FROM sc` to the OUTER sc — a BinderException
    // at best, silent wrong data at worst.
    val broken =
      """WITH sc AS (SELECT doc_id, margin FROM t),
        |x AS MATERIALIZED (
        |  WITH sc AS (SELECT doc_id, p_fp FROM u)
        |  SELECT p_fp FROM sc)
        |SELECT * FROM sc JOIN x USING (doc_id)""".stripMargin
    assert(shadowedCtes(broken) == Seq("sc"))
    assert(shadowedCtes("WITH a AS (SELECT 1), b AS (SELECT 2) SELECT 3").isEmpty)
    // two SIBLING nested scopes may reuse a name — each is invisible
    // to the other (the e72/e85 composed-member shape)
    val siblings =
      """WITH x AS MATERIALIZED (
        |  WITH c AS (SELECT 1 AS v) SELECT v FROM c),
        |y AS MATERIALIZED (
        |  WITH c AS (SELECT 2 AS v) SELECT v FROM c)
        |SELECT * FROM x JOIN y ON true""".stripMargin
    assert(shadowedCtes(siblings).isEmpty)
    // same-scope duplicate is a hazard
    assert(shadowedCtes("WITH a AS (SELECT 1), a AS (SELECT 2) SELECT 3")
      == Seq("a"))
    // casts and table-function aliases are not CTE declarations
    assert(shadowedCtes(
      "SELECT CAST(x AS DECIMAL(10,2)) FROM t, UNNEST(g(1, n)) AS t2(i)").isEmpty)
  }

  test("no oracle SQL shadows an enclosing-scope CTE name") {
    // DuckDB does not reliably shadow an outer (esp. MATERIALIZED) CTE
    // with a same-named CTE in a nested WITH — composed fragments must
    // not reuse a name visible from an enclosing scope.
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val dup = shadowedCtes(sql)
        if (dup.isEmpty) Nil else Seq(s"$name: ${dup.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"nested CTE shadows an enclosing-scope name in generated oracle " +
        s"SQL — DuckDB binder resolution is unreliable there:\n" +
        offenders.mkString("\n"))
  }

  test("every query has either an oracle or is deliberately rows-only") {
    // Guard against a queries/oracleSql drift: an oracle for a query
    // that doesn't exist is dead text that silently rots.
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- q
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }
}
