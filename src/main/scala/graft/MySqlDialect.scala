package graft

/** MySQL-dialect acceptance for the reference's SQL input surface.
  *
  * The reference parses its input as MySQL dialect
  * (`QueryService.asmx.cs:143-157` hands the statement to gudusoft with
  * `TDbVendor.DbVMysql`); the rebuild's engine speaks Spark SQL. For
  * the reference's actual SPJ parity shapes the two dialects coincide
  * almost everywhere — this object closes the documented gaps so a
  * reference user's MySQL-flavored statement runs unchanged:
  *
  *  - **`LIMIT offset, count`** (MySQL's two-argument form) is
  *    rewritten to Spark's `LIMIT count OFFSET offset`. This is the
  *    one construct in the parity surface Spark rejects outright.
  *  - **Backtick identifier quoting** needs no translation: Spark's
  *    identifier quote IS the backtick, same as MySQL.
  *  - **`<>` / `!=`**, integer `DIV`, `%`/`MOD`: identical in both.
  *  - **Double-quoted string literals** (MySQL default mode): Spark
  *    also reads `"..."` as a string literal unless
  *    `spark.sql.ansi.doubleQuotedIdentifiers` is enabled — the
  *    engine's sessions leave it off, preserving MySQL behavior.
  *  - **`IFNULL`, `NOW()`, `CONCAT`, `SUBSTRING_INDEX`, `COALESCE`**:
  *    Spark ships the same functions with the same semantics.
  *
  * Known divergences, documented rather than silently mistranslated
  * (README §SQL dialect): `DATE_FORMAT` patterns (`%Y` vs `yyyy`),
  * `GROUP_CONCAT` (use `array_join(collect_list(...), sep)`), implicit
  * string↔number coercion corners, and MySQL's case-insensitive string
  * comparison default (Spark compares binary). Statements relying on
  * those fail analysis loudly instead of returning subtly different
  * rows.
  *
  * The rewriter is a character-level scanner, not a regex: single- and
  * double-quoted literals (with `\`-escapes and doubled quotes) and
  * backtick identifiers are copied verbatim, so a literal containing
  * `LIMIT 1, 2` is never touched.
  */
object MySqlDialect {

  /** Translate a MySQL-dialect statement into Spark SQL. Idempotent on
    * statements that are already Spark SQL (the only rewrite triggers
    * on a construct Spark cannot parse). */
  def translate(sql: String): String = {
    val out = new StringBuilder(sql.length + 16)
    val n = sql.length
    var i = 0

    def copyQuoted(quote: Char): Unit = {
      // leading quote already consumed by caller
      out.append(quote)
      i += 1
      var done = false
      while (i < n && !done) {
        val c = sql.charAt(i)
        if (c == '\\' && i + 1 < n && quote != '`') {
          out.append(c).append(sql.charAt(i + 1)); i += 2
        } else if (c == quote && i + 1 < n && sql.charAt(i + 1) == quote) {
          out.append(c).append(quote); i += 2 // doubled quote escape
        } else if (c == quote) {
          out.append(c); i += 1; done = true
        } else {
          out.append(c); i += 1
        }
      }
    }

    def isWordChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_'

    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') copyQuoted(c)
      else if (isWordChar(c)) {
        val start = i
        while (i < n && isWordChar(sql.charAt(i))) i += 1
        val word = sql.substring(start, i)
        if (word.equalsIgnoreCase("LIMIT")) {
          // try to match the two-argument form: LIMIT <int> , <int>
          var j = i
          def skipWs(k0: Int): Int = {
            var k = k0
            while (k < n && Character.isWhitespace(sql.charAt(k))) k += 1
            k
          }
          def readInt(k0: Int): (String, Int) = {
            var k = k0
            while (k < n && Character.isDigit(sql.charAt(k))) k += 1
            (sql.substring(k0, k), k)
          }
          j = skipWs(j)
          val (a, j1) = readInt(j)
          val j2 = skipWs(j1)
          if (a.nonEmpty && j2 < n && sql.charAt(j2) == ',') {
            val j3 = skipWs(j2 + 1)
            val (b, j4) = readInt(j3)
            if (b.nonEmpty) {
              out.append("LIMIT ").append(b).append(" OFFSET ").append(a)
              i = j4
            } else out.append(word)
          } else out.append(word)
        } else out.append(word)
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }
}
