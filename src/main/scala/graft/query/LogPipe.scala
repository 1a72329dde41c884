package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Logkeeper pipe-syntax log query language ("PPL").
  *
  * Reference grammar: `lib/util/lifted/logparser/sql.y` (yacc) over the
  * tokens of `logparser/scanner.go` + `token.go`, served by
  * `httpd/handler_logstore_query.go` (`serveQueryLog` / `serveAnalytics`
  * / `serveAggLogQuery`) through `handler_logstore.go:1981` parseLogQuery
  * and `:2216` getPplAndSqlFromQuery. A query is pipe-separated segments
  * `Ppl0 | Ppl1 | … [| SELECT …]`: each PPL segment is either a full-text
  * filter expression or ONE `EXTRACT(field:"re") AS(k1,k2…)` clause; all
  * segment conditions AND together and an optional trailing InfluxQL
  * SELECT consumes the filtered/extracted rows (sql.y BITWISE_OR_CONDITION
  * combination + parseLogQuery's Condition/Sources merge).
  *
  * Semantics re-expressed on Spark:
  *   - a bare term / `field:value` / `field=value` is MATCHPHRASE, i.e.
  *     substring containment (sql.y buildCondExpr EQ→MATCHPHRASE; the
  *     same mapping our InfluxQL frontend compiles for MATCHPHRASE);
  *   - the default full-text field `__log___` (logparser.go:15) resolves
  *     to the log stream's content column;
  *   - `field:*` / bare `*` → `field != ''` (buildCondExpr's Wildcard arm);
  *   - `field in (lo hi]`-style ranges → two comparisons ANDed
  *     (buildRangeExpr), `( ) [ ]` choosing strict/inclusive ends;
  *   - adjacency is AND and binds tightest (`get iamges or x` parses as
  *     `(get AND iamges) OR x` — sql.y's BAND production), then AND,
  *     then OR (yacc %left precedence order);
  *   - `EXTRACT(f:"re") AS(a,b)` compiles to the existing
  *     [[graft.operators.Unnest]] column extraction: one
  *     `regexp_extract` projection per capture group, no row
  *     multiplication — codegen'd, zero-shuffle, and later segments'
  *     conditions can reference the extracted names.
  *
  * Everything a pipe query compiles to is a pushdown-friendly Column
  * expression over the measurement scan — filters reach the parquet
  * reader, extraction is a narrow projection, and the optional trailing
  * SELECT reuses the InfluxQL executor wholesale.
  */
object LogPipe {

  /** logparser.go:15 `DefaultFieldForFullText`. */
  val DefaultField = "__log___"

  // ----------------------------------------------------------------- AST
  sealed trait Expr
  /** MATCHPHRASE: substring containment; `field` None = full-text field. */
  final case class Match(field: Option[String], value: String) extends Expr
  /** `field != ''` — the wildcard-value form. */
  final case class NotEmpty(field: Option[String]) extends Expr
  /** Ordered comparison (`< <= > >=`); EQ is [[Match]] per the grammar. */
  final case class Cmp(field: String, op: String, value: String) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Paren(e: Expr) extends Expr

  /** `EXTRACT(field:"regex") AS(a, b…)` → match_all capture columns. */
  final case class Extract(field: Option[String], regex: String,
                           aliases: Seq[String])

  /** One parsed pipe query: ANDed condition + at most one extract
    * (the reference errors on two — sql.y:168). */
  final case class Statement(cond: Option[Expr], extract: Option[Extract])

  // -------------------------------------------------------------- lexer
  private sealed trait Tok
  private case object TPipe extends Tok
  private case object TLParen extends Tok
  private case object TRParen extends Tok
  private case object TLSquare extends Tok
  private case object TRSquare extends Tok
  private case object TComma extends Tok
  private case object TColon extends Tok
  private final case class TOp(op: String) extends Tok
  /** A value word. `quoted` words are never keywords/wildcards;
    * digit-led words scan with a smaller terminator set (scanner.go
    * isNumTerminator excludes `:`/`,` so `10:00:00` and `127.0.0.1`
    * stay single tokens). */
  private final case class TWord(text: String, quoted: Boolean) extends Tok
  private final case class TKey(k: String) extends Tok
  private case object TEof extends Tok

  private val keywords = Set("extract", "as", "and", "or", "in")
  private def isNumTerm(c: Char) =
    c == '|' || c == '(' || c == ')' || c == '[' || c == ']' ||
    c == '<' || c == '>' || c == '=' || c == ' ' || c == '\t' || c == '\n'
  private def isIdentTerm(c: Char) = isNumTerm(c) || c == ':' || c == ','

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
      else if (c == '"') {
        // scanner.go ScanString: escapes \n \\ \" \'
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= s.length) sys.error("bad string: unterminated quote")
          s.charAt(i) match {
            case '"' => done = true; i += 1
            case '\\' =>
              if (i + 1 >= s.length) sys.error("bad escape at end of input")
              s.charAt(i + 1) match {
                case 'n' => sb += '\n'
                case '\\' => sb += '\\'
                case '"' => sb += '"'
                case '\'' => sb += '\''
                case e => sys.error(s"bad escape \\$e")
              }
              i += 2
            case '\n' => sys.error("bad string: newline in quote")
            case ch => sb += ch; i += 1
          }
        }
        out += TWord(sb.result(), quoted = true)
      } else {
        c match {
          case '|' => out += TPipe; i += 1
          case '(' => out += TLParen; i += 1
          case ')' => out += TRParen; i += 1
          case '[' => out += TLSquare; i += 1
          case ']' => out += TRSquare; i += 1
          case ',' => out += TComma; i += 1
          case ':' => out += TColon; i += 1
          case '=' => out += TOp("="); i += 1
          case '<' | '>' =>
            if (i + 1 < s.length && s.charAt(i + 1) == '=') {
              out += TOp(s"$c="); i += 2
            } else { out += TOp(c.toString); i += 1 }
          case d if d.isDigit =>
            val start = i
            while (i < s.length && !isNumTerm(s.charAt(i))) i += 1
            out += TWord(s.substring(start, i), quoted = false)
          case _ =>
            val start = i
            while (i < s.length && !isIdentTerm(s.charAt(i))) i += 1
            val w = s.substring(start, i)
            if (keywords.contains(w.toLowerCase))
              out += TKey(w.toLowerCase)
            else out += TWord(w, quoted = false)
        }
      }
    }
    out += TEof
    out.result()
  }

  // ------------------------------------------------------------- parser
  /** Parse a full PPL text (pipe-separated segments, no trailing SQL —
    * split that off first with [[splitPplSql]]). */
  def parse(ppl: String): Statement = {
    val toks = lex(ppl)
    var pos = 0
    def peek: Tok = toks(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expect(t: Tok, what: String): Unit =
      if (next() != t) sys.error(s"expected $what")

    def word(): (String, Boolean) = next() match {
      case TWord(w, q) => (w, !q && w == "*")
      case t => sys.error(s"expected value, got $t")
    }

    // COLUMN_SEMI (sql.y:294): value | field:value | field op value |
    // field in <range>
    def semi(): Expr = {
      val (first, firstWild) = word()
      peek match {
        case TColon | TOp("=") =>
          next()
          val (v, wild) = word()
          if (wild) NotEmpty(Some(first)) else Match(Some(first), v)
        case TOp(op) =>
          next()
          val (v, wild) = word()
          if (wild) NotEmpty(Some(first)) else Cmp(first, op, v)
        case TKey("in") =>
          next()
          val loInc = next() match {
            case TLParen => false
            case TLSquare => true
            case t => sys.error(s"expected ( or [ after in, got $t")
          }
          val (lo, _) = word()
          val (hi, _) = word()
          val hiInc = next() match {
            case TRParen => false
            case TRSquare => true
            case t => sys.error(s"expected ) or ] closing range, got $t")
          }
          And(Cmp(first, if (loInc) ">=" else ">", lo),
            Cmp(first, if (hiInc) "<=" else "<", hi))
        case _ =>
          if (firstWild) NotEmpty(None) else Match(None, first)
      }
    }

    // adjacency = AND, binds tightest (sql.y BAND)
    def band(): Expr = {
      var e = semi()
      var go = true
      while (go) peek match {
        case TWord(_, _) => e = And(e, semi())
        case _ => go = false
      }
      e
    }

    def unit(): Expr = peek match {
      case TLParen =>
        next()
        val e = orExpr()
        expect(TRParen, ")")
        Paren(e)
      case _ => band()
    }

    def andExpr(): Expr = {
      var e = unit()
      while (peek == TKey("and")) { next(); e = And(e, unit()) }
      e
    }

    def orExpr(): Expr = {
      var e = andExpr()
      while (peek == TKey("or")) { next(); e = Or(e, andExpr()) }
      e
    }

    // EXTRACT ( COLUMN_SEMI ) AS ( aliases ) — sql.y:251
    def extractClause(): Extract = {
      expect(TKey("extract"), "EXTRACT")
      expect(TLParen, "(")
      val inner = semi()
      expect(TRParen, ")")
      expect(TKey("as"), "AS")
      expect(TLParen, "(")
      val aliases = Seq.newBuilder[String]
      aliases += word()._1
      while (peek == TComma) { next(); aliases += word()._1 }
      expect(TRParen, ")")
      inner match {
        case Match(f, re) => Extract(f, re, aliases.result())
        case e => sys.error(s"EXTRACT needs field:\"regex\", got $e")
      }
    }

    // segments: conds AND together, at most one extract (sql.y:154-199)
    var cond: Option[Expr] = None
    var extract: Option[Extract] = None
    var more = true
    while (more) {
      peek match {
        case TKey("extract") =>
          if (extract.isDefined)
            sys.error("only one extract statement is supported")
          extract = Some(extractClause())
        case TEof | TPipe => // empty segment (stripped `*` leaves these)
        case _ =>
          val c = orExpr()
          cond = cond.map(And(_, c)).orElse(Some(c))
      }
      peek match {
        case TPipe => next()
        case TEof => more = false
        case t => sys.error(s"unexpected $t after segment")
      }
    }
    Statement(cond, extract)
  }

  // ----------------------------------------------------------- renderer
  /** InfluxQL keywords that force identifier quoting — the public
    * InfluxQL spec's keyword list (influxql token.go), which is why the
    * reference renders `field in (10 100)` as `"field" > '10' …`. */
  private val influxKeywords = Set(
    "all", "alter", "analyze", "and", "any", "as", "asc", "begin", "by",
    "cardinality", "create", "continuous", "database", "databases",
    "default", "delete", "desc", "destinations", "diagnostics",
    "distinct", "drop", "duration", "end", "every", "exact", "explain",
    "field", "for", "from", "grant", "grants", "group", "groups", "in",
    "inf", "insert", "into", "key", "keys", "kill", "limit",
    "measurement", "measurements", "name", "offset", "on", "order",
    "password", "policy", "policies", "privileges", "queries", "query",
    "read", "replication", "resample", "retention", "revoke", "select",
    "series", "set", "show", "shard", "shards", "slimit", "soffset",
    "stats", "subscription", "subscriptions", "tag", "to", "user",
    "users", "values", "where", "with", "write")

  private def quoteIdent(n: String): String =
    if (n.matches("^[a-zA-Z_][a-zA-Z0-9_]*$") &&
        !influxKeywords.contains(n.toLowerCase)) n
    else "\"" + n.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def quoteString(v: String): String =
    "'" + v.replace("'", "\\'").replace("\n", "\\n") + "'"

  private def fieldStr(f: Option[String]): String = f match {
    // the default full-text VarRef carries ::string (sql.y:56 sets
    // Type String only on this arm), explicit fields render bare
    case None => DefaultField + "::string"
    case Some(n) => quoteIdent(n)
  }

  /** The reference's `LogPipeStatement.String()` text — used by the spec
    * corpus to replay `logparser_test.go` expectation strings verbatim. */
  def render(st: Statement): String =
    st.cond.map(render).getOrElse("") +
      st.extract.map(u => "|" + render(u)).getOrElse("")

  def render(e: Expr): String = e match {
    case Match(f, v) => s"${fieldStr(f)} MATCHPHRASE ${quoteString(v)}"
    case NotEmpty(f) => s"${fieldStr(f)} != ''"
    case Cmp(f, op, v) => s"${quoteIdent(f)} $op ${quoteString(v)}"
    case And(l, r) => s"${render(l)} AND ${render(r)}"
    case Or(l, r) => s"${render(l)} OR ${render(r)}"
    case Paren(i) => s"(${render(i)})"
  }

  def render(u: Extract): String = {
    val re = "\"" + u.regex.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"UNNEST(match_all($re, ${fieldStr(u.field)})) AS(${u.aliases.mkString(", ")})"
  }

  // ----------------------------------------------------------- compiler
  /** Compile onto a DataFrame: extract first (adds capture columns), then
    * one ANDed filter — so later pipe segments see extracted names, the
    * parseLogQuery merge order. `fullText` is what `__log___` resolves
    * to. Ordered comparisons are numeric when the column is numeric and
    * the literal parses (the engine coerces against the schema), else
    * lexicographic on strings — extracted capture columns are always
    * strings (sql.y sets DstType String). */
  def compile(df: DataFrame, st: Statement,
              fullText: String): DataFrame = {
    val un = st.extract.map(e => graft.operators.Unnest.matchAll(
      df, e.field.getOrElse(fullText), e.regex, e.aliases)).getOrElse(df)
    st.cond.map(c => un.filter(condCol(un, c, fullText))).getOrElse(un)
  }

  private def condCol(df: DataFrame, e: Expr, fullText: String): Column = {
    def f(name: Option[String]): Column =
      col(name.getOrElse(fullText))
    e match {
      case Match(fld, v) => f(fld).cast("string").contains(v)
      case NotEmpty(fld) => f(fld).cast("string") =!= ""
      case Cmp(fld, op, v) =>
        val c = col(fld)
        val numeric = df.schema.fields.find(_.name == fld)
          .exists(_.dataType.isInstanceOf[NumericType])
        val (l, r): (Column, Column) =
          if (numeric && scala.util.Try(v.toDouble).isSuccess)
            (c.cast("double"), lit(v.toDouble))
          else (c.cast("string"), lit(v))
        op match {
          case "<" => l < r
          case "<=" => l <= r
          case ">" => l > r
          case ">=" => l >= r
          case o => sys.error(s"unsupported comparison $o")
        }
      case And(l, r) => condCol(df, l, fullText) && condCol(df, r, fullText)
      case Or(l, r) => condCol(df, l, fullText) || condCol(df, r, fullText)
      case Paren(i) => condCol(df, i, fullText)
    }
  }

  // ----------------------------------------- handler-level query splits
  /** Split `Ppl0 | Ppl1 | … | SELECT …` into (ppl, Some(sql)) — the SQL
    * tail exists only when the LAST top-level pipe segment starts with
    * `select ` (handler_logstore.go:2216 getPplAndSqlFromQuery). Also
    * strips match-everything segments (`*`, `f:*`) the way
    * removeMulAndSpace does before parsing. */
  def splitPplSql(query: String): (String, Option[String]) = {
    val lastPipe = lastTopLevelPipe(query)
    if (lastPipe >= 0) {
      val tail = query.substring(lastPipe + 1)
      if (tail.trim.toLowerCase.startsWith("select "))
        return (stripStarSegments(query.substring(0, lastPipe)),
          Some(tail.trim))
    }
    (stripStarSegments(query), None)
  }

  /** Index of the last `|` outside quotes (getLastPipeIndex — both quote
    * styles count there, with backslash escapes). */
  private def lastTopLevelPipe(q: String): Int = {
    var last = -1; var inQ = false; var esc = false; var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (esc) esc = false
      else if (c == '\\') esc = true
      else if (c == '"' || c == '\'') inQ = !inQ
      else if (!inQ && c == '|') last = i
      i += 1
    }
    last
  }

  /** removeMulAndSpace (handler_logstore.go:2186): drop segments that are
    * only `*`/spaces, or exactly `name:stars-and-spaces` — they filter
    * nothing. Splitting respects double quotes (splitLogQueryString). */
  def stripStarSegments(s: String): String = {
    val segs = Seq.newBuilder[String]
    val sb = new StringBuilder; var inQ = false
    s.foreach { c =>
      if (c == '"') { inQ = !inQ; sb += c }
      else if (!inQ && c == '|') { segs += sb.result(); sb.clear() }
      else sb += c
    }
    if (sb.nonEmpty) segs += sb.result()
    def allStars(t: String) = t.nonEmpty && t.forall(c => c == '*' || c == ' ')
    segs.result().filter { seg =>
      val sub = seg.split(":", -1)
      if (sub.length == 2) !allStars(sub(1)) && sub(1).trim.nonEmpty
      else !(seg.trim.nonEmpty && allStars(seg))
    }.filter(_.trim.nonEmpty).mkString("|")
  }

  // ----------------------------------------------- adaptive histogram
  /** Histogram bucket width for a [startMs, endMs) range, aiming at
    * ~30-60 buckets snapped to a human interval ladder — the contract of
    * `lib/logstore/bucket.go` GetAdaptiveTimeBucket (our ladder is the
    * same second/minute/hour steps; the reference's exact slot table is
    * cosmetic). */
  def adaptiveBucketMs(startMs: Long, endMs: Long): Long = {
    val ladder = Seq(1L, 5, 10, 30, 60, 300, 600, 1800, 3600, 10800,
      21600, 43200, 86400, 604800).map(_ * 1000L)
    val span = math.max(endMs - startMs, 1L)
    ladder.find(span / _ <= 60).getOrElse(ladder.last)
  }
}
