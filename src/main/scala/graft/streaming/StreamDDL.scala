package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.query.InfluxQL
import graft.query.InfluxQL._

/** DDL statements for continuous processing — reference:
  * `CreateStreamStatement` (`influxql/ast.go:11469`: name, target, query,
  * DELAY) and `CreateContinuousQueryStatement` (`ast.go:5352`: EVERY/FOR).
  *
  * `CREATE STREAM s INTO target SELECT sum(f) FROM m GROUP BY time(5s)[,
  * tags…] [DELAY 2s]` parses into a [[StreamStatement]]; `build` applies it
  * to a streaming source DataFrame, yielding the watermarked tumbling
  * aggregation ready for `Streams.into(df, targetPath, ckpt)`.
  */
object StreamDDL {

  case class StreamStatement(name: String, target: String,
                             calls: Seq[(String, String)], // (fn, field)
                             from: String, intervalNs: Long,
                             tags: Seq[String], delayNs: Long,
                             every: Option[Long] = None,
                             forNs: Option[Long] = None, // RESAMPLE FOR
                             onDb: Option[String] = None) // CQ ON <db>

  def parse(ddl: String): StreamStatement = {
    var toks = InfluxQL.lex(ddl)
    def peek: Tok = toks.headOption.getOrElse(TPunct("<eof>"))
    def next(): Tok = { val t = peek; toks = toks.drop(1); t }
    def ident(): String = next() match {
      case TIdent(s) => s
      // the reference's stream grammar names the stream with a STRING
      // literal (sql.y CREATE STREAM STRING_TYPE INTO …)
      case TStr(s) => s
      case t => sys.error(s"expected identifier, got $t")
    }
    def kw(s: String): Unit = {
      val t = ident()
      require(t.equalsIgnoreCase(s), s"expected $s, got $t")
    }
    def isKw(s: String): Boolean = peek match {
      case TIdent(i) => i.equalsIgnoreCase(s)
      case _ => false
    }
    def punct(p: String): Unit = next() match {
      case TPunct(`p`) =>
      case t => sys.error(s"expected '$p', got $t")
    }
    def dur(): Long = next() match {
      case TDur(ns) => ns
      case t => sys.error(s"expected duration, got $t")
    }

    kw("create")
    val isCQ = peek match {
      case TIdent(s) if s.equalsIgnoreCase("continuous") =>
        next(); kw("query"); true
      case _ => kw("stream"); false
    }
    val name = ident()
    // reference grammar (ast.go:5352): CREATE CONTINUOUS QUERY n ON db
    var onDb: Option[String] = None
    if (isCQ && isKw("on")) { next(); onDb = Some(ident()) }
    var every: Option[Long] = None
    var forNs: Option[Long] = None
    if (isCQ && isKw("resample")) { // RESAMPLE [EVERY <dur>] [FOR <dur>]
      next()
      if (isKw("every")) { next(); every = Some(dur()) }
      if (isKw("for")) { next(); forNs = Some(dur()) }
      require(every.isDefined || forNs.isDefined,
        "RESAMPLE requires EVERY and/or FOR")
    }
    if (isKw("begin")) next() // CQ body marker
    // two body orders: the reference's `SELECT … INTO t FROM …` and the
    // stream form `INTO t SELECT … FROM …`
    var target: String = null
    if (isKw("into")) {
      next(); target = ident()
      // qualified db.rp.mst target (sql.y TABLE_NAME_WITH_OPTION): keep
      // the measurement name, the serving layer resolves the namespace
      while (peek == TPunct(".")) { next(); target = ident() }
    }
    // reference stream form separates target and body with ON
    // (sql.y: CREATE STREAM STRING_TYPE INTO target ON SELECT …)
    if (isKw("on")) next()
    kw("select")
    var calls = Seq.empty[(String, String)]
    var more = true
    while (more) {
      val fn = ident(); punct("(")
      val field = next() match {
        case TIdent(f) => f
        case TPunct("*") => "*"
        case t => sys.error(s"bad field: $t")
      }
      punct(")")
      calls :+= ((fn.toLowerCase, field))
      if (peek == TPunct(",") ) { next(); more = true } else more = false
    }
    if (target == null) { kw("into"); target = ident() }
    kw("from")
    val from = ident()
    kw("group"); kw("by")
    kw("time"); punct("("); val interval = dur(); punct(")")
    var tags = Seq.empty[String]
    while (peek == TPunct(",")) { next(); tags :+= ident() }
    var delay = 0L
    if (isKw("delay")) { next(); delay = dur() }
    if (isKw("end")) next()
    StreamStatement(name, target, calls, from, interval, tags, delay,
      every, forNs, onDb)
  }

  private def aggOf(fn: String, field: String): Column = fn match {
    case "count" => (if (field == "*") count(lit(1)) else count(col(field)))
      .as("count")
    case "sum" => sum(col(field)).as("sum")
    case "mean" => avg(col(field)).as("mean")
    case "min" => min(col(field)).as("min")
    case "max" => max(col(field)).as("max")
    case other => sys.error(s"stream-incompatible aggregate $other")
  }

  /** `CREATE SUBSCRIPTION name ON db.rp DESTINATIONS ALL|ANY 'url', …`
    * (`influxql/ast.go:6049`). Returns the parsed statement; wire it to a
    * stream with [[Streams.subscriptionSink]]. */
  case class Subscription(name: String, db: String, rp: String,
                          mode: String, destinations: Seq[String])

  def parseSubscription(ddl: String): Subscription = {
    var toks = InfluxQL.lex(ddl)
    def peek: Tok = toks.headOption.getOrElse(TPunct("<eof>"))
    def next(): Tok = { val t = peek; toks = toks.drop(1); t }
    def ident(): String = next() match {
      case TIdent(s) => s
      case TStr(s) => s
      case t => sys.error(s"expected identifier, got $t")
    }
    def kw(s: String): Unit = {
      val t = ident()
      require(t.equalsIgnoreCase(s), s"expected $s, got $t")
    }
    kw("create"); kw("subscription")
    val name = ident()
    kw("on")
    val db = ident()
    require(next() == TPunct("."), "expected db.rp")
    val rp = ident()
    kw("destinations")
    val mode = ident().toUpperCase
    require(mode == "ALL" || mode == "ANY",
      s"unknown subscription mode $mode")
    var dests = Seq.empty[String]
    var more = true
    while (more) {
      next() match {
        case TStr(u) => dests :+= u
        case t => sys.error(s"expected destination string, got $t")
      }
      if (peek == TPunct(",")) next() else more = false
    }
    Subscription(name, db, rp, mode, dests)
  }

  /** Apply the parsed statement to a streaming source of its FROM
    * measurement (time column `time`). */
  def build(stmt: StreamStatement, source: DataFrame,
            time: String = "time"): DataFrame =
    Streams.createStream(source, time,
      delay = s"${stmt.delayNs / 1000000} milliseconds",
      interval = s"${stmt.intervalNs / 1000000} milliseconds",
      tags = stmt.tags,
      aggs = stmt.calls.map { case (fn, f) => aggOf(fn, f) })
}
