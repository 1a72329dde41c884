package graft

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.server.HttpGateway

/** Replays the reference's OWN golden e2e corpus: every statically-
  * resolvable (write, query, expected-JSON) triple of
  * `tests/server_test.go` (extracted by `tools/port_server_tests.py`
  * into `server_corpus.json` — 89 test funcs, ~1450 queries), driven
  * through /write + /query over live HTTP and compared byte-identical,
  * exactly like the reference's `Query.success()`
  * (`tests/server_helpers.go:771` — `q.exp == q.act` string equality).
  *
  * Queries the reference itself marks `skip: true` are excluded by the
  * extractor. Divergences we accept are pinned in
  * `server_corpus_exclusions.json` with a reason each; anything not
  * pinned must match byte-for-byte.
  *
  * Report mode: set SPARK_GRAFT_CORPUS_REPORT=/path to dump every
  * mismatch as JSON (and not fail) — the triage loop for new
  * divergences.
  */
class ServerCorpusSpec extends SparkSpec {

  private case class CQuery(name: String, command: String,
                            params: Map[String, String], exp: String)
  private case class CWrite(db: String, rp: String, data: String)
  private case class CFunc(func: String, line: Int, db: String, rp: String,
                           precreate: Seq[String], initAt: Int,
                           writes: Seq[CWrite], queries: Seq[CQuery])

  private lazy val corpus: Seq[CFunc] = {
    val in = getClass.getResourceAsStream("/server_corpus.json")
    require(in != null, "server_corpus.json missing from test resources " +
      "— run tools/port_server_tests.py")
    val txt = new String(in.readAllBytes(), UTF_8)
    val JArray(items) = JsonMethods.parse(txt).asInstanceOf[JArray]
    items.map { it =>
      def str(k: String) = (it \ k).asInstanceOf[JString].s
      val JArray(ws) = (it \ "writes").asInstanceOf[JArray]
      val JArray(qs) = (it \ "queries").asInstanceOf[JArray]
      CFunc(str("func"), (it \ "line").asInstanceOf[JInt].num.toInt,
        str("db"), str("rp"),
        (it \ "precreate") match {
          case JArray(ps) => ps.map(_.asInstanceOf[JString].s)
          case _ => Nil
        },
        (it \ "init_at") match {
          case JInt(n2) => n2.toInt
          case _ => 0
        },
        ws.map(w => CWrite((w \ "db").asInstanceOf[JString].s,
          (w \ "rp").asInstanceOf[JString].s,
          (w \ "data").asInstanceOf[JString].s)),
        qs.map { q =>
          val ps = (q \ "params") match {
            case JObject(fs) =>
              fs.map { case (k, v) => k -> v.asInstanceOf[JString].s }.toMap
            case _ => Map.empty[String, String]
          }
          CQuery((q \ "name").asInstanceOf[JString].s,
            (q \ "command").asInstanceOf[JString].s, ps,
            (q \ "exp").asInstanceOf[JString].s)
        })
    }
  }

  /** Accepted divergences: "func::idx" → reason. */
  private lazy val exclusions: Map[String, String] = {
    val in = getClass.getResourceAsStream("/server_corpus_exclusions.json")
    if (in == null) Map.empty
    else JsonMethods.parse(new String(in.readAllBytes(), UTF_8)) match {
      case JObject(fs) =>
        fs.map { case (k, v) => k -> v.asInstanceOf[JString].s }.toMap
      case _ => Map.empty
    }
  }

  private val reportPath = sys.env.get("SPARK_GRAFT_CORPUS_REPORT")
  private val onlyFunc = sys.env.get("SPARK_GRAFT_CORPUS_ONLY")
    .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
  private val report =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private lazy val http = HttpClient.newHttpClient()
  private def enc(s: String) = URLEncoder.encode(s, UTF_8)

  /** Byte-equality with ONE relaxation: embedded JSON numbers may differ
    * in the last ulps (rel. 1e-9). The reference sums float groups
    * serially in time order; any parallel engine's partition-order
    * summation legitimately lands a neighboring double (e.g.
    * Null_Aggregate stddev(*) 36.90143135927978 vs …76). Structure and
    * every non-numeric byte still compare exactly. */
  private def numTolerantEq(a: String, b: String): Boolean = {
    val num = "-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?".r
    val aT = num.findAllIn(a).toVector
    val bT = num.findAllIn(b).toVector
    num.replaceAllIn(a, "#") == num.replaceAllIn(b, "#") &&
      aT.size == bT.size && aT.zip(bT).forall { case (x, y) =>
        x == y || (try {
          val dx = x.toDouble; val dy = y.toDouble
          math.abs(dx - dy) <=
            1e-9 * math.max(math.abs(dx), math.abs(dy))
        } catch { case _: NumberFormatException => false })
      }
  }

  private def ask(g: HttpGateway, q: String,
                  params: Map[String, String] = Map.empty)
      : HttpResponse[String] = {
    // a test's own chunked/chunk_size params pass through (the
    // Query_By_Chunked corpus compares the newline-joined chunk docs);
    // everything else replays non-chunked
    val ps = (Map("chunked" -> "false") ++ params + ("q" -> q))
      .toSeq.sorted
      .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
    http.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${g.boundPort}/query?$ps"))
      .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
  }

  private def write(g: HttpGateway, w: CWrite): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${g.boundPort}/write?db=${enc(w.db)}" +
          s"&rp=${enc(w.rp)}"))
      .POST(HttpRequest.BodyPublishers.ofString(w.data)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def runFunc(f: CFunc): Unit = {
    val g = new HttpGateway(spark, Map.empty, Map.empty)
    g.start()
    try {
      // databases the Go func creates via the API before queries run:
      // suite loaders (s.CreateDatabase — bare "db") and gated-init
      // funcs (CreateDatabaseAndRetentionPolicy — "db/rp")
      f.precreate.foreach { spec =>
        val (db, rp) = spec.split('/') match {
          case Array(d, r) => (d, r)
          case _ => (spec, "")
        }
        assert(ask(g, s"CREATE DATABASE $db").statusCode() == 200,
          s"${f.func}: precreate $db")
        if (rp.nonEmpty && rp != "autogen")
          assert(ask(g, s"CREATE RETENTION POLICY $rp ON $db " +
            "DURATION 0s REPLICATION 1 DEFAULT").statusCode() == 200,
            s"${f.func}: precreate rp $rp")
      }
      // the reference's writeTestData: CreateDatabaseAndRetentionPolicy
      // (db, rp{duration 0 = infinite, replica 1}, makeDefault=true).
      // Some funcs gate test.init on a later query index (`if i == 2`),
      // running DDL queries against the EMPTY server first.
      def doInit(): Unit = {
        val dbs = f.writes.map(w => (w.db, w.rp)).distinct
        dbs.foreach { case (db, rp) =>
          assert(ask(g, s"CREATE DATABASE $db").statusCode() == 200,
            s"${f.func}: CREATE DATABASE $db")
          if (rp.nonEmpty && rp != "autogen") {
            val r = ask(g, s"CREATE RETENTION POLICY $rp ON $db " +
              "DURATION 0s REPLICATION 1 DEFAULT")
            // precreate may have made it already (gated-init funcs)
            assert(r.statusCode() == 200 ||
              r.body().contains("already exists"),
              s"${f.func}: rp: ${r.body()}")
          }
        }
        f.writes.foreach { w =>
          val r = write(g, w)
          assert(r.statusCode() == 204,
            s"${f.func}: write failed ${r.statusCode()}: " +
              s"${r.body().take(200)}")
        }
      }
      if (f.initAt == 0) doInit()
      var mismatches = List.empty[String]
      f.queries.zipWithIndex.foreach { case (q, idx) =>
        if (f.initAt > 0 && idx == f.initAt) doInit()
        val key = s"${f.func}::$idx"
        val act0 = ask(g, q.command, q.params).body()
        // chunked responses are newline-joined documents; a trailing
        // newline is a transport detail, not part of the contract
        val act = act0.stripSuffix("\n")
        val exp = q.exp.stripSuffix("\n")
        // families the reference's OWN test grades with a custom
        // comparator instead of byte equality. ShowTagValues_Disorder:
        // the reference's time-filtered tag-value path dedups through Go
        // maps twice (TagSets.ForEach, show_tag_values.go:70;
        // deduplicateBySet, show_tag_values_executor.go:197), so its
        // output order — and which value a LIMIT/OFFSET page lands on —
        // is nondeterministic; upstream compares only len(exp)==len(act)
        // (showTagValueDisorderSuc, server_helpers.go:905). We keep
        // byte-exact as the primary check (stricter, and all but the
        // paginated case match) and fall back to upstream's comparator.
        val familyOk = f.func == "TestServer_Query_ShowTagValues_Disorder" &&
          act.length == exp.length
        if (act == exp || numTolerantEq(act, exp) || familyOk) {
          // the exclusion list shrinks MONOTONICALLY: a pinned case
          // that starts passing must be un-pinned, so known divergences
          // stay distinguishable from later regressions
          if (exclusions.contains(key))
            mismatches ::= s"[$key] ${q.name}: STALE EXCLUSION — the " +
              "case now passes; remove it from " +
              "server_corpus_exclusions.json"
        } else {
          if (exclusions.contains(key)) ()
          else if (reportPath.isDefined) {
            report.add(JsonMethods.compact(JsonMethods.render(JObject(
              "key" -> JString(key), "name" -> JString(q.name),
              "line" -> JInt(f.line),
              "command" -> JString(q.command),
              "params" -> JObject(q.params.map {
                case (k, v) => k -> (JString(v): JValue) }.toList),
              "exp" -> JString(q.exp), "act" -> JString(act)))))
          } else {
            mismatches ::= s"[$key] ${q.name}\n  cmd: ${q.command}\n" +
              s"  exp: ${q.exp.take(300)}\n  act: ${act.take(300)}"
          }
        }
      }
      assert(mismatches.isEmpty,
        s"${f.func}: ${mismatches.size} divergence(s):\n" +
          mismatches.reverse.mkString("\n"))
    } finally g.stop()
  }

  corpus.filter(f => onlyFunc.forall(_.contains(f.func))).foreach { f =>
    test(s"server_test.go:${f.line} ${f.func} (${f.queries.size} queries)") {
      runFunc(f)
    }
  }

  test("corpus replay report flush") {
    reportPath.foreach { p =>
      val items = report.toArray.map(_.toString)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        items.mkString("[\n", ",\n", "\n]"))
      System.err.println(s"[corpus] ${items.length} mismatches -> $p")
    }
  }
}
