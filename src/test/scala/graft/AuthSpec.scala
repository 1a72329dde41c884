package graft

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import org.apache.spark.sql.functions._
import graft.query.{InfluxQL, PromQL}
import graft.server.{Auth, HttpGateway}

/** Gateway authentication/authorization e2e — the reference's
  * `httpd/handler.go:1913` authenticate middleware + `meta/authorizer
  * .go` query authorization over a real loopback socket: bootstrap
  * window, 401 contracts, per-db privilege checks, and the
  * user-management statement surface backed by real state.
  * Tests run in declaration order and build up catalog state. */
class AuthSpec extends SparkSpec {

  private def events = Tables.table(spark, sf, "events")

  private lazy val gateway: HttpGateway = {
    val cat = Map("events" -> InfluxQL.Measurement(
      events, tags = Seq("event_type")))
    val prom = Map("events" -> PromQL.Metric(
      events.withColumn("user", col("user_id").cast("string")),
      labels = Seq("event_type", "user"), time = "ts", value = "value"))
    val g = new HttpGateway(spark, cat, prom, requireAuth = true)
    g.start()
    g
  }

  private lazy val http = HttpClient.newHttpClient()
  private def url(path: String) =
    URI.create(s"http://127.0.0.1:${gateway.boundPort}$path")
  private def enc(s: String) = URLEncoder.encode(s, UTF_8)

  private def get(path: String,
                  headers: Seq[(String, String)] = Nil): HttpResponse[String] = {
    var b = HttpRequest.newBuilder(url(path)).GET()
    headers.foreach { case (k, v) => b = b.header(k, v) }
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def post(path: String, body: String,
                   headers: Seq[(String, String)] = Nil): HttpResponse[String] = {
    var b = HttpRequest.newBuilder(url(path))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b = b.header(k, v) }
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def basic(u: String, p: String): (String, String) =
    "Authorization" -> ("Basic " + Base64.getEncoder
      .encodeToString(s"$u:$p".getBytes(UTF_8)))

  private def query(q: String, extra: String = "",
                    headers: Seq[(String, String)] = Nil) =
    get(s"/query?q=${enc(q)}&epoch=ms$extra", headers)

  test("bootstrap window: no admin yet, requests run unauthenticated") {
    // handler.go:1923 — auth only engages once an admin user exists,
    // so the first CREATE USER … WITH ALL PRIVILEGES can happen
    val r = query("SELECT count(value) FROM events")
    assert(r.statusCode() == 200 && r.body().contains("\"count\""))
    val mk = query("CREATE USER admin WITH PASSWORD 'secret' WITH ALL PRIVILEGES")
    assert(mk.statusCode() == 200)
    assert(gateway.auth.adminExists)
  }

  test("missing credentials 401; wrong password 401; the messages match") {
    val missing = query("SELECT count(value) FROM events")
    assert(missing.statusCode() == 401)
    assert(missing.body().contains("unable to parse authentication credentials"))
    assert(missing.headers().firstValue("WWW-Authenticate").isPresent)
    val wrong = query("SELECT count(value) FROM events",
      headers = Seq(basic("admin", "nope")))
    assert(wrong.statusCode() == 401)
    assert(wrong.body().contains("authorization failed"))
    // /write and prom routes are guarded too
    assert(post("/write", "m value=1 0").statusCode() == 401)
    assert(get("/api/v1/query_range?query=sum(events)" +
      "&start=1704067200&end=1704070800&step=1h").statusCode() == 401)
    assert(get("/api/v1/labels").statusCode() == 401)
  }

  test("admin authenticates via u/p params, Basic, and Token forms") {
    val viaParams = query("SELECT count(value) FROM events",
      extra = "&u=admin&p=secret")
    assert(viaParams.statusCode() == 200 && viaParams.body().contains("\"count\""))
    val viaBasic = query("SELECT count(value) FROM events",
      headers = Seq(basic("admin", "secret")))
    assert(viaBasic.body() == viaParams.body())
    val viaToken = query("SELECT count(value) FROM events",
      headers = Seq("Authorization" -> "Token admin:secret"))
    assert(viaToken.body() == viaParams.body())
  }

  test("GRANT READ lets a user query exactly the granted database") {
    assert(query("CREATE USER bob WITH PASSWORD 'pw'",
      extra = "&u=admin&p=secret").statusCode() == 200)
    assert(query("GRANT READ ON graft TO bob",
      extra = "&u=admin&p=secret").statusCode() == 200)
    // bob reads db=graft
    val ok = query("SELECT count(value) FROM events",
      extra = "&db=graft", headers = Seq(basic("bob", "pw")))
    assert(ok.statusCode() == 200 && ok.body().contains("\"count\""))
    // …but not another db, nor without a db, nor writes
    val otherDb = query("SELECT count(value) FROM events",
      extra = "&db=other", headers = Seq(basic("bob", "pw")))
    assert(otherDb.statusCode() == 403 &&
      otherDb.body().contains("not authorized to read"))
    assert(query("SELECT count(value) FROM events",
      headers = Seq(basic("bob", "pw"))).statusCode() == 403)
    val wr = post("/write?db=graft", "m value=1 0",
      headers = Seq(basic("bob", "pw")))
    assert(wr.statusCode() == 403 && wr.body().contains("not authorized to write"))
    // INTO needs WRITE even with READ granted
    assert(query("SELECT count(value) INTO t FROM events",
      extra = "&db=graft", headers = Seq(basic("bob", "pw")))
      .statusCode() == 403)
    // management + user-management are admin-only
    assert(query("DROP MEASUREMENT events", extra = "&db=graft",
      headers = Seq(basic("bob", "pw"))).statusCode() == 403)
    assert(query("CREATE USER eve WITH PASSWORD 'x'",
      headers = Seq(basic("bob", "pw"))).statusCode() == 403)
  }

  test("privileges compose as bits: READ+WRITE=ALL; REVOKE bit-clears") {
    assert(query("GRANT WRITE ON graft TO bob",
      extra = "&u=admin&p=secret").statusCode() == 200)
    // GRANT assigns (data.go:2913 SetPrivilege), so WRITE replaced READ
    val grants = query("SHOW GRANTS FOR bob", extra = "&u=admin&p=secret")
    assert(grants.body().contains("WRITE"), grants.body())
    // bob can now write db=graft but no longer read it
    assert(post("/write?db=graft", "scratch value=1 0",
      headers = Seq(basic("bob", "pw"))).statusCode() == 204)
    assert(query("SELECT count(value) FROM events", extra = "&db=graft",
      headers = Seq(basic("bob", "pw"))).statusCode() == 403)
    // ALL then REVOKE WRITE leaves READ (bit-clear, not erase)
    assert(query("GRANT ALL ON graft TO bob",
      extra = "&u=admin&p=secret").statusCode() == 200)
    assert(query("REVOKE WRITE ON graft FROM bob",
      extra = "&u=admin&p=secret").statusCode() == 200)
    val after = query("SHOW GRANTS FOR bob", extra = "&u=admin&p=secret")
    assert(after.body().contains("READ") && !after.body().contains("WRITE"),
      after.body())
    assert(query("SELECT count(value) FROM events", extra = "&db=graft",
      headers = Seq(basic("bob", "pw"))).statusCode() == 200)
  }

  test("SHOW USERS round-trips; reference error contracts enforced") {
    val users = query("SHOW USERS", extra = "&u=admin&p=secret")
    assert(users.statusCode() == 200)
    assert(users.body().contains("\"columns\":[\"user\",\"admin\",\"rwuser\"]"))
    assert(users.body().contains("[\"admin\",true,false]") &&
      users.body().contains("[\"bob\",false,false]"), users.body())
    // only one admin, ever (data.go:2846; 2933)
    val second = query("CREATE USER root WITH PASSWORD 'x' WITH ALL PRIVILEGES",
      extra = "&u=admin&p=secret")
    assert(second.statusCode() == 400 &&
      second.body().contains("forbidden to create new admin"))
    val grantAdmin = query("GRANT ALL PRIVILEGES TO bob",
      extra = "&u=admin&p=secret")
    assert(grantAdmin.statusCode() == 400 &&
      grantAdmin.body().contains("only one admin"))
    // admin is undroppable; duplicates and unknowns error
    assert(query("DROP USER admin", extra = "&u=admin&p=secret")
      .body().contains("forbidden to delete admin user"))
    assert(query("CREATE USER bob WITH PASSWORD 'pw'",
      extra = "&u=admin&p=secret").body().contains("user already exists"))
    assert(query("GRANT READ ON graft TO ghost",
      extra = "&u=admin&p=secret").body().contains("user not found"))
  }

  test("SET PASSWORD: self-service allowed, same password rejected") {
    // bob may change his own password but not admin's
    assert(query("SET PASSWORD FOR admin = 'hack'",
      headers = Seq(basic("bob", "pw"))).statusCode() == 403)
    val same = query("SET PASSWORD FOR bob = 'pw'",
      headers = Seq(basic("bob", "pw")))
    assert(same.statusCode() == 400 &&
      same.body().contains("same as the old one"))
    assert(query("SET PASSWORD FOR bob = 'pw2'",
      headers = Seq(basic("bob", "pw"))).statusCode() == 200)
    assert(query("SELECT count(value) FROM events", extra = "&db=graft",
      headers = Seq(basic("bob", "pw"))).statusCode() == 401)
    assert(query("SELECT count(value) FROM events", extra = "&db=graft",
      headers = Seq(basic("bob", "pw2"))).statusCode() == 200)
  }

  test("prom routes enforce db-scoped read; DROP USER cleans up") {
    // bob has READ on graft only; prom requests carry no db → ""
    assert(get("/api/v1/query_range?query=sum(events)" +
      "&start=1704067200&end=1704070800&step=1h",
      headers = Seq(basic("bob", "pw2"))).statusCode() == 403)
    assert(get("/api/v1/query_range?query=sum(events)" +
      "&start=1704067200&end=1704070800&step=1h&db=graft",
      headers = Seq(basic("bob", "pw2"))).statusCode() == 200)
    assert(get("/api/v1/labels?u=admin&p=secret").statusCode() == 200)
    assert(query("DROP USER bob", extra = "&u=admin&p=secret")
      .statusCode() == 200)
    assert(query("SELECT 1", headers = Seq(basic("bob", "pw2")))
      .statusCode() == 401)
  }

  test("user catalog persists: restart does NOT reopen the bootstrap window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_auth").toString
    val cat = Map("events" -> InfluxQL.Measurement(
      events, tags = Seq("event_type")))
    def mk() = {
      val g = new HttpGateway(spark, cat, Map.empty, requireAuth = true,
        persistDir = Some(dir))
      g.start(); g
    }
    def ask(g: HttpGateway, q: String, hs: Seq[(String, String)] = Nil) = {
      var b = HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${g.boundPort}/query?q=${enc(q)}&epoch=ms")).GET()
      hs.foreach { case (k, v) => b = b.header(k, v) }
      http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    }
    val g1 = mk()
    try {
      assert(ask(g1,
        "CREATE USER root WITH PASSWORD 'pw1' WITH ALL PRIVILEGES")
        .statusCode() == 200)
      assert(ask(g1, "CREATE USER carol WITH PASSWORD 'cpw'",
        Seq(basic("root", "pw1"))).statusCode() == 200)
      assert(ask(g1, "GRANT READ ON graft TO carol",
        Seq(basic("root", "pw1"))).statusCode() == 200)
    } finally g1.stop()
    val g2 = mk()
    try {
      // no bootstrap window: unauthenticated is refused immediately
      assert(ask(g2, "SELECT count(value) FROM events").statusCode() == 401)
      // users, passwords, and grants all survived the restart
      assert(ask(g2, "SELECT count(value) FROM events",
        Seq(basic("root", "pw1"))).statusCode() == 200)
      val carol = http.send(HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${g2.boundPort}/query?q=${enc(
          "SELECT count(value) FROM events")}&db=graft&epoch=ms"))
        .header(basic("carol", "cpw")._1, basic("carol", "cpw")._2)
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(carol.statusCode() == 200, carol.body())
      val grants = http.send(HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${g2.boundPort}/query?q=${enc(
          "SHOW GRANTS FOR carol")}&u=root&p=pw1&epoch=ms"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(grants.body().contains("READ"), grants.body())
    } finally g2.stop()
  }

  test("Auth unit: KDF salts differ per user; authorizeDatabase matrix") {
    val a = new Auth
    a.execute("CREATE USER u1 WITH PASSWORD 'pw'")
    a.execute("CREATE USER u2 WITH PASSWORD 'pw'")
    val (h1, h2) = (a.user("u1").get, a.user("u2").get)
    assert(h1.hash != h2.hash, "same password must hash differently (salt)")
    assert(a.authenticate("u1", "pw").isDefined)
    assert(a.authenticate("u1", "PW").isEmpty)
    a.execute("GRANT WRITE ON db1 TO u1")
    val u = a.user("u1").get
    // userinfo.go:54 — a WRITE grant does not imply READ
    assert(u.authorizeDatabase(Auth.WritePrivilege, "db1"))
    assert(!u.authorizeDatabase(Auth.ReadPrivilege, "db1"))
    assert(u.authorizeDatabase(Auth.NoPrivileges, "anywhere"))
    assert(Auth.privilegeName(Auth.AllPrivileges) == "ALL PRIVILEGES")
  }

  test("GRANT validates the database; qualified refs respect privileges") {
    assert(query("CREATE USER dave WITH PASSWORD 'dpw'",
      extra = "&u=admin&p=secret").statusCode() == 200)
    // unknown database → data.go:2919's error, verbatim
    val bad = query("GRANT READ ON nosuchdb TO dave",
      extra = "&u=admin&p=secret")
    assert(bad.statusCode() == 400 &&
      bad.body().contains("database not found: nosuchdb"), bad.body())
    // once the database exists the same grant succeeds
    assert(query("CREATE DATABASE dbauth", extra = "&u=admin&p=secret")
      .statusCode() == 200)
    assert(query("GRANT READ ON dbauth TO dave",
      extra = "&u=admin&p=secret").statusCode() == 200)
    // a dbauth-only reader cannot route a qualified ref into graft —
    // the view refuses to resolve databases the principal can't read.
    // Execution errors are STATEMENT-level (200 + results error, the
    // reference handler contract); the refusal reads identically to a
    // nonexistent measurement, so denied probing can't distinguish them
    val denied = query("SELECT count(value) FROM graft.autogen.events",
      extra = "&db=dbauth", headers = Seq(basic("dave", "dpw")))
    assert(denied.statusCode() == 200 &&
      denied.body().contains("measurement not found"), denied.body())
    // an admin resolves the same ref fine
    val ok = query("SELECT count(value) FROM graft.autogen.events",
      extra = "&db=dbauth", headers = Seq(basic("admin", "secret")))
    assert(ok.statusCode() == 200 &&
      ok.body().contains("\"name\":\"events\""), ok.body())
  }

  test("service routes are guarded: backup/debug admin, fence/tsdb " +
      "write, store labels read") {
    // unauthenticated → 401 on every service route (handler.go wraps
    // backup/debug/fence in checkAuth; pre-fix these were open)
    assert(get("/debug/vars").statusCode() == 401)
    assert(get("/debug/query?mod=shards").statusCode() == 401)
    assert(post("/debug/ctrl?mod=snapshot&switchon=true", "")
      .statusCode() == 401)
    assert(post("/failpoint?point=x&flag=enable", "").statusCode() == 401)
    assert(post("/backup/run?backupPath=/tmp/x", "").statusCode() == 401)
    assert(post("/backup/status", "").statusCode() == 401)
    assert(get("/fence/match_batch?points=[1.0,2.0]").statusCode() == 401)
    assert(post("/fence/delete_fence?fenceId=f1", "").statusCode() == 401)
    assert(post("/api/v1/tsdb/s1", "").statusCode() == 401)
    assert(get("/prometheus/s1/api/v1/labels").statusCode() == 401)
    // dave is a non-admin with READ on dbauth only
    val dave = Seq(basic("dave", "dpw"))
    assert(get("/debug/vars", dave).statusCode() == 403)
    assert(post("/backup/run?backupPath=/tmp/x", "", dave)
      .statusCode() == 403)
    assert(post("/fence/delete_fence?fenceId=f1", "", dave)
      .statusCode() == 403)
    assert(post("/api/v1/tsdb/s1", "", dave).statusCode() == 403)
    // … but his READ grant admits him to dbauth's store label route
    assert(get("/prometheus/dbauth/api/v1/labels", dave)
      .statusCode() == 200)
    assert(get("/prometheus/dbauth/api/v1/label/host/values", dave)
      .statusCode() == 200)
    // admin passes everywhere (backup 400s on no persistDir, not 401/403)
    val adm = Seq(basic("admin", "secret"))
    assert(get("/debug/vars", adm).statusCode() == 200)
    assert(get("/debug/query?mod=shards", adm).statusCode() == 200)
    assert(post("/backup/run?backupPath=/tmp/x", "", adm)
      .statusCode() == 400)
    assert(post("/backup/status", "", adm).statusCode() == 200)
    assert(get("/fence/match_batch?points=[1.0,2.0]", adm)
      .statusCode() == 200)
    assert(post("/api/v1/tsdb/authstore", "", adm).statusCode() == 200)
    assert(get("/prometheus/authstore/api/v1/labels", adm)
      .statusCode() == 200)
  }

  test("Auth unit: SET PASSWORD re-salts (old snapshot can't precompute)") {
    val a = new Auth
    a.execute("CREATE USER u1 WITH PASSWORD 'pw'")
    val before = a.user("u1").get
    a.execute("SET PASSWORD FOR u1 = 'pw2'")
    val after = a.user("u1").get
    assert(after.salt != before.salt,
      "password change must generate a fresh salt")
    assert(a.authenticate("u1", "pw2").isDefined)
    assert(a.authenticate("u1", "pw").isEmpty)
  }
}
