package graft

import graft.server.{HttpGateway, Validation}
import graft.sources.PromRemoteWrite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** Prom write-limits validation + runtimecfg hot reload (reference:
  * `lib/validation/validate.go`, `lib/validation/overrides.go`,
  * `services/runtimecfg/service.go`, enforced per
  * `handler_prom.go:99` FilterInvalidTimeSeries with the mst as the
  * tenant key). */
class ValidationSpec extends SparkSpec {

  private val http = HttpClient.newHttpClient()
  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

  test("validateSeries: reference limit checks, off until enabled") {
    import Validation._
    val now = 1700000000000L
    val on = Limits(promLimitEnabled = true)
    // gate off → everything passes
    assert(validateSeries(defaults,
      Map("bad label!" -> "x"), Seq(now), now).isEmpty)
    // no metric name / invalid metric name (enforce_metric_name)
    assert(validateSeries(on, Map("job" -> "j"), Seq(now), now)
      .exists(_.contains("missing metric name")))
    assert(validateSeries(on, Map("__name__" -> "1bad"), Seq(now), now)
      .exists(_.contains("invalid metric name")))
    // too many labels
    val many = Map("__name__" -> "m") ++
      (1 to 31).map(i => s"l$i" -> "v").toMap
    assert(validateSeries(on.copy(maxLabelNamesPerSeries = 30), many,
      Seq(now), now).exists(_.contains("too many labels")))
    // label name charset + lengths
    assert(validateSeries(on, Map("__name__" -> "m", "bad-l" -> "v"),
      Seq(now), now).exists(_.contains("invalid label")))
    assert(validateSeries(on.copy(maxLabelValueLength = 3),
      Map("__name__" -> "m", "l" -> "toolong"), Seq(now), now)
      .exists(_.contains("value too long")))
    // sample age bounds (pinned now)
    val old = on.copy(rejectOldSamples = true,
      rejectOldSamplesMaxAgeS = 3600)
    assert(validateSeries(old, Map("__name__" -> "m"),
      Seq(now - 2 * 3600 * 1000L), now).exists(_.contains("too old")))
    assert(validateSeries(on, Map("__name__" -> "m"),
      Seq(now + 3600 * 1000L), now).exists(_.contains("too new")))
    assert(validateSeries(on, Map("__name__" -> "m"), Nil, now)
      .exists(_.contains("no sample")))
    // a valid series passes every enabled check
    assert(validateSeries(old, Map("__name__" -> "m", "job" -> "j"),
      Seq(now - 1000), now).isEmpty)
    // query length
    assert(Validation.validateQueryTimeRange(
      on.copy(maxQueryLengthS = 3600), 0, 3601 * 1000L).isDefined)
    assert(Validation.validateQueryTimeRange(
      on.copy(maxQueryLengthS = 3600), 0, 3600 * 1000L).isEmpty)
  }

  test("parseOverrides: the Cortex overrides shape, durations, " +
      "unknown keys ignored") {
    val cfg = Validation.parseOverrides(
      """# runtime overrides
        |overrides:
        |  vstore:
        |    prom_limit_enabled: true
        |    max_label_names_per_series: 3
        |    reject_old_samples: true
        |    reject_old_samples_max_age: 14d
        |    max_query_length: 1h
        |    some_future_knob: whatever
        |  other:
        |    prom_limit_enabled: false
        |""".stripMargin)
    assert(cfg.keySet == Set("vstore", "other"))
    val v = cfg("vstore")
    assert(v.promLimitEnabled && v.maxLabelNamesPerSeries == 3 &&
      v.rejectOldSamples && v.rejectOldSamplesMaxAgeS == 14L * 86400 &&
      v.maxQueryLengthS == 3600)
    assert(!cfg("other").promLimitEnabled)
    // indentation-agnostic: 4-space and tab-indented documents parse too
    val four = Validation.parseOverrides(
      "overrides:\n    t4:\n        prom_limit_enabled: true\n")
    assert(four("t4").promLimitEnabled, four.toString)
    val tabs = Validation.parseOverrides(
      "overrides:\n\ttt:\n\t\tmax_label_names_per_series: 7\n")
    assert(tabs("tt").maxLabelNamesPerSeries == 7, tabs.toString)
  }

  test("gateway e2e: store write filters invalid series (partial 400, " +
      "valid data lands), query_range enforces max_query_length, " +
      "and the runtimecfg file hot-reloads") {
    val dir = Files.createTempDirectory("graft_rtcfg")
    Files.write(dir.resolve("_runtimecfg.yaml"),
      """overrides:
        |  vstore:
        |    prom_limit_enabled: true
        |    max_label_names_per_series: 3
        |    max_query_length: 1h
        |""".stripMargin.getBytes("UTF-8"))
    val g = new HttpGateway(spark, Map.empty, Map.empty,
      persistDir = Some(dir.toString))
    g.start()
    try {
      def storeWrite(series: Seq[PromRemoteWrite.Series]) = http.send(
        HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:${g.boundPort}/prometheus/vstore/api/v1/write"))
          .POST(HttpRequest.BodyPublishers.ofByteArray(
            PromRemoteWrite.encode(series))).build(),
        HttpResponse.BodyHandlers.ofString())
      val good = PromRemoteWrite.Series(
        Map("__name__" -> "cpu", "job" -> "j1"),
        Seq((1704067200000L, 5.0)))
      val tooManyLabels = PromRemoteWrite.Series(
        Map("__name__" -> "cpu", "a" -> "1", "b" -> "2", "c" -> "3"),
        Seq((1704067200000L, 9.0)))
      // partial write: 400 carrying the first validation error, but the
      // valid series landed (servePromWriteBase:203 semantics)
      val r1 = storeWrite(Seq(good, tooManyLabels))
      assert(r1.statusCode() == 400 &&
        r1.body().contains("too many labels"), s"${r1.statusCode()} ${r1.body()}")
      def q(query: String, startS: Long, endS: Long) = http.send(
        HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:${g.boundPort}/prometheus/vstore/api/v1/" +
            s"query_range?query=${enc(query)}&start=$startS&end=$endS" +
            "&step=1m")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val got = q("cpu", 1704067200L, 1704067800L)
      assert(got.body().contains("\"5\""), got.body())
      assert(!got.body().contains("\"9\""), got.body()) // filtered out
      // max_query_length: a >1h range is rejected with bad_data
      val long = q("cpu", 1704067200L, 1704067200L + 3601)
      assert(long.statusCode() == 400 &&
        long.body().contains("exceeds the limit"), long.body())
      // an all-invalid batch is a plain 400, nothing written
      val r2 = storeWrite(Seq(tooManyLabels))
      assert(r2.statusCode() == 400, r2.body())
      // hot reload: raise the cap; the same write now passes clean
      val f = dir.resolve("_runtimecfg.yaml")
      Files.write(f,
        """overrides:
          |  vstore:
          |    prom_limit_enabled: true
          |    max_label_names_per_series: 10
          |""".stripMargin.getBytes("UTF-8"))
      Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() + 1234))
      val r3 = storeWrite(Seq(tooManyLabels))
      assert(r3.statusCode() == 204, s"${r3.statusCode()} ${r3.body()}")
      val got2 = q("cpu", 1704067200L, 1704067800L)
      assert(got2.body().contains("\"9\""), got2.body())
      // plain /api/v1/write stays ungated (tenant = EmptyPromMst)
      val plain = http.send(HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${g.boundPort}/api/v1/write"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(
          PromRemoteWrite.encode(Seq(tooManyLabels)))).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(plain.statusCode() == 204, plain.body())
    } finally g.stop()
  }
}
