package graft

import graft.query.InfluxQL
import graft.query.InfluxQL.Measurement
import graft.sources.LineProtocol

/** Scratch triage spec — not committed; corpus-case reproductions. */
class ScratchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cpu: Measurement = {
    val lines = Seq(
      "cpu,host=server01 value=10,core=1i 0",
      "cpu,host=server01 value=20,core=2i 60000000000",
      "cpu,host=server01 value=30,core=3i 120000000000",
      "cpu,host=server02 value=100 0",
      "cpu,host=server02 value=200 120000000000").toDS()
    val df = LineProtocol.toMeasurementTable(LineProtocol.parse(lines), "cpu",
      tagKeys = Seq("host"), floatKeys = Seq("value"), intKeys = Seq("core"))
    Measurement(df, tags = Seq("host"))
  }
  private lazy val catalog = Map("cpu" -> cpu)

  private def run(q: String) = InfluxQL.execute(catalog, q)

  test("math over aggregate: sum(value)*2") {
    val out = run("SELECT sum(value)*2 FROM cpu")
    out.show(false)
    println(out.columns.mkString(","))
  }

  test("math over selector: max(value) * 1") {
    val out = run("SELECT max(value) * 1 FROM cpu")
    out.show(false)
    println(out.columns.mkString(","))
  }
}
