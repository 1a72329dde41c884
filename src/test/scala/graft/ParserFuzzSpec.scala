package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.query.{InfluxQL, PromQL}

/** Frontend robustness: arbitrary garbage and mutated-valid inputs must
  * fail with a RuntimeException/IllegalArgumentException carrying a
  * message (the parsers' sys.error/require contract) — never an NPE,
  * StackOverflowError, MatchError, or hang. The reference's yacc parser
  * gives this for free; hand-written recursive descent has to prove it.
  * Deterministic: generators are driven from a fixed scalacheck seed. */
class ParserFuzzSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0x5eedL + i * 7919L)))

  private def failsCleanly(input: String)(body: => Any): Unit =
    try { body; () } catch {
      case e: StackOverflowError => fail(s"stack overflow on: $input")
      case e: MatchError => fail(s"MatchError on: $input — $e")
      case e: NullPointerException => fail(s"NPE on: $input")
      case e: IllegalArgumentException =>
        assert(e.getMessage != null, s"null-message IAE on: $input")
      case e: RuntimeException =>
        assert(e.getMessage != null,
          s"null-message ${e.getClass.getSimpleName} on: $input")
      case e: IndexOutOfBoundsException =>
        fail(s"index out of bounds on: $input")
    }

  private val tokens = Gen.oneOf(
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "time", "(", ")", ",", "*",
    "'str'", "\"q\"", "/re/", "1h", "now()", "fill", "cpu", "value", "=~",
    "123", "1.5", "-", "+", ";", ".", "AND", "OR", "LIMIT", "xyz")

  test("InfluxQL.parse never NPEs or hangs on token soup") {
    samples(Gen.listOf(tokens).map(_.mkString(" ")), 300).foreach { q =>
      failsCleanly(q)(InfluxQL.parse("SELECT " + q))
    }
  }

  test("InfluxQL.parse on mutated valid queries fails with messages") {
    val valid = "SELECT mean(value) FROM cpu WHERE time > now() - 1h " +
      "GROUP BY time(5m), host fill(previous) ORDER BY time DESC LIMIT 3"
    val words = valid.split(' ')
    val mutation = for {
      i <- Gen.choose(0, words.length - 1)
      j <- Gen.choose(0, words.length - 1)
    } yield {
      val w = words.toBuffer
      val t = w(i); w(i) = w(j); w(j) = t // swap two words
      w.mkString(" ")
    }
    samples(mutation, 200).foreach { q =>
      failsCleanly(q)(InfluxQL.parse(q))
    }
  }

  test("PromQL.parse never NPEs or hangs on token soup") {
    val promTokens = Gen.oneOf("rate", "(", ")", "[5m]", "{", "}", "by",
      "sum", "metric", "=", "\"v\"", ",", "offset", "@", "1h", "-", "/",
      "^", "bool", "on", "group_left", "123", "installed")
    samples(Gen.listOf(promTokens).map(_.mkString(" ")), 300).foreach { q =>
      failsCleanly(q)(PromQL.parse(q))
    }
  }

  test("round-9 grammar (compare/topn/diff modes) survives token soup") {
    val tokens = Gen.oneOf(
      "SELECT", "FROM", "compare", "topn_ddcm", "topn_nagt2",
      "difference", "ad_rmse_ext", "'front'", "'absolute'", "'sideways'",
      "(", ")", ",", "value", "cpu", "3600", "0", "5", "GROUP", "BY",
      "time", "1h", "host", "histogram")
    samples(Gen.listOf(tokens).map(_.mkString(" ")), 300).foreach { q =>
      failsCleanly(q)(InfluxQL.parse("SELECT " + q))
    }
  }

  test("round-10 JOIN grammar (subqueries/aliases/qualified ON) survives " +
      "token soup") {
    val tokens = Gen.oneOf(
      "SELECT", "FROM", "(", ")", "AS", "JOIN", "INNER", "LEFT", "RIGHT",
      "FULL", "OUTER", "ON", "AND", "=", ".", ",", "t1", "t2", "cpu",
      "mem", "host", "value", "sum", "GROUP", "BY", "LogPipe")
    samples(Gen.listOf(tokens).map(_.mkString(" ")), 300).foreach { q =>
      failsCleanly(q)(InfluxQL.parse("SELECT value FROM " + q))
    }
    // the valid shapes still parse amid the fuzz run
    InfluxQL.parse("SELECT t1.f FROM (SELECT sum(v) AS f FROM a " +
      "GROUP BY h) AS t1 LEFT JOIN (SELECT sum(w) AS g FROM b " +
      "GROUP BY h) AS t2 ON (t1.h = t2.h) GROUP BY h")
    InfluxQL.parse("SELECT f FROM a AS x OUTER JOIN b AS y ON h")
  }

  test("management DDL parsers fail cleanly on token soup") {
    import graft.server.{DownSample, MeasurementDDL}
    import graft.streaming.StreamDDL
    val tokens = Gen.oneOf(
      "CREATE", "DOWNSAMPLE", "MEASUREMENT", "STREAM", "SUBSCRIPTION",
      "ON", "WITH", "DURATION", "SAMPLEINTERVAL", "TIMEINTERVAL",
      "ENGINETYPE", "SHARDKEY", "TYPE", "PRIMARYKEY", "INDEXTYPE",
      "INDEXLIST", "DESTINATIONS", "ALL", "ANY", "INTO", "DELAY",
      "float", "int64", "tag", "mean", "max", "(", ")", ",", ".", "=",
      "'s'", "'http://h:1'", "db", "rp", "m", "1h", "7d", "25h", "1m")
    samples(Gen.listOf(tokens).map(_.mkString(" ")), 250).foreach { q =>
      failsCleanly(q)(DownSample.parseCreate("CREATE DOWNSAMPLE " + q))
      failsCleanly(q)(MeasurementDDL.parseCreate("CREATE MEASUREMENT " + q))
      failsCleanly(q)(StreamDDL.parse("CREATE STREAM " + q))
      failsCleanly(q)(StreamDDL.parseSubscription("CREATE SUBSCRIPTION " + q))
    }
  }
}
