package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.sources.LineProtocol

/** Property-based invariants (SURVEY §5: "we add ScalaCheck"). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("line protocol: format→parse roundtrips arbitrary points") {
    check(Prop.forAll(ident, Gen.mapOf(Gen.zip(ident, ident)),
      Gen.nonEmptyMap(Gen.zip(ident, Gen.choose(-1e6, 1e6))),
      Gen.choose(0L, 2000000000000000000L)) {
      (mst, tags, fields, ts) =>
        val tagStr = tags.map { case (k, v) => s",$k=$v" }.mkString
        val fieldStr = fields.map { case (k, v) => s"$k=$v" }.mkString(",")
        val p = LineProtocol.parseLine(s"$mst$tagStr $fieldStr $ts")
        p.isDefined &&
          p.get.measurement == mst && p.get.tags == tags &&
          p.get.time == ts && p.get.floatFields == fields
    })
  }

  test("line protocol: escaped identifiers roundtrip") {
    val special = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const(','),
        Gen.const('='))).map(_.mkString)
    check(Prop.forAll(special, special) { (tagKey, tagVal) =>
      def esc(s: String) = s.replace(",", "\\,").replace(" ", "\\ ")
        .replace("=", "\\=")
      val p = LineProtocol.parseLine(s"m,${esc(tagKey)}=${esc(tagVal)} v=1 0")
      p.isDefined && p.get.tags == Map(tagKey -> tagVal)
    })
  }

  test("CmsTopN: estimates dominate true counts under any partitioning") {
    import graft.functions.Sketches.CmsTopN
    val keys = Gen.nonEmptyListOf(Gen.choose(1, 30).map(i => s"k$i"))
    val cuts = Gen.choose(1, 5)
    check(Prop.forAll(keys, cuts) { (ks, nParts) =>
      val agg = new CmsTopN(depth = 4, width = 128, maxCand = 64, n = 5)
      // reduce each partition separately, then merge — any split must
      // yield one-sided estimates and surface the true heaviest key
      val parts = ks.grouped(math.max(1, ks.size / nParts)).toSeq
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.reduce(agg.merge)
      val hits = agg.finish(merged)
      val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      hits.forall(h => h.est >= exact(h.key)) &&
        hits.head.est >= exact.values.max
    })
  }

  test("PromQL parser: precedence and selector shapes") {
    import graft.query.PromQL
    import graft.query.PromQL._
    check(Prop.forAll(ident, ident) { (m, l) =>
      val metric = "m" + m
      (PromQL.parse(s"$metric + $metric * $metric") match {
        case Bin("+", Sel(_, _, _, _, _), Bin("*", _, _, _, _, _, _, _),
          _, _, _, _, _) => true
        case _ => false
      }) &&
      (PromQL.parse(s"""rate($metric{x$l="v"}[5m])""") match {
        case FnCall("rate", Seq(Sel(n, Seq((lab, "=", "v")), Some(300), 0, None)))
          => n == metric && lab == "x" + l
        case _ => false
      }) &&
      (PromQL.parse(s"sum by (a) ($metric)[1h:10m]") match {
        case SubQ(Agg("sum", Some(Seq("a")), None, None, _), 3600,
          Some(600)) => true
        case _ => false
      })
    })
  }

  test("InfluxQL lexer: compound durations sum their units") {
    import graft.query.InfluxQL
    val unit = Gen.oneOf(("s", 1000000000L), ("m", 60000000000L),
      ("h", 3600000000000L), ("d", 86400000000000L))
    check(Prop.forAll(Gen.choose(1, 500), unit) { case (n, (u, ns)) =>
      InfluxQL.lex(s"$n$u") == List(InfluxQL.TDur(n * ns))
    })
  }

  test("TopKRows: partials + serialize + merge equal a global sort " +
      "under any partitioning") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, CreateNamedStruct, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{DoubleType, LongType}
    import graft.expressions.TopKRows
    val child = CreateNamedStruct(Seq(
      Literal("v"), BoundReference(0, DoubleType, nullable = false),
      Literal("t"), BoundReference(1, LongType, nullable = false)))
    val rowsG = Gen.nonEmptyListOf(
      // + 0.0 folds -0.0 into 0.0: UnsafeRow normalizes negative zero
      // on write (SQL equality semantics), so the ground truth must too
      Gen.zip(Gen.choose(-5.0, 5.0).map(x => math.rint(x * 4) / 4 + 0.0),
        Gen.choose(0L, 30L)))
    check(Prop.forAll(rowsG, Gen.choose(1, 6), Gen.choose(1, 8),
        Gen.oneOf(true, false)) { (rows, nParts, k, desc) =>
      val agg = TopKRows(child, k, 2, Seq(desc, false))
      // split into chunks, run a partial per chunk, round-trip each
      // through serialize/deserialize (the exchange), then merge
      val chunks = rows.grouped(math.max(1, rows.size / nParts)).toSeq
      val partials = chunks.map { ch =>
        var b = agg.createAggregationBuffer()
        ch.foreach { case (v, t) => b = agg.update(b, InternalRow(v, t)) }
        agg.deserialize(agg.serialize(b))
      }
      val merged = partials.reduceLeft(agg.merge)
      val got = agg.eval(merged).asInstanceOf[ArrayData].toObjectArray(
          child.dataType).toSeq
        .map(r => { val ir = r.asInstanceOf[InternalRow]
          (ir.getDouble(0), ir.getLong(1)) })
      val ord = Ordering.Tuple2(
        if (desc) Ordering[Double].reverse else Ordering[Double],
        Ordering[Long])
      got == rows.sorted(ord).take(k)
    })
  }

  test("IPv4 helpers: mask/min/max invariants") {
    import graft.functions.GeminiFunctions._
    val octet = Gen.choose(0, 255)
    check(Prop.forAll(octet, octet, octet, octet, Gen.choose(1, 32)) {
      (a, b, c, d, p) =>
        val ip = s"$a.$b.$c.$d"
        val masked = ipMask(ip, p)
        val cidr = s"$masked/$p"
        masked != null &&
          ipMask(masked, p) == masked &&             // idempotent
          isSubnetOf(cidr, ip) == java.lang.Boolean.TRUE &&
          ipSubnetMin(cidr) == masked &&
          isSubnetOf(cidr, ipSubnetMax(cidr)) == java.lang.Boolean.TRUE
    })
  }
}
