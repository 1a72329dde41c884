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
