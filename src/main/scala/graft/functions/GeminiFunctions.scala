package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The openGemini scalar ("materialize") function surface re-expressed over
  * Spark — registry list from the reference:
  * math `lib/util/lifted/influx/query/math.go:21-110`, strings
  * `query/string_functions.go`, full predicate/JSON/IP sets per SURVEY §2.8.
  *
  * Almost everything aliases a codegen'd Spark built-in; the IP helpers are
  * native single-node expressions ([[graft.expressions.IpExpressions]])
  * whose eval delegates to the pure Scala closures kept here.
  * `registry` maps the openGemini name → column builder so a query frontend
  * can resolve calls 1:1; `registerSql(spark)` exposes the IP family to SQL.
  */
object GeminiFunctions {

  /** openGemini name → Spark expression builder (args positional). */
  val registry: Map[String, Seq[Column] => Column] = Map(
    // math.go — trig/exp/log family (all java.lang.Math-backed built-ins)
    "abs" -> (a => abs(a.head)),
    "sin" -> (a => sin(a.head)), "cos" -> (a => cos(a.head)),
    "tan" -> (a => tan(a.head)), "asin" -> (a => asin(a.head)),
    "acos" -> (a => acos(a.head)), "atan" -> (a => atan(a.head)),
    "atan2" -> (a => atan2(a(0), a(1))),
    "exp" -> (a => exp(a.head)),
    "log" -> (a => call_function("log", a: _*)),
    "ln" -> (a => log(a.head)), "log2" -> (a => log2(a.head)),
    "log10" -> (a => log10(a.head)), "sqrt" -> (a => sqrt(a.head)),
    "pow" -> (a => pow(a(0), a(1))),
    "floor" -> (a => floor(a.head)), "ceil" -> (a => ceil(a.head)),
    "round" -> (a => round(a.head)),
    "truncate" -> (a => truncate(a.head)),
    "sinh" -> (a => sinh(a.head)), "cosh" -> (a => cosh(a.head)),
    "tanh" -> (a => tanh(a.head)), "asinh" -> (a => asinh(a.head)),
    "acosh" -> (a => acosh(a.head)), "atanh" -> (a => atanh(a.head)),
    "sgn" -> (a => signum(a.head)), "rad" -> (a => radians(a.head)),
    "deg" -> (a => degrees(a.head)),
    "row_max" -> (a => greatest(a: _*)),
    "if" -> (a => when(a(0), a(1)).otherwise(a(2))),
    "clamp" -> (a => least(greatest(a(0), a(1)), a(2))),
    "clamp_min" -> (a => greatest(a(0), a(1))),
    "clamp_max" -> (a => least(a(0), a(1))),
    // cast family (math.go castInt64Func etc.): string parses are
    // STRICT per target ("15.3" is not an int64 — null, not truncate);
    // try_cast gives exactly the parse-or-null the reference's
    // strconv branches produce
    "cast_int64" -> (a => a.head.try_cast("long")),
    "cast_float64" -> (a => a.head.try_cast("double")),
    // castBoolFunc: numeric != 0; string "0"/"" false, anything else
    // true ("a" IS true); null → false
    "cast_bool" -> { a =>
      val n = a.head.try_cast("double")
      when(a.head.isNull, lit(false))
        .when(n.isNotNull, n =!= 0.0)
        .otherwise(!lower(a.head.cast("string")).isin("0", ""))
    },
    "cast_string" -> (a => a.head.cast("string")),
    // string_functions.go — str(s, sub) is CONTAINS (strFunc.CallFunc:
    // strings.Contains), boolean result
    "str" -> (a => a(0).contains(a(1))),
    "strlen" -> (a => octet_length(a.head).cast("long")),
    // substr is ZERO-based with clipping (SubStrTwoParaFunc /
    // SubStrThreeParaFunc) — Spark substring is 1-based
    "substr" -> (a => if (a.length > 2)
                        call_function("substring", a(0), a(1) + lit(1), a(2))
                      else call_function("substring", a(0), a(1) + lit(1),
                        lit(Int.MaxValue))),
    "levenshtein_distance" -> (a => levenshtein(a(0), a(1))),
    "lpad" -> (a => call_function("lpad", a: _*)),
    "rpad" -> (a => call_function("rpad", a: _*)),
    "regexp_extract" -> (a => call_function("regexp_extract", a: _*)),
    "regexp_like" -> (a => call_function("regexp_like", a: _*)),
    "replace" -> (a => call_function("replace", a: _*)),
    "reverse" -> (a => reverse(a.head)),
    "split" -> (a => call_function("split", a: _*)),
    "split_part" -> (a => call_function("split_part", a: _*)),
    "split_to_map" -> (a => call_function("str_to_map", a: _*)),
    // position(s, sub) = strings.Index + 1 (1-based, 0 absent) — note
    // Spark's position() takes (substr, str), the reverse arg order
    "position" -> (a => call_function("instr", a(0), a(1))),
    // strPosFunc returns the same index AS A STRING
    "strpos" -> (a => call_function("instr", a(0), a(1)).cast("string")),
    "url_decode" -> (a => url_decode(a.head)),
    "url_encode" -> (a => url_encode(a.head)),
    "url_extract_host" -> (a => parse_url(a.head, lit("HOST"))),
    "url_extract_path" -> (a => parse_url(a.head, lit("PATH"))),
    "url_extract_protocol" -> (a => parse_url(a.head, lit("PROTOCOL"))),
    "url_extract_query" -> (a => parse_url(a.head, lit("QUERY"))),
    "url_extract_fragment" -> (a => parse_url(a.head, lit("REF"))),
    "url_extract_parameter" -> (a => parse_url(a(0), lit("QUERY"), a(1))),
    // parse_url has no PORT key — take it off AUTHORITY (null if absent)
    "url_extract_port" -> (a =>
      nullif(regexp_extract(parse_url(a.head, lit("AUTHORITY")),
        ":(\\d+)$", 1), lit("")).cast("bigint")),
    "typeof" -> (a => call_function("typeof", a.head)),
    // JSON (reference json functions → Spark get_json_object/to_json)
    "json_extract" -> (a => call_function("get_json_object", a: _*)),
    "json_extract_scalar" -> (a => call_function("get_json_object", a: _*)),
    "json_object" -> (a => to_json(struct(a: _*)))
  )

  /** truncate(x): toward-zero integer part (reference math.go truncate). */
  def truncate(c: Column): Column =
    when(c >= 0, floor(c)).otherwise(ceil(c))

  // ---- IP helpers (reference: query ip functions, SURVEY §2.8) -----------
  private def ipToLong(ip: String): Option[Long] = {
    val p = ip.trim.split("\\.")
    if (p.length != 4) None
    else try {
      val o = p.map(_.toLong)
      if (o.exists(x => x < 0 || x > 255)) None
      else Some((o(0) << 24) | (o(1) << 16) | (o(2) << 8) | o(3))
    } catch { case _: NumberFormatException => None }
  }
  private def longToIp(v: Long): String =
    s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}"
  private def maskOf(prefix: Int): Long =
    if (prefix <= 0) 0L else (0xFFFFFFFFL << (32 - prefix)) & 0xFFFFFFFFL

  /** ip_mask(ip, prefixLen): zero the host bits. */
  val ipMask: (String, Int) => String = (ip, prefix) =>
    ipToLong(ip).map(v => longToIp(v & maskOf(prefix))).orNull

  /** ip_mask with the reference's full contract (string_functions.go
    * ipMask): IPv4 uses `n4`, IPv6 uses `n6` when ≥ 0 else `n4`;
    * invalid address or out-of-range prefix → null (the reference logs
    * and yields nil). IPv6 renders RFC 5952 compressed, Go
    * net.IP.String() style. */
  val ipMaskV: (String, Int, Int) => String = (ip0, n4, n6) => {
    val ip = Option(ip0).map(_.trim).getOrElse("")
    if (ip.contains(':')) {
      // IPv6 — colon-bearing literals never resolve as hostnames, so
      // InetAddress parses without a DNS round trip
      val ml = if (n6 >= 0) n6 else n4
      if (ml < 0 || ml > 128) null
      else
        try {
          val bytes = java.net.InetAddress.getByName(ip).getAddress
          if (bytes.length != 16) null
          else {
            var i = 0
            val out = new Array[Byte](16)
            while (i < 16) {
              val bits = math.max(0, math.min(8, ml - i * 8))
              val m = (0xff << (8 - bits)) & 0xff
              out(i) = (bytes(i) & m).toByte
              i += 1
            }
            formatIpv6(out)
          }
        } catch { case _: Exception => null }
    } else ipToLong(ip) match {
      case Some(v) =>
        if (n4 < 0 || n4 > 32) null else longToIp(v & maskOf(n4))
      case None => null
    }
  }

  /** RFC 5952 text form of 16 address bytes: lowercase hex groups, no
    * leading zeros, the longest (leftmost on tie) run of 2+ zero groups
    * compressed to `::` — Go net.IP.String(). */
  private def formatIpv6(b: Array[Byte]): String = {
    val g = Array.tabulate(8)(i =>
      ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) { bestStart = -1; bestLen = 0 }
    val sb = new StringBuilder
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::"); i += bestLen
      } else {
        if (sb.nonEmpty && !sb.endsWith(":")) sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(i)))
        i += 1
      }
    }
    if (sb.isEmpty) "::" else sb.toString
  }

  /** ip_prefix(ip, prefixLen): CIDR form of the masked network. */
  val ipPrefix: (String, Int) => String = (ip, prefix) =>
    ipToLong(ip).map(v => s"${longToIp(v & maskOf(prefix))}/$prefix").orNull

  /** is_subnet_of('a.b.c.d/p', ip). */
  val isSubnetOf: (String, String) => java.lang.Boolean = (cidr, ip) => {
    val parts = cidr.split("/")
    (for {
      net <- ipToLong(parts(0))
      p <- scala.util.Try(parts(1).toInt).toOption
      v <- ipToLong(ip)
    } yield java.lang.Boolean.valueOf((v & maskOf(p)) == (net & maskOf(p))))
      .orNull
  }

  /** ip_subnet_min / ip_subnet_max of a CIDR. */
  val ipSubnetMin: String => String = cidr => {
    val parts = cidr.split("/")
    (for { net <- ipToLong(parts(0)); p <- scala.util.Try(parts(1).toInt).toOption }
      yield longToIp(net & maskOf(p))).orNull
  }
  val ipSubnetMax: String => String = cidr => {
    val parts = cidr.split("/")
    (for { net <- ipToLong(parts(0)); p <- scala.util.Try(parts(1).toInt).toOption }
      yield longToIp((net & maskOf(p)) | (~maskOf(p) & 0xFFFFFFFFL))).orNull
  }

  /** ip_subnet_range('a.b.c.d/p') → `["min", "max"]` rendered as the
    * reference's JSON-ish string (`string_function_test.go:888`:
    * `["192.168.1.0", "192.168.1.255"]`); invalid input echoes
    * "invalid ip" exactly like the reference valuer. */
  val ipSubnetRange: String => String = cidr => {
    val parts = cidr.split("/")
    (for {
      net <- ipToLong(parts(0))
      p <- scala.util.Try(parts(1).toInt).toOption if parts.length == 2
    } yield {
      val lo = longToIp(net & maskOf(p))
      val hi = longToIp((net & maskOf(p)) | (~maskOf(p) & 0xFFFFFFFFL))
      s"""["$lo", "$hi"]"""
    }).getOrElse(if (cidr == null) null else "invalid ip")
  }

  /** ip_in_range(ip, cidr) — the IPINRANGE predicate (token.go:422). */
  val ipInRange: (String, String) => java.lang.Boolean =
    (ip, cidr) => isSubnetOf(cidr, ip)

  // ---- Native-expression Column forms of the IP functions ----------------
  // Each is ONE codegen'd tree node ([[graft.expressions.IpExpressions]])
  // whose eval delegates to the Scala closures above — the UDF forms cost
  // 43× on q38 once the bench honestly materialized output columns, and a
  // pure-Column spelling (split + casts + bit ops) fixed the per-row cost
  // but ballooned the collapsed projection tree (~16 ms task deser). The
  // names resolve through the SQL registry (registerSql installs native
  // builders), so these helpers are thin call_function wrappers.
  private def nativeCall(name: String, args: Column*): Column = {
    registerSql(org.apache.spark.sql.SparkSession.active)
    call_function(name, args: _*)
  }
  def ipMaskC(ip: Column, prefix: Column): Column =
    nativeCall("ip_mask", ip, prefix)
  def ipPrefixC(ip: Column, prefix: Column): Column =
    nativeCall("ip_prefix", ip, prefix)
  def isSubnetOfC(cidr: Column, ip: Column): Column =
    nativeCall("is_subnet_of", cidr, ip)
  def ipSubnetMinC(cidr: Column): Column = nativeCall("ip_subnet_min", cidr)
  def ipSubnetMaxC(cidr: Column): Column = nativeCall("ip_subnet_max", cidr)

  /** ip_to_domain(ip) — the reference resolves against a bundled geo
    * dataset (`query/string_functions.go`); that data isn't shippable
    * here, so this implements the dataset-free subset: RFC-reserved
    * range classification. Unknown publics → "internet". */
  val ipToDomain: String => String = ip =>
    ipToLong(ip).map { v =>
      if ((v & maskOf(8)) == 0x7F000000L) "loopback"
      else if ((v & maskOf(8)) == 0x0A000000L ||
        (v & maskOf(12)) == 0xAC100000L ||
        (v & maskOf(16)) == 0xC0A80000L) "intranet"
      else if ((v & maskOf(4)) == 0xE0000000L) "multicast"
      else "internet"
    }.orNull

  /** mobile_carrier(ip) — requires the reference's carrier dataset;
    * honest null stub (documented, like the Multimodal codec). */
  val mobileCarrier: String => String = _ => null

  /** Register the IP functions for SQL use — native expression builders
    * ([[graft.expressions.IpExpressions]]), not UDFs, so InfluxQL text
    * queries get the codegen'd single-node forms too. Idempotent —
    * skipped when already registered, so per-query entry points don't
    * emit one registry-replacement WARN per function per query (the
    * WARN flood crowded the driver's bounded bench-output tail). */
  def registerSql(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("ip_mask"))) return
    import graft.expressions.{IpMaskExpr, IpSubnetOfExpr, IpUnaryExpr}
    reg.createOrReplaceTempFunction("ip_mask",
      e => IpMaskExpr(e(0), e(1), slash = false), "built-in")
    reg.createOrReplaceTempFunction("ip_prefix",
      e => IpMaskExpr(e(0), e(1), slash = true), "built-in")
    reg.createOrReplaceTempFunction("is_subnet_of",
      e => IpSubnetOfExpr(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction("ip_in_range",
      e => IpSubnetOfExpr(e(1), e(0)), "built-in") // (ip, cidr) swapped
    reg.createOrReplaceTempFunction("ip_subnet_min",
      e => IpUnaryExpr(e(0), "subnetMin"), "built-in")
    reg.createOrReplaceTempFunction("ip_subnet_max",
      e => IpUnaryExpr(e(0), "subnetMax"), "built-in")
    reg.createOrReplaceTempFunction("ip_subnet_range",
      e => IpUnaryExpr(e(0), "subnetRange"), "built-in")
    reg.createOrReplaceTempFunction("ip_to_domain",
      e => IpUnaryExpr(e(0), "toDomain"), "built-in")
    spark.udf.register("mobile_carrier", mobileCarrier)
  }
}
