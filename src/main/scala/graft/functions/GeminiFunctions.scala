package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The openGemini scalar ("materialize") function surface re-expressed over
  * Spark — registry list from the reference:
  * math `lib/util/lifted/influx/query/math.go:21-110`, strings
  * `query/string_functions.go`, full predicate/JSON/IP sets per SURVEY §2.8.
  *
  * Almost everything aliases a codegen'd Spark built-in; only the IP helpers
  * are Scala UDFs (pure string/bit math, used off the hot aggregation path).
  * `registry` maps the openGemini name → column builder so a query frontend
  * can resolve calls 1:1; `registerSql(spark)` also exposes the UDF-backed
  * ones to SQL.
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
    "cast_int64" -> (a => a.head.cast("long")),
    "cast_float64" -> (a => a.head.cast("double")),
    "cast_bool" -> (a => a.head.cast("boolean")),
    "cast_string" -> (a => a.head.cast("string")),
    // string_functions.go
    "str" -> (a => a.head.cast("string")),
    "strlen" -> (a => length(a.head)),
    "substr" -> (a => if (a.length > 2) a(0).substr(a(1), a(2))
                      else a(0).substr(a(1), length(a(0)))),
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
    "position" -> (a => call_function("position", a: _*)),
    "strpos" -> (a => call_function("position", a: _*)),
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

  // ---- Codegen'd Column forms of the IP functions ------------------------
  // Pure built-in column math (split + guarded casts + bit ops), so the
  // whole projection stays inside whole-stage codegen — the UDF forms cost
  // 43× on q38 once the bench honestly materialized output columns. Hot
  // paths (q38, machine-generated IPs) use these; the UDFs above stay
  // registered for SQL and keep the reference's lenient-malformed-input
  // quirks (e.g. a trailing-dot quad parses there, nulls here).

  /** Dotted-quad → u32-as-long; null on malformed input. The rlike guard
    * makes the cast safe under ANSI and bounds each octet at 3 digits. */
  def ipToLongC(ip: Column): Column = {
    val p = split(trim(ip), "\\.")
    def oct(i: Int): Column = {
      val s = element_at(p, i)
      val v = when(s.rlike("^\\d{1,3}$"), s.cast("long"))
      when(v <= 255, v)
    }
    when(size(p) === 4,
      shiftleft(oct(1), 24) + shiftleft(oct(2), 16) +
        shiftleft(oct(3), 8) + oct(4))
  }

  /** u32-as-long → dotted quad (null-preserving; concat_ws alone would
    * render null as ""). */
  def longToIpC(v: Column): Column =
    when(v.isNotNull, concat_ws(".",
      shiftright(v, 24).bitwiseAND(lit(255L)).cast("string"),
      shiftright(v, 16).bitwiseAND(lit(255L)).cast("string"),
      shiftright(v, 8).bitwiseAND(lit(255L)).cast("string"),
      v.bitwiseAND(lit(255L)).cast("string")))

  /** Network mask of a prefix length (column form of maskOf; the JVM's
    * masked shift count reproduces the Scala `<<` on out-of-range p). */
  def maskC(p: Column): Column =
    when(p <= 0, lit(0L)).otherwise(
      call_function("shiftleft", lit(0xFFFFFFFFL), lit(32) - p)
        .bitwiseAND(lit(0xFFFFFFFFL)))

  def ipMaskC(ip: Column, prefix: Column): Column =
    longToIpC(ipToLongC(ip).bitwiseAND(maskC(prefix)))

  def ipPrefixC(ip: Column, prefix: Column): Column = {
    val base = longToIpC(ipToLongC(ip).bitwiseAND(maskC(prefix)))
    when(base.isNotNull && prefix.isNotNull,
      concat(base, lit("/"), prefix.cast("string")))
  }

  /** CIDR "a.b.c.d/p" → (network long, prefix int), both null-guarded. */
  private def cidrPartsC(cidr: Column): (Column, Column) = {
    val parts = split(cidr, "/")
    val net = when(size(parts) >= 2, ipToLongC(element_at(parts, 1)))
    val ps = element_at(parts, 2)
    val p = when(size(parts) >= 2 && ps.rlike("^[+-]?\\d{1,9}$"),
      ps.cast("int"))
    (net, p)
  }

  def isSubnetOfC(cidr: Column, ip: Column): Column = {
    val (net, p) = cidrPartsC(cidr)
    val m = maskC(p)
    ipToLongC(ip).bitwiseAND(m) === net.bitwiseAND(m)
  }

  def ipSubnetMinC(cidr: Column): Column = {
    val (net, p) = cidrPartsC(cidr)
    longToIpC(net.bitwiseAND(maskC(p)))
  }

  def ipSubnetMaxC(cidr: Column): Column = {
    val (net, p) = cidrPartsC(cidr)
    val m = maskC(p)
    longToIpC(net.bitwiseAND(m)
      .bitwiseOR(bitwise_not(m).bitwiseAND(lit(0xFFFFFFFFL))))
  }

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

  /** Register the UDF-backed functions for SQL use. Idempotent — skipped
    * when already registered, so per-query entry points don't emit one
    * registry-replacement WARN per function per query (the WARN flood
    * crowded the driver's bounded bench-output tail). */
  def registerSql(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("ip_mask"))) return
    spark.udf.register("ip_mask", ipMask)
    spark.udf.register("ip_prefix", ipPrefix)
    spark.udf.register("is_subnet_of", isSubnetOf)
    spark.udf.register("ip_subnet_min", ipSubnetMin)
    spark.udf.register("ip_subnet_max", ipSubnetMax)
    spark.udf.register("ip_subnet_range", ipSubnetRange)
    spark.udf.register("ip_in_range", ipInRange)
    spark.udf.register("ip_to_domain", ipToDomain)
    spark.udf.register("mobile_carrier", mobileCarrier)
  }
}
