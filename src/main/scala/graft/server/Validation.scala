package graft.server

/** Prometheus write-limits validation + hot-reloadable per-tenant
  * overrides — the reference's `lib/validation/validate.go` +
  * `lib/validation/overrides.go` enforced from
  * `handler_prom.go:99` FilterInvalidTimeSeries, with the override
  * table hot-reloaded from a runtime-config file by
  * `services/runtimecfg/service.go` (Cortex-style `overrides:` YAML).
  *
  * The tenant key is the metric/mst name, exactly like the reference's
  * `FilterInvalidTimeSeries(mst, …)`. Defaults mirror
  * `config.NewLimits()` (`lib/config/limits.go:42`). The
  * `prom_limit_enabled` gate covers SERIES (write-side) validation
  * only — `FilterInvalidTimeSeries` checks it, but the reference calls
  * `ValidateQueryTimeRange` unconditionally (handler.go:2418), so
  * `max_query_length` applies whenever it is set, gate or no gate.
  * Replicated as-is.
  *
  * Divergence, documented: the reference validates the WIRE ORDER of
  * labels (sorted, no duplicates — validate.go:98). Our prompb decode
  * surfaces labels as a Map, which cannot carry wire order; those two
  * checks are absorbed by the decode (a duplicate label key collapses).
  * Every other check is replicated: metric-name presence + charset,
  * label count, name/value lengths, label-name charset, old/future
  * sample bounds, and max query length on the prom query routes.
  */
object Validation {

  /** `config.Limits` (limits.go:25), durations in seconds. */
  final case class Limits(
      promLimitEnabled: Boolean = false,
      maxLabelNameLength: Int = 1024,
      maxLabelValueLength: Int = 2048,
      maxLabelNamesPerSeries: Int = 30,
      rejectOldSamples: Boolean = false,
      rejectOldSamplesMaxAgeS: Long = 14L * 24 * 3600,
      creationGracePeriodS: Long = 600L,
      enforceMetricName: Boolean = true,
      maxQueryLengthS: Long = 0L)

  val defaults: Limits = Limits()

  private val metricNameRe = "[a-zA-Z_:][a-zA-Z0-9_:]*".r
  private val labelNameRe = "[a-zA-Z_][a-zA-Z0-9_]*".r

  /** validate.go:147 ValidateSeries — None = valid. `nowMs` is a
    * parameter so specs can pin the old/future sample bounds. */
  def validateSeries(l: Limits, labels: Map[String, String],
                     sampleTimesMs: Seq[Long],
                     nowMs: Long = System.currentTimeMillis()):
      Option[String] = {
    if (!l.promLimitEnabled) return None
    val metricName = labels.getOrElse("__name__", "")
    if (l.enforceMetricName) {
      if (metricName.isEmpty)
        return Some("sample missing metric name")
      if (!metricNameRe.matches(metricName))
        return Some(s"sample invalid metric name: $metricName")
    }
    if (labels.size > l.maxLabelNamesPerSeries)
      return Some(s"series has too many labels (actual: ${labels.size}, " +
        s"limit: ${l.maxLabelNamesPerSeries})")
    labels.keysIterator.toSeq.sorted.foreach { name =>
      if (name != "__name__" && !labelNameRe.matches(name))
        return Some(s"sample invalid label: $name")
      if (name.length > l.maxLabelNameLength)
        return Some(s"label name too long: $name")
      if (labels(name).length > l.maxLabelValueLength)
        return Some(s"label value too long: ${labels(name)}")
    }
    if (sampleTimesMs.isEmpty) return Some("timeseries have no sample")
    sampleTimesMs.foreach { t =>
      if (l.rejectOldSamples && t < nowMs - l.rejectOldSamplesMaxAgeS * 1000L)
        return Some(s"timestamp too old: $t metric: $metricName")
      if (l.creationGracePeriodS != 0L &&
          t > nowMs + l.creationGracePeriodS * 1000L)
        return Some(s"timestamp too new: $t metric: $metricName")
    }
    None
  }

  /** validate.go:172 ValidateQueryTimeRange — None = valid. */
  def validateQueryTimeRange(l: Limits, startMs: Long,
                             endMs: Long): Option[String] = {
    if (l.maxQueryLengthS > 0 && endMs - startMs > l.maxQueryLengthS * 1000L)
      Some(s"the query time range exceeds the limit (query length: " +
        s"${(endMs - startMs) / 1000.0}s, limit: ${l.maxQueryLengthS}s)")
    else None
  }

  // ------------------------------------------------- runtime overrides
  /** Parse the runtimecfg override document (runtimeconfig.go
    * runtimeConfig / the Cortex `overrides:` shape) from the flat
    * YAML subset the reference's own test fixtures use:
    *
    * {{{
    * overrides:
    *   tenant-a:
    *     prom_limit_enabled: true
    *     max_label_names_per_series: 5
    * }}}
    *
    * Indentation-structured, scalars only — a full YAML engine is a
    * dependency this parser does not need for the fixed two-level
    * schema. Unknown keys are ignored (forward compatibility),
    * malformed scalars raise. */
  def parseOverrides(text: String): Map[String, Limits] = {
    var out = Map.empty[String, Limits]
    var tenant: Option[String] = None
    var tenantIndent = -1
    var inOverrides = false
    text.split("\n").foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        // indentation-agnostic: any leading whitespace counts (2-space,
        // 4-space and tab-indented documents all parse); structure is
        // "deeper than the enclosing line", not a fixed width
        val indent = line.takeWhile(c => c == ' ' || c == '\t').length
        val body = line.trim
        if (indent == 0) {
          inOverrides = body.startsWith("overrides:")
          tenant = None
          tenantIndent = -1
        } else if (inOverrides && body.endsWith(":") &&
            (tenantIndent < 0 || indent <= tenantIndent)) {
          val t = body.dropRight(1).trim.stripPrefix("\"").stripSuffix("\"")
          tenant = Some(t)
          tenantIndent = indent
          out = out.updated(t, out.getOrElse(t, defaults))
        } else if (inOverrides && tenant.isDefined) {
          val Array(k, v) = body.split(":", 2).map(_.trim)
          val t = tenant.get
          val cur = out(t)
          def b = v.toBoolean
          def i = v.toInt
          def secs = parseDurationS(v)
          val upd = k match {
            case "prom_limit_enabled" => cur.copy(promLimitEnabled = b)
            case "max_label_name_length" => cur.copy(maxLabelNameLength = i)
            case "max_label_value_length" => cur.copy(maxLabelValueLength = i)
            case "max_label_names_per_series" =>
              cur.copy(maxLabelNamesPerSeries = i)
            case "reject_old_samples" => cur.copy(rejectOldSamples = b)
            case "reject_old_samples_max_age" =>
              cur.copy(rejectOldSamplesMaxAgeS = secs)
            case "creation_grace_period" =>
              cur.copy(creationGracePeriodS = secs)
            case "enforce_metric_name" => cur.copy(enforceMetricName = b)
            case "max_query_length" => cur.copy(maxQueryLengthS = secs)
            case _ => cur // unknown key: ignored
          }
          out = out.updated(t, upd)
        }
      }
    }
    out
  }

  /** Prometheus model.Duration subset: `300s`, `5m`, `1h`, `14d`
    * (and a bare integer = seconds). */
  private def parseDurationS(s: String): Long = {
    val t = s.trim
    if (t.forall(_.isDigit)) t.toLong
    else {
      val n = t.dropRight(1).toLong
      t.last match {
        case 's' => n
        case 'm' => n * 60
        case 'h' => n * 3600
        case 'd' => n * 86400
        case 'w' => n * 7 * 86400
        case u => sys.error(s"unsupported duration unit: $u")
      }
    }
  }

  /** Hot-reloading override store (`services/runtimecfg`): re-reads the
    * file when its mtime changes, checked lazily on each lookup — the
    * reference polls on a timer; a stat per request is the single-node
    * equivalent with zero staleness window. A parse failure KEEPS the
    * previous good table (the reference logs and keeps serving too). */
  final class Overrides(path: Option[java.nio.file.Path]) {
    @volatile private var table = Map.empty[String, Limits]
    @volatile private var seenMtime = -1L

    def limitsFor(tenant: String): Limits = {
      reloadIfChanged()
      table.getOrElse(tenant, defaults)
    }

    def all: Map[String, Limits] = { reloadIfChanged(); table }

    private def reloadIfChanged(): Unit = path.foreach { p =>
      val m =
        try java.nio.file.Files.getLastModifiedTime(p).toMillis
        catch { case _: Exception => -1L }
      if (m != seenMtime) synchronized {
        if (m != seenMtime) {
          if (m >= 0) {
            // record the mtime only AFTER a successful parse: a torn
            // read of a mid-write file whose final mtime lands in the
            // same millisecond must retry on the next lookup, not be
            // skipped forever
            try {
              table = parseOverrides(new String(
                java.nio.file.Files.readAllBytes(p), "UTF-8"))
              seenMtime = m
            } catch { case e: Exception =>
              System.err.println(
                s"[gateway] runtimecfg reload failed, keeping previous: " +
                  s"${e.getMessage}")
            }
          } else { table = Map.empty; seenMtime = m }
        }
      }
    }
  }
}
