package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import graft.query.{InfluxQL, LogPipe, PromQL}
import graft.sources.{LineProtocol, OtlpLogs, OtlpMetrics, OtlpTraces, PromRemoteRead, PromRemoteWrite, ResultShaper}

/** Minimal HTTP serving surface over the library, mirroring the
  * reference's httpd routes (`lib/util/lifted/influx/httpd/handler.go:264`
  * `/write`, `:276` `/query`, and the prom-compatible `/api/v1/…` family
  * at `handler.go:318-345`):
  *
  *   - `GET|POST /query` — InfluxQL. Params `q`, `epoch` (h/m/s/ms/u/ns,
  *     default ms), `chunked` + `chunk_size` (each chunk a complete JSON
  *     document on its own line, non-final chunks of a series marked
  *     `"partial":true` — `httpsender_transform.go`'s contract).
  *     `SELECT … INTO` registers the result as a new queryable
  *     measurement and reports `{"written":N}` rows.
  *   - `POST /write` — line protocol body. Param `precision` (n/u/ms/s/m/h,
  *     default ns — `handler.go` precision query arg). Schema-on-write
  *     type conflicts in the batch are rejected 400 like the reference's
  *     partial-write errors (`coordinator/write_helper.go:463`).
  *   - `GET /api/v1/query_range` — PromQL range query (`query`, `start`,
  *     `end`, `step`); Prometheus `matrix` response JSON.
  *   - `GET /api/v1/query` — PromQL instant query (`query`, `time`);
  *     `vector` response JSON.
  *   - `POST /api/v1/write` & `/api/v1/prom/write` — Prometheus remote
  *     write (snappy+protobuf `WriteRequest`, `handler_prom.go:86`).
  *   - `POST /api/v1/read` — Prometheus remote read (`ReadRequest` →
  *     raw-sample `ReadResponse`, `handler_prom.go:303`).
  *   - `GET /ping` — 204, like the reference's health probe.
  *
  * `/query` bodies come from the same [[ResultShaper]] the library path
  * uses — byte-identical by construction (ServerSpec asserts it). The
  * server binds loopback only and is the correctness harness's serving
  * veneer, not a hardened ingress. Documented divergences from the
  * reference: timestamps always epoch-encoded (no RFC3339 mode), and the
  * Prom range grid is step-aligned to the epoch (the engine's evalGrid)
  * rather than to `start`.
  *
  * All distributed work stays in Spark; handlers only trigger the final
  * collect that the reference's single-node HTTP sender performs too.
  */
final class HttpGateway(spark: SparkSession,
                        init: Map[String, InfluxQL.Measurement],
                        prom: Map[String, PromQL.Metric],
                        port: Int = 0,
                        requireAuth: Boolean = false,
                        maxRowLimit: Int = 1000000,
                        persistDir: Option[String] = None) {

  /** Gateway-held user catalog (the reference's meta user store). User
    * management statements mutate it whether or not enforcement is on,
    * so SHOW USERS/GRANTS round-trip either way; `requireAuth` decides
    * whether requests must authenticate (`http-auth-enabled`). */
  val auth = new Auth

  @volatile private var catalog = init
  @volatile private var promCat = prom
  // prom metric STORES (`/prometheus/{metric_store}/api/v1/*`,
  // handler.go:397-433): one measurement holds every series of the
  // store, `__name__` as an ordinary label — queries against a store
  // resolve each metric selector onto that frame filtered by __name__
  @volatile private var promStores = Map.empty[String, PromQL.Metric]
  // the one runtime knob SET CONFIG can change (statement_executor.go:
  // 2572 executeSetConfig — sql/logging.level only, everything else is
  // "unsupported config command"); rendered back by SHOW CONFIGS
  @volatile private var loggingLevel = "info"
  // geo fences (services/fence): id → circle; registered by writes to
  // the `fence` measurement, persisted to _fences.txt
  @volatile private var fences = Map.empty[String, Fence.Circle]
  private def fencesFile =
    persistDir.map(d => java.nio.file.Paths.get(d, "_fences.txt"))
  private def persistFences(): Unit = fencesFile.foreach { f =>
    java.nio.file.Files.write(f, fences.values.toSeq.sortBy(_.id)
      .map(c => s"${enc(c.id)}\t${enc(c.geometryText)}")
      .mkString("\n").getBytes(UTF_8))
  }

  /** Store-scoped PromQL catalog: `get(name)` synthesizes the metric
    * view lazily (`__name__ = name` filter over the store frame), so
    * only names the query actually references are built. Name-regex
    * listing (`{__name__=~…}`) is not served in store mode — the
    * iterator is empty, matching the reference's store queries which
    * always address the mst. */
  private final class StoreCatView(m: PromQL.Metric)
      extends scala.collection.immutable.AbstractMap[String, PromQL.Metric] {
    import org.apache.spark.sql.functions.col
    override def get(name: String): Option[PromQL.Metric] =
      Some(m.copy(df = m.df.filter(col("__name__") === name),
        labels = m.labels.filterNot(_ == "__name__"), extentMs = None))
    override def iterator: Iterator[(String, PromQL.Metric)] =
      Iterator.empty
    override def removed(key: String): Map[String, PromQL.Metric] = this
    override def updated[V1 >: PromQL.Metric](key: String, value: V1)
        : Map[String, V1] = Map(key -> value)
  }

  // ------------------------------------------------ database catalog
  /** The database set (`meta/database.go:21` DatabaseInfo, minus RPs —
    * every database has the implicit `autogen` policy). Measurements of
    * the DEFAULT database live under their bare names in `catalog`;
    * other databases' measurements are namespace-prefixed
    * `db\u0000name` — ONE registry, per-request sliced by
    * [[catalogFor]]. CREATE/DROP DATABASE are real here; the PromQL
    * catalog stays a single namespace (documented divergence — the
    * prom API carries no database axis in this gateway). */
  val defaultDb = "graft"
  @volatile private var databases: Set[String] = Set(defaultDb)
  /** Whether the implicit default database is REAL to a user: it lists
    * in SHOW DATABASES once it holds data (constructor catalog, a
    * write, a measurement) or was CREATEd explicitly. */
  @volatile private var defaultDbTouched: Boolean =
    init.nonEmpty || prom.nonEmpty
  // GRANT/REVOKE validate names against this catalog (data.go:2919)
  auth.databaseExists = db => databases.contains(db)
  /** Per-database retention policies (`meta/retentionpolicy.go:33`);
    * every database is born with `autogen`. Qualified `db.rp.m` refs
    * validate `rp` against this registry. */
  @volatile private var retention: Map[String, Map[String, Retention.Rp]] =
    Map(defaultDb -> Retention.autogen)
  /** Measurements that are LOG stores (logkeeper logstreams, created via
    * the logstream CRUD): rows at the same (series, ns) are DISTINCT
    * records — the consume cursor contract is literally (timestamp,
    * rows-at-timestamp) (`handler_logstore_consume.go`) — so the
    * TS-store point-identity merge never applies to them, on any write
    * route. Keyed by [[dbKey]]; persisted in `_logstreams.txt`. */
  @volatile private var logStores: Set[String] = Set.empty
  /** Known ns time extent per measurement (dbKey → [min,max]), tracked
    * from write batches (exact for gateway-born measurements; seeded
    * from parquet footer stats after a restart via Measurement.extentMs).
    * Lets the write path SKIP the point-merge for batches that cannot
    * collide with any existing point — the dominant append-ingest shape
    * stays O(batch) per write. An unknown extent always merges (too-small
    * would silently skip a needed merge; too-large only costs an extra
    * merge). Mutated only under the ingest `synchronized`. */
  private val extentSeenNs =
    scala.collection.mutable.Map.empty[String, (Long, Long)]

  // ------------------------------------------- continuous queries
  /** CQ registry keyed (db, name) -- the reference's
    * `services/continuousquery/service.go` scheduler state: parsed
    * statement, original text (SHOW CONTINUOUS QUERIES echoes it), and
    * the last-run instant. Runs are driven by [[runContinuousQueries]]
    * with an explicit `now` -- a deployment ticks it from a scheduler
    * thread; tests advance time deterministically. */
  private case class CqEntry(stmt: graft.streaming.StreamDDL.StreamStatement,
                             text: String, lastRunMs: Long)
  @volatile private var cqRegistry: Map[(String, String), CqEntry] = Map.empty

  /** DOWNSAMPLE policies per (db, rp) + per-(db, measurement, tier)
    * rolled-up-to marks — see [[DownSample]] for semantics/citations. */
  @volatile private var dsRegistry: Map[(String, String), DownSample.Policy] =
    Map.empty
  @volatile private var dsMarks: Map[(String, String, Int), Long] = Map.empty

  /** STREAM tasks per (db, name): the reference's stream service
    * aggregates arriving points into per-window state and flushes a
    * window once `window + DELAY` has passed (`app/ts-store/stream/` —
    * time_task/tag_task window caches). The batch-gateway equivalent:
    * [[runStreams]] flushes every closed window of landed writes once,
    * APPENDING to the target — unlike a CQ, a stream never recomputes
    * flushed windows (the DELAY is its entire late-data budget). */
  private case class StreamEntry(stmt: graft.streaming.StreamDDL.StreamStatement,
                                 text: String, flushedUpToMs: Long)
  @volatile private var streamRegistry: Map[(String, String), StreamEntry] =
    Map.empty

  /** Declared measurement schemas per (db, name) — CREATE MEASUREMENT /
    * ALTER … WITH SHARDKEY / SHOW SHARDKEY|ENGINETYPE|… introspection
    * (see [[MeasurementDDL]]). */
  @volatile private var mstSchemas
    : Map[(String, String), MeasurementDDL.Schema] = Map.empty

  /** SUBSCRIPTION catalog per (db, rp, name) — the reference forwards
    * every write of db.rp to the registered destinations
    * (`services/subscriber`); the gateway keeps the catalog live
    * (CREATE/DROP/SHOW round-trip) and the forwarding path is
    * `Streams.subscriptionSink` wired to a write stream. */
  @volatile private var subRegistry
    : Map[(String, String, String), graft.streaming.StreamDDL.Subscription] =
    Map.empty

  /** One scheduler sweep at time `nowMs` (`service.go:178` Run loop ->
    * ExecuteContinuousQuery): a CQ is due when `nowMs` has advanced at
    * least EVERY (default: its GROUP BY interval) past its last run.
    * A due CQ recomputes the window
    * `[trunc(now) - max(FOR, EVERY, interval), trunc(now))` -- FOR is the
    * backfill horizon -- and MERGES the aggregation into the target
    * measurement: recomputed buckets replace, untouched history stays.
    * Returns the number of CQs executed. */
  def runContinuousQueries(nowMs: Long): Int = synchronized {
    import org.apache.spark.sql.functions.{col, timestamp_millis, unix_millis}
    var ran = 0
    cqRegistry.foreach { case ((db, name), e) =>
      val st = e.stmt
      val bucketMs = math.max(1L, st.intervalNs / 1000000L)
      val everyMs = math.max(1L, st.every.getOrElse(st.intervalNs) / 1000000L)
      if (e.lastRunMs < 0 || nowMs >= e.lastRunMs + everyMs) {
        val end = Math.floorDiv(nowMs, bucketMs) * bucketMs
        val forMs = math.max(st.forNs.map(_ / 1000000L).getOrElse(0L),
          math.max(everyMs, bucketMs))
        val start = end - forMs
        val cat = sliceOf(catalog, db)
        if (end > start && cat.contains(st.from)) {
          val callsSql = st.calls
            .map { case (fn, f) => s"$fn($f)" }.mkString(", ")
          val groupBy = (Seq(s"time(${bucketMs}ms)") ++ st.tags)
            .mkString(", ")
          val sql = s"SELECT $callsSql FROM ${st.from} " +
            s"WHERE time >= ${start}000000 AND time < ${end}000000 " +
            s"GROUP BY $groupBy"
          val res = InfluxQL.execute(cat, sql)
            .withColumn("__ts", timestamp_millis(col("time")))
          val merged = cat.get(st.target) match {
            case Some(old) =>
              val keep = old.df.filter(
                unix_millis(col(old.time)) < start ||
                  unix_millis(col(old.time)) >= end)
              InfluxQL.Measurement(
                keep.unionByName(res, allowMissingColumns = true),
                st.tags, old.time)
            case None => InfluxQL.Measurement(res, st.tags, "__ts")
          }
          catalog = catalog + (dbKey(db, st.target) -> merged)
          ran += 1
        }
        cqRegistry = cqRegistry + ((db, name) -> e.copy(lastRunMs = nowMs))
      }
    }
    ran
  }

  // ---- DDL durability: the reference's meta store is raft-journaled
  // (meta/data.go), so CQs, streams, subscriptions, downsample policies
  // and declared measurement schemas all survive a restart. Here every
  // registry mutation rewrites `_ddl.txt` (atomic, like _databases.txt)
  // with CANONICAL statement text regenerated from registry state, and
  // startup replays the lines through the same register functions.
  // Stream entries carry their flush high-water mark (exactly-once across
  // restarts); downsample marks are pure optimization (rollTier inputs
  // filter on __ds_tier, so re-sweeping is idempotent) and CQ lastRun
  // re-derives from EVERY (recompute-merge is idempotent).
  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
  private def ddlFile =
    persistDir.map(d => java.nio.file.Paths.get(d, "_ddl.txt"))

  // ---- DML durability: destructive statements (DELETE, DROP SERIES,
  // DROP MEASUREMENT, DROP SHARD) mutate the in-memory catalog only —
  // the persisted parquet is append-only, so a restart would resurrect
  // deleted rows. Like the reference's raft-journaled meta deletes
  // (meta/data.go DropShard, store delete ops), every data-changing
  // statement appends to `_dml.txt` with its issue-time now() and is
  // replayed after data + DDL load. Tombstone-style on purpose: no
  // parquet is rewritten at delete time (the only viable delete at
  // scale); folding tombstones into files is Compaction's territory.
  private def dmlFile =
    persistDir.map(d => java.nio.file.Paths.get(d, "_dml.txt"))
  private def journalDml(db: String, text: String, nowMs: Long): Unit =
    dmlFile.foreach { f =>
      java.nio.file.Files.write(f,
        s"${enc(db)}\t$nowMs\t${enc(text)}\n".getBytes(UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }

  /** Fold the DML journal into the persisted parquet — the
    * storage-maintenance half of the tombstone model (the reference's
    * compaction merges tombstones into TSSP files the same way;
    * [[graft.sources.Compaction]] is the small-file half). Re-applies
    * every journaled statement to a catalog built from the persisted
    * DIRS ONLY (the in-memory catalog already has them applied live),
    * atomically rewrites each changed dir, deletes dropped-measurement
    * dirs, and truncates the journal — after which a restart restores
    * the same state from data files alone and replay cost stops
    * growing with delete history. Returns the number of dirs rewritten
    * or removed. Idempotent: a crash between rewrite and truncate just
    * re-filters already-filtered rows on the next fold. */
  /** Replay journaled DML lines onto the LIVE catalog (restart, and
    * after a hierarchical sweep rebuilds entries from parquet). The
    * line parse sits INSIDE the try so a truncated line from a crash
    * mid-append is logged and skipped, not a boot abort. */
  private def replayDmlJournal(onlyDb: Option[String] = None): Unit =
    dmlFile.filter(java.nio.file.Files.exists(_)).foreach { f =>
      new String(java.nio.file.Files.readAllBytes(f), UTF_8)
        .split("\n").filter(_.nonEmpty).foreach { line =>
          try {
            val Array(dbE, nowE, textE) = line.split("\t", 3)
            val db = dec(dbE); val text = dec(textE)
            if (onlyDb.forall(_ == db)) {
              if ("(?is)^\\s*drop\\s+shard\\s+\\d+\\s*$".r.matches(text)) {
                val before = sliceOf(catalog, db)
                dropShardData(db, text.trim.split("\\s+")(2).toLong)
                propagateDml(db, before, sliceOf(catalog, db))
              } else {
                val before = sliceOf(catalog, db)
                val after = Map.empty ++
                  InfluxQL.executeManage(before, text, nowE.toLong)
                applySlice(db, before, after)
                // replay propagates like live DML: the prom twins were
                // restored from the pre-tombstone parquet above
                propagateDml(db, before, after)
              }
            }
          } catch { case e: Exception =>
            System.err.println(
              s"[gateway] DML replay skipped: $line (${e.getMessage})")
          }
        }
    }

  def foldDmlJournal(): Int = synchronized {
    val fOpt = dmlFile.filter(java.nio.file.Files.exists(_))
    if (fOpt.isEmpty || persistDir.isEmpty) return 0
    val f = fOpt.get
    val lines = new String(java.nio.file.Files.readAllBytes(f), UTF_8)
      .split("\n").filter(_.nonEmpty)
    if (lines.isEmpty) return 0
    // dir-only catalog; `day` kept so the rewrite stays day-partitioned
    var dirCat = Map.empty[String, InfluxQL.Measurement]
    val base = java.nio.file.Paths.get(persistDir.get)
    val ls = java.nio.file.Files.list(base)
    try ls.filter(p => java.nio.file.Files.isDirectory(p) &&
        !p.getFileName.toString.startsWith("_")).forEach { p =>
      val name = java.net.URLDecoder.decode(p.getFileName.toString, "UTF-8")
      val meta = p.resolve("_tags.txt")
      val tags =
        if (java.nio.file.Files.exists(meta))
          new String(java.nio.file.Files.readAllBytes(meta), UTF_8)
            .split("\n").filter(_.nonEmpty).toSeq
        else Nil
      // hot ∪ cold tier: the journal may hold tombstones over rows the
      // hierarchical sweep already moved cold — folding only the hot
      // tier then truncating would LOSE them. The fold reads both,
      // rewrites the hot dir with the full filtered frame, and drops
      // the cold dir; the next sweep re-tiers old partitions.
      val coldP = p.getParent.resolve("_cold").resolve(
        p.getFileName.toString)
      val hotDf = spark.read.option("mergeSchema", "true")
        .parquet(p.toString)
      val full =
        if (java.nio.file.Files.isDirectory(coldP))
          hotDf.unionByName(spark.read.option("mergeSchema", "true")
            .parquet(coldP.toString), allowMissingColumns = true)
        else hotDf
      dirCat = dirCat + (name -> InfluxQL.Measurement(full, tags, "ts"))
    } finally ls.close()
    val beforeCat = dirCat
    // Lines whose statement touches an init (in-memory) measurement
    // cannot fully fold: tombstones over init rows live only in the
    // journal — retain exactly those so restart/reload replay keeps
    // filtering them. Everything else (parquet-backed targets) folds
    // into the rewrite below and is dropped, so the journal truncates
    // instead of growing without bound with delete history.
    // compiled once — the fold walks every journal line (which this
    // change exists to keep bounded, but the pre-truncation backlog
    // can be long)
    val dropShardRe = "(?is)^\\s*drop\\s+shard\\s+\\d+\\s*$".r
    // the name may be double-quoted, single-quoted (ident() accepts
    // TStr) or bare — compare UNQUOTED against the init slice
    val dmlTargetRe = ("(?is)^\\s*(?:delete\\s+from|drop\\s+series\\s+" +
      "from|drop\\s+measurement)\\s+" +
      "(?:\"([^\"]+)\"|'([^']+)'|([^\\s;\"']+))").r
    def touchesInit(db: String, text: String): Boolean = {
      val initSlice = sliceOf(init, db)
      if (initSlice.isEmpty) false
      // DROP SHARD prunes time ranges across every measurement — any
      // init measurement in the db may carry affected rows
      else if (dropShardRe.matches(text)) true
      else dmlTargetRe.findFirstMatchIn(text) match {
        case Some(g) =>
          val name = Option(g.group(1)).orElse(Option(g.group(2)))
            .getOrElse(g.group(3))
          initSlice.contains(name)
        case None => true // unrecognized shape — retain, conservatively
      }
    }
    val retained = Seq.newBuilder[String]
    lines.foreach { line =>
      try {
        val Array(dbE, nowE, textE) = line.split("\t", 3)
        val db = dec(dbE); val text = dec(textE)
        if (touchesInit(db, text)) retained += line
        if (dropShardRe.matches(text)) {
          val sid = text.trim.split("\\s+")(2).toLong
          dropShardSlice(db, sid, sliceOf(dirCat, db)).foreach { upd =>
            dirCat = dirCat ++ upd.map { case (k, m) => dbKey(db, k) -> m }
          }
        } else {
          val before = sliceOf(dirCat, db)
          val after = Map.empty[String, InfluxQL.Measurement] ++
            InfluxQL.executeManage(before, text, nowE.toLong)
          dirCat = (dirCat --
            (before.keySet -- after.keySet).map(dbKey(db, _))) ++
            after.map { case (k, m) => dbKey(db, k) -> m }
        }
      } catch { case e: Exception =>
        // a statement naming an unpersisted measurement has nothing to
        // fold — its live effect is already in the in-memory catalog
        System.err.println(
          s"[gateway] DML fold skipped: $line (${e.getMessage})")
      }
    }
    var n = 0
    def coldDirOf(name: String): Option[String] = persistPath(name)
      .map { d =>
        val p = java.nio.file.Paths.get(d)
        p.getParent.resolve("_cold").resolve(p.getFileName.toString)
          .toString
      }
    (beforeCat.keySet -- dirCat.keySet).foreach { name =>
      persistPath(name).foreach { d => deleteDirTree(d); n += 1 }
      coldDirOf(name).foreach(deleteDirTree)
    }
    dirCat.foreach { case (name, m) =>
      if (!beforeCat.get(name).exists(_.df eq m.df)) {
        persistPath(name).foreach { d =>
          rewriteDir(d, m.df)
          coldDirOf(name).foreach(deleteDirTree)
          // the LIVE catalog entry still references the swapped-out
          // files (its df was built from the old listing at startup) —
          // rebuild exactly like a restart: init ∪ hot ∪ cold tier.
          // Caveats, documented: tombstones over init-catalog rows and
          // over already-cold partitions live in memory/journal only —
          // the fold rewrites the HOT tier it scanned.
          reloadPersisted(name, m.tags)
          n += 1
        }
      }
    }
    val keep = retained.result()
    java.nio.file.Files.write(f,
      keep.map(_ + "\n").mkString.getBytes(UTF_8))
    n
  }

  /** Rebuild a catalog entry exactly like a restart composes it:
    * init frame ∪ hot dir ∪ `_cold` tier dir. */
  private def reloadPersisted(name: String, tags: Seq[String]): Unit =
    persistPath(name).foreach { d =>
      val p = java.nio.file.Paths.get(d)
      def readIf(path: java.nio.file.Path): Option[DataFrame] =
        try Some(spark.read.option("mergeSchema", "true")
          .parquet(path.toString).drop("day"))
        catch { case _: Exception => None } // emptied tier: no parquet
      val coldP = java.nio.file.Paths.get(
        persistDir.get, "_cold", p.getFileName.toString)
      val parts = (readIf(p) ++ readIf(coldP)).toSeq
      if (parts.nonEmpty) {
        val raw = parts.reduce(
          _.unionByName(_, allowMissingColumns = true))
        val fresh =
          if (java.nio.file.Files.exists(p.resolve("_pts")) &&
              !logStores.contains(name))
            HttpGateway.dedupPersisted(raw, tags)
          else raw.drop("__wseq")
        val ext = try graft.sources.ParquetStats.timeExtentMsOf(raw, "ts")
                  catch { case _: Exception => None }
        catalog = catalog + (name -> (init.get(name) match {
          case Some(prev) => InfluxQL.Measurement(
            prev.df.unionByName(fresh, allowMissingColumns = true),
            (prev.tags ++ tags).distinct, prev.time)
          case None => InfluxQL.Measurement(fresh, tags, "ts",
            extentMs = ext)
        }))
      }
    }

  /** One hierarchical-storage sweep at `nowMs`
    * (`services/hierarchical/service.go` handle → the engine's
    * FetchShardsNeedChangeStore / hierarchical cold move): for every
    * database whose default RP sets WARM DURATION, day partitions
    * entirely older than now−warm MOVE from the persisted measurement
    * dirs into the `_cold/<name>/` tier — a separate storage root
    * standing in for the reference's OBS cold store. hot→warm alone is
    * a tier RELABEL (SHOW SHARDS' tier column derives from the
    * durations); warm→cold is the storage move, exactly the
    * reference's split. Queries keep seeing one measurement: affected
    * catalog entries rebuild as init ∪ hot ∪ cold. Returns the number
    * of partition dirs moved. */
  def runHierarchical(nowMs: Long): Int = synchronized {
    if (persistDir.isEmpty) return 0
    // Fold pending tombstones into the parquet FIRST: the sweep's
    // reloadPersisted rebuilds live entries straight from the files,
    // so an unfolded DELETE/DROP SHARD issued before the sweep would
    // silently resurrect its rows in the live session.
    foldDmlJournal()
    var moved = 0
    val touched = Set.newBuilder[String]
    databases.foreach { db =>
      val rps = retention.getOrElse(db, Retention.autogen)
      val rp = rps.find(_._2.default).map(_._2).getOrElse(rps.head._2)
      if (rp.warmS > 0) {
        val cutoffDay = java.time.Instant
          .ofEpochMilli(nowMs - rp.warmS * 1000L).toString.substring(0, 10)
        sliceOf(catalog, db).keys.toSeq.foreach { mst =>
          val key = dbKey(db, mst)
          persistPath(key).foreach { d =>
            val p = java.nio.file.Paths.get(d)
            if (java.nio.file.Files.isDirectory(p)) {
              val ls = java.nio.file.Files.list(p)
              val days =
                try {
                  val b = Seq.newBuilder[java.nio.file.Path]
                  val it = ls.iterator()
                  while (it.hasNext) {
                    val e = it.next()
                    val n = e.getFileName.toString
                    // `day=YYYY-MM-DD` strictly before the cutoff day
                    if (java.nio.file.Files.isDirectory(e) &&
                        n.startsWith("day=") &&
                        n.substring(4) < cutoffDay) b += e
                  }
                  b.result()
                } finally ls.close()
              if (days.nonEmpty) {
                val coldBase = java.nio.file.Paths.get(
                  persistDir.get, "_cold", p.getFileName.toString)
                java.nio.file.Files.createDirectories(coldBase)
                days.foreach { dp =>
                  val target = coldBase.resolve(dp.getFileName)
                  if (java.nio.file.Files.exists(target)) {
                    // same-day remainder from an earlier sweep: merge
                    // file-level (names are globally-unique part files)
                    val fs = java.nio.file.Files.list(dp)
                    try fs.forEach(f => java.nio.file.Files.move(
                      f, target.resolve(f.getFileName)))
                    finally fs.close()
                    java.nio.file.Files.delete(dp)
                  } else java.nio.file.Files.move(dp, target)
                }
                moved += days.size
                val tags = catalog.get(key).map(_.tags).getOrElse(Nil)
                reloadPersisted(key, tags)
                touched += db
              }
            }
          }
        }
      }
    }
    // Any journal lines the fold retained (init-catalog tombstones)
    // must re-filter the just-rebuilt entries, exactly like a restart.
    touched.result().foreach(db => replayDmlJournal(Some(db)))
    moved
  }

  /** Atomic day-partitioned rewrite of a measurement dir (the
    * write-tmp/copy-sidecars/swap sequence Compaction.compactDays
    * uses), reading lazily from the old files while writing the new. */
  private def rewriteDir(path: String, df: DataFrame): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = path.stripSuffix("/") + ".fold_tmp"
    df.write.mode("overwrite").partitionBy("day").parquet(tmp)
    val p = Paths.get(path); val t = Paths.get(tmp)
    val side = Files.list(p)
    try side.filter(f => Files.isRegularFile(f) &&
        f.getFileName.toString.startsWith("_"))
      .forEach(f => Files.copy(f, t.resolve(f.getFileName),
        StandardCopyOption.REPLACE_EXISTING))
    finally side.close()
    val old = Paths.get(path.stripSuffix("/") + ".fold_old")
    Files.move(p, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(t, p, StandardCopyOption.ATOMIC_MOVE)
    deleteDirTree(old.toString)
  }

  private def deleteDirTree(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(java.nio.file.Files.delete(_))
      finally s.close()
    }
  }

  private def renderSub(s: graft.streaming.StreamDDL.Subscription): String =
    s"CREATE SUBSCRIPTION ${s.name} ON ${s.db}.${s.rp} DESTINATIONS " +
      s"${s.mode} " + s.destinations.map(u => s"'$u'").mkString(", ")

  private def renderDs(rp: String, p: DownSample.Policy): String = {
    val calls = p.calls.map(c => s"${c.tpe}(${c.ops.mkString(", ")})")
      .mkString(", ")
    s"CREATE DOWNSAMPLE ON $rp ($calls) WITH DURATION ${p.durationS}s " +
      s"SAMPLEINTERVAL(${p.sampleS.map(_ + "s").mkString(", ")}) " +
      s"TIMEINTERVAL(${p.timeS.map(_ + "s").mkString(", ")})"
  }

  private def renderMst(sc: MeasurementDDL.Schema): String = {
    val cols = (sc.tags.map(t => s"$t tag") ++
      sc.fields.map { case (n, t) => s"$n $t" })
    val colPart = if (cols.isEmpty) "" else cols.mkString(" (", ", ", ")")
    val opts = Seq(
      s"ENGINETYPE = ${sc.engineType}",
      if (sc.shardKey.nonEmpty)
        s"SHARDKEY ${sc.shardKey.mkString(",")} TYPE ${sc.shardType}" else "",
      if (sc.primaryKey.nonEmpty)
        s"PRIMARYKEY ${sc.primaryKey.mkString(",")}" else "",
      if (sc.sortKey.nonEmpty) s"SORTKEY ${sc.sortKey.mkString(",")}" else "",
      sc.indexes.map { case (n, cs) =>
        s"INDEXTYPE $n" + (if (cs.nonEmpty) s" INDEXLIST ${cs.mkString(",")}"
                           else "") }.mkString(" ")
    ).filter(_.nonEmpty).mkString(" ")
    s"CREATE MEASUREMENT ${sc.name}$colPart WITH $opts"
  }

  private def persistDdl(): Unit = ddlFile.foreach { f =>
    val lines =
      cqRegistry.toSeq.sortBy(_._1).map { case ((db, _), e) =>
        s"cq\t${enc(db)}\t-\t${enc(e.text)}" } ++
      streamRegistry.toSeq.sortBy(_._1).map { case ((db, _), e) =>
        s"stream\t${enc(db)}\t${e.flushedUpToMs}\t${enc(e.text)}" } ++
      subRegistry.toSeq.sortBy(_._1).map { case (_, s) =>
        s"sub\t${enc(s.db)}\t-\t${enc(renderSub(s))}" } ++
      dsRegistry.toSeq.sortBy(_._1).map { case ((db, rp), p) =>
        s"ds\t${enc(db)}\t-\t${enc(renderDs(rp, p))}" } ++
      mstSchemas.toSeq.sortBy(_._1).map { case ((db, _), sc) =>
        s"mst\t${enc(db)}\t-\t${enc(renderMst(sc))}" }
    val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes(UTF_8))
    java.nio.file.Files.move(tmp, f,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- registration (shared by the /query dispatch and DDL restore)
  private def registerCq(db: String, text: String): Unit = {
    val cq = graft.streaming.StreamDDL.parse(text)
    val d = cq.onDb.getOrElse(db)
    if (!databases.contains(d)) sys.error(s"database not found: $d")
    cqRegistry = cqRegistry + ((d, cq.name) -> CqEntry(cq, text, -1L))
  }
  private def registerStream(db: String, text: String,
                             flushed: Long): Unit = {
    val st = graft.streaming.StreamDDL.parse(text)
    if (streamRegistry.contains((db, st.name)))
      sys.error(s"stream already exists: ${st.name}")
    streamRegistry = streamRegistry +
      ((db, st.name) -> StreamEntry(st, text, flushed))
  }
  private def registerSub(fallbackDb: String, text: String): Unit = {
    val s = graft.streaming.StreamDDL.parseSubscription(text)
    if (!databases.contains(s.db)) sys.error(s"database not found: ${s.db}")
    if (!retention.getOrElse(s.db, Retention.autogen).contains(s.rp))
      sys.error(s"retention policy not found: ${s.rp}")
    if (subRegistry.contains((s.db, s.rp, s.name)))
      sys.error("subscription already exists")
    subRegistry = subRegistry + ((s.db, s.rp, s.name) -> s)
  }
  private def registerDs(fallbackDb: String, text: String): Unit = {
    val p0 = DownSample.parseCreate(text)
    val db = p0.db.getOrElse(fallbackDb)
    if (!databases.contains(db)) sys.error(s"database not found: $db")
    val rp = retention.getOrElse(db, Retention.autogen).getOrElse(p0.rp,
      sys.error(s"retention policy not found: ${p0.rp}"))
    val p = DownSample.validate(p0, rp.shardGroupS)
    if (dsRegistry.contains((db, p.rp)))
      sys.error("downsample policy exists")
    dsRegistry = dsRegistry + ((db, p.rp) -> p)
  }
  private def registerMst(fallbackDb: String, text: String): Unit = {
    val sc = MeasurementDDL.parseCreate(text)
    val db = sc.db.getOrElse(fallbackDb)
    if (!databases.contains(db)) sys.error(s"database not found: $db")
    if (db == defaultDb) defaultDbTouched = true
    if (mstSchemas.contains((db, sc.name))) {
      // a bare re-CREATE is idempotent (MeasurementCommands "retry
      // create measurement cpu" → success); one carrying options is a
      // STATEMENT-level conflict (the WITH SHARDKEY retry exp carries
      // the error inside the result object)
      val bare = sc.tags.isEmpty && sc.fields.isEmpty &&
        sc.shardKey.isEmpty && sc.indexes.isEmpty &&
        sc.primaryKey.isEmpty && sc.sortKey.isEmpty
      if (bare) return
      throw new InfluxQL.StatementError("measurement already exists")
    }
    mstSchemas = mstSchemas + ((db, sc.name) -> sc)
    if (!sliceOf(catalog, db).contains(sc.name)) {
      import org.apache.spark.sql.types._
      val cols = Seq(StructField("time", LongType),
          StructField("ts", TimestampType)) ++
        sc.tags.map(t => StructField(t, StringType)) ++
        sc.fields.map { case (n, t) => StructField(n, t match {
          case "int64" => LongType
          case "float64" => DoubleType
          case "bool" => BooleanType
          case _ => StringType
        }) }
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(cols))
      catalog = catalog + (dbKey(db, sc.name) ->
        InfluxQL.Measurement(empty, sc.tags, "ts"))
    }
  }

  /** Derived shard-group view of a database: the day-partitioned parquet
    * dirs ARE the storage's shard groups here, so the metadata surface
    * derives groups from where data actually exists — one group per
    * occupied `shardGroupDuration` window of the default RP, exactly how
    * the reference creates groups lazily on write (`meta/data.go`
    * CreateShardGroup) and lists only non-deleted ones
    * (`data.go:1974/2015`). The group index doubles as the (stable,
    * deterministic) id, so DROP SHARD can name a group across restarts
    * without a persisted counter. */
  private def shardGroupsOf(db: String)
      : Seq[(String, Long, Long, Long, Long)] =
    shardGroupsIn(db, sliceOf(catalog, db))

  /** Tier of a shard group from the default RP's HOT/WARM bounds —
    * hot within hotS, warm past it, cold past warmS (util.Hot/Warm/
    * Cold tiers the hierarchical service moves between). */
  private def tierOf(db: String, endMs: Long, nowMs: Long): String = {
    val rps = retention.getOrElse(db, Retention.autogen)
    val rp = rps.find(_._2.default).map(_._2).getOrElse(rps.head._2)
    if (rp.warmS > 0 && endMs < nowMs - rp.warmS * 1000L) "cold"
    else if (rp.hotS > 0 && endMs < nowMs - rp.hotS * 1000L) "warm"
    else "hot"
  }

  private def shardGroupsIn(db: String,
      slice: Map[String, InfluxQL.Measurement])
      : Seq[(String, Long, Long, Long, Long)] = {
    import org.apache.spark.sql.functions.{col, unix_millis}
    val rps = retention.getOrElse(db, Retention.autogen)
    val (rpName, rp) = rps.find(_._2.default).getOrElse(rps.head)
    val groupMs = math.max(1L, rp.shardGroupS * 1000L)
    val groups = slice.values.flatMap { m =>
      m.df.select((unix_millis(col(m.time)) / groupMs).cast("long").as("g"))
        .distinct().limit(10000).collect().map(_.getLong(0))
    }.toSet.toSeq.sorted
    groups.map { g =>
      val s = g * groupMs
      (rpName, g, s, s + groupMs, s + groupMs + rp.durationS * 1000L)
    }
  }

  /** Pure DROP SHARD application over a single-db slice (data.go:2271
    * DropShard): the filtered slice, or None when no group has id `sid`.
    * Group ids are absolute window numbers (start/groupDuration), so a
    * journaled drop replays onto the same window after a restart. */
  private def dropShardSlice(db: String, sid: Long,
      slice: Map[String, InfluxQL.Measurement])
      : Option[Map[String, InfluxQL.Measurement]] = {
    import org.apache.spark.sql.functions.{col, unix_millis}
    shardGroupsIn(db, slice).find(_._2 == sid).map { case (_, _, s0, e0, _) =>
      slice.map { case (mst, m) =>
        mst -> m.copy(df = m.df.filter(
          unix_millis(col(m.time)) < s0 ||
            unix_millis(col(m.time)) >= e0))
      }
    }
  }

  private def dropShardData(db: String, sid: Long): Boolean =
    dropShardSlice(db, sid, sliceOf(catalog, db)) match {
      case None => false
      case Some(upd) =>
        catalog = catalog ++ upd.map { case (k, m) => dbKey(db, k) -> m }
        true
    }

  private def rfc3339(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  /** One stream sweep at `nowMs`: flush every window that closed at least
    * DELAY ago and hasn't been flushed, appending the windowed
    * aggregation of the landed rows to the target measurement. Windows
    * flush exactly once (per-stream high-water mark); rows arriving
    * after their window's flush are dropped by construction — the
    * reference's stream semantics, where DELAY is the late-data budget
    * (`app/ts-store/stream/time_task.go` window caches). Returns the
    * number of streams that flushed. */
  def runStreams(nowMs: Long): Int = synchronized {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    var ran = 0
    streamRegistry.foreach { case ((db, name), e) =>
      val st = e.stmt
      val bucketMs = math.max(1L, st.intervalNs / 1000000L)
      val delayMs = st.delayNs / 1000000L
      val bound = Math.floorDiv(nowMs - delayMs, bucketMs) * bucketMs
      val cat = sliceOf(catalog, db)
      if (bound > e.flushedUpToMs && cat.contains(st.from)) {
        val callsSql = st.calls
          .map { case (fn, f) => s"$fn($f)" }.mkString(", ")
        val groupBy = (Seq(s"time(${bucketMs}ms)") ++ st.tags)
          .mkString(", ")
        val lower =
          if (e.flushedUpToMs == Long.MinValue) ""
          else s"time >= ${e.flushedUpToMs}000000 AND "
        val sql = s"SELECT $callsSql FROM ${st.from} " +
          s"WHERE ${lower}time < ${bound}000000 GROUP BY $groupBy"
        val res = InfluxQL.execute(cat, sql)
          .withColumn("__ts", timestamp_millis(col("time")))
        if (!res.isEmpty) {
          val merged = cat.get(st.target) match {
            case Some(old) => InfluxQL.Measurement(
              old.df.unionByName(res, allowMissingColumns = true),
              st.tags, old.time)
            case None => InfluxQL.Measurement(res, st.tags, "__ts")
          }
          catalog = catalog + (dbKey(db, st.target) -> merged)
          // flushed windows are durable like any write: the mark below
          // journals flushed-once, so losing the rows would be data loss
          persistBatch(dbKey(db, st.target),
            res.withColumnRenamed("__ts", "ts"), st.tags)
          ran += 1
        }
        streamRegistry = streamRegistry +
          ((db, name) -> e.copy(flushedUpToMs = bound))
        // journal the advanced mark: flushed-once must hold across a
        // restart (replaying a flushed window would duplicate appends)
        persistDdl()
      }
    }
    ran
  }

  /** One downsample sweep at `nowMs`: for every policy and measurement of
    * its database, roll each tier forward to its bucket-aligned cutoff
    * (`now − sampleInterval(i)` floored to timeInterval(i)), ascending so
    * tier i's input is uniformly tier i−1 (nested, aligned buckets —
    * DownSample.rollTier doc), then drop rows older than DURATION (the
    * policy's retention side). Idempotent between data/clock advances:
    * the per-tier marks skip tiers whose cutoff hasn't moved. Returns the
    * number of (measurement, tier) rollups executed. */
  def runDownSamples(nowMs: Long): Int = synchronized {
    import org.apache.spark.sql.functions.{col, unix_millis}
    var ran = 0
    dsRegistry.foreach { case ((db, _), pol) =>
      sliceOf(catalog, db).foreach { case (mst, m) =>
        var df = m.df
        var changed = false
        for (i <- 1 to pol.sampleS.length) {
          val bucketMs = pol.timeS(i - 1) * 1000L
          val cutoff = Math.floorDiv(
            nowMs - pol.sampleS(i - 1) * 1000L, bucketMs) * bucketMs
          val mark = dsMarks.getOrElse((db, mst, i), Long.MinValue)
          if (cutoff > mark) {
            df = DownSample.rollTier(df, m.time, m.tags, pol, i, cutoff)
            dsMarks = dsMarks + ((db, mst, i) -> cutoff)
            changed = true
            ran += 1
          }
        }
        if (changed) {
          val kept = df.filter(
            unix_millis(col(m.time)) >= nowMs - pol.durationS * 1000L)
          catalog = catalog + (dbKey(db, mst) -> m.copy(df = kept))
        }
      }
    }
    ran
  }

  private def dbKey(db: String, name: String): String =
    if (db == defaultDb) name else db + "\u0000" + name

  private def sliceOf(cat: Map[String, InfluxQL.Measurement],
                      db: String): Map[String, InfluxQL.Measurement] =
    if (db == defaultDb) cat.filter(!_._1.contains('\u0000'))
    else {
      val pre = db + "\u0000"
      cat.collect { case (k, m) if k.startsWith(pre) =>
        k.substring(pre.length) -> m }
    }

  /** A per-request single-database view over the namespaced registry:
    * iteration (SHOW MEASUREMENTS/SERIES/…) sees only the request
    * database's bare names, while `get` additionally resolves
    * `rp.m` / `db.rp.m` / `db..m` qualified spellings
    * (`influxql.Measurement{Database, RetentionPolicy, Name}`) — the
    * only retention policy is `autogen`, and a cross-database ref
    * resolves ONLY when the principal may read that database, so
    * qualified spellings cannot bypass authorization. */
  private final class CatalogView(
      base: Map[String, InfluxQL.Measurement],
      resolve: String => Option[InfluxQL.Measurement])
      extends scala.collection.immutable.AbstractMap[
        String, InfluxQL.Measurement] with InfluxQL.QualifiedResolver {
    override def get(k: String): Option[InfluxQL.Measurement] =
      base.get(k).orElse(resolve(k))
    override def iterator: Iterator[(String, InfluxQL.Measurement)] =
      base.iterator
    // mutation keeps the VIEW: a CTE registered mid-statement must not
    // strip qualified `db.rp.m` resolution from the catalog
    // (Push_Down_Rule_Incondition `WITH t1 AS (GRAPH …) … FROM
    // db0.rp0.alarm_table`)
    override def removed(k: String): Map[String, InfluxQL.Measurement] =
      new CatalogView(base - k, resolve)
    override def updated[V1 >: InfluxQL.Measurement](
        k: String, v: V1): Map[String, V1] = v match {
      case m: InfluxQL.Measurement =>
        new CatalogView(base.updated(k, m), resolve)
          .asInstanceOf[Map[String, V1]]
      case _ => base.updated(k, v)
    }
    override def size: Int = base.size
  }

  private def catalogFor(db: String, user: Option[Auth.User])
      : Map[String, InfluxQL.Measurement] = {
    val cat = catalog
    val base = sliceOf(cat, db)
    def readable(d: String) = databases.contains(d) &&
      user.forall(_.authorizeDatabase(Auth.ReadPrivilege, d))
    def rpOk(d: String, rp: String) =
      rp.isEmpty || retention.getOrElse(d, Map.empty).contains(rp)
    new CatalogView(base, name => {
      // at most db.rp.<rest> — the measurement itself may carry dots
      // (`db0.rp0."SmartServer.serverkits_mem_monitor"`)
      val parts = name.split("\\.", 3)
      // a qualified spelling with an unknown retention policy is the
      // reference's shard-mapper error, verbatim — statement-level
      def rpCheck(d: String, rp: String): Unit =
        if (!rpOk(d, rp))
          throw new InfluxQL.StatementError(
            s"retention policy not found: $rp")
      if (parts.length == 2) {
        rpCheck(db, parts(0))
        base.get(parts(1)) // rp.m within the request database
      } else if (parts.length == 3 && readable(parts(0))) {
        rpCheck(parts(0), parts(1))
        sliceOf(cat, parts(0)).get(parts(2)) // db.rp.m / db..m
      } else None
    })
  }

  /** Write a mutated single-database slice back through the prefix. */
  /** Columns a log route renders into one JSON object: when the
    * measurement's TIMESTAMP column renders under the "time" key, the
    * raw ingest-time ns `time` long is internal — emitting it too
    * would produce a duplicate key. One rule, shared by the logs,
    * consume and context renderers. */
  private def logRenderCols(cols: Seq[String], timeCol: String): Seq[String] =
    // only when the TIMESTAMP column is actually present — a projection
    // that kept the raw long but dropped the timestamp renders it as-is
    if (timeCol != "time" && cols.contains(timeCol))
      cols.filterNot(_ == "time")
    else cols

  private def applySlice(db: String,
                         before: Map[String, InfluxQL.Measurement],
                         after: Map[String, InfluxQL.Measurement]): Unit = {
    val removed = (before.keySet -- after.keySet).map(dbKey(db, _))
    catalog = (catalog -- removed) ++
      after.map { case (k, m) => dbKey(db, k) -> m }
  }

  /** DML (DELETE / DROP SERIES / DROP MEASUREMENT / DROP SHARD) changed
    * some measurement frames — propagate to every cache layer that
    * could otherwise serve the deleted rows: the range-results cache is
    * dropped wholesale, and the prom twins (metric catalog + metric
    * stores) re-point at the mutated frame / disappear with a dropped
    * measurement. Callers hold `synchronized`. */
  private def propagateDml(db: String,
                           before: Map[String, InfluxQL.Measurement],
                           after: Map[String, InfluxQL.Measurement]): Unit = {
    // null during constructor-time journal replay (the cache val
    // initializes below the restore block) — nothing cached yet anyway
    if (resultsCache != null) resultsCache.invalidateAll()
    if (db == defaultDb) {
      val dropped = before.keySet -- after.keySet
      promCat = (promCat -- dropped).map { case (m, met) =>
        after.get(m) match {
          case Some(ms) if !(met.df eq ms.df) =>
            m -> met.copy(df = ms.df, extentMs = None)
          case _ => m -> met
        }
      }
      promStores = (promStores -- dropped).map { case (s, met) =>
        after.get(s) match {
          case Some(ms) if !(met.df eq ms.df) =>
            s -> met.copy(df = ms.df, extentMs = None)
          case _ => s -> met
        }
      }
    }
  }

  // ------------------------------------------------- write durability
  // With `persistDir` set, every ingested batch (line protocol, prom
  // remote write, OTLP) ALSO appends to `$persistDir/<measurement>/`
  // as parquet, with the tag list in a sidecar — the reference's WAL →
  // TSSP durability, expressed as Spark's storage format. A fresh
  // gateway over the same dir reloads everything previously written
  // (mergeSchema absorbs later-arriving tag/field columns). Day
  // compaction of these dirs is [[graft.sources.Compaction]]'s job.
  private def persistPath(name: String) =
    persistDir.map(d => s"$d/${java.net.URLEncoder.encode(name, "UTF-8")}")

  // per-batch write-order stamp for restart read-time dedup: monotone
  // across batches AND restarts (floored at wall-clock millis)
  private val wseqGen =
    new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis())
  private def persistBatch(name: String, df: DataFrame,
                           tagKeys: Seq[String],
                           prom: Boolean = false,
                           merged: Boolean = false): Unit =
    persistPath(name).foreach { p =>
      val stamped =
        if (merged)
          df.withColumn("__wseq", org.apache.spark.sql.functions.lit(
            wseqGen.updateAndGet(v =>
              Math.max(v + 1, System.currentTimeMillis()))))
        else df
      // day-partitioned like the reference's shard groups — prunable by
      // Catalyst and compactable by [[graft.sources.Compaction]]
      stamped.withColumn("day", org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd"))
        .write.mode("append").partitionBy("day").parquet(p)
      // marker: this dir holds point-merged TS batches — a restart
      // dedups on read by __wseq (see dedupPersisted)
      if (merged) {
        val mk = java.nio.file.Paths.get(p, "_pts")
        if (!java.nio.file.Files.exists(mk))
          java.nio.file.Files.write(mk, Array.empty[Byte])
      }
      val meta = java.nio.file.Paths.get(p, "_tags.txt")
      val existing =
        if (java.nio.file.Files.exists(meta))
          new String(java.nio.file.Files.readAllBytes(meta), UTF_8)
            .split("\n").filter(_.nonEmpty).toSeq
        else Nil
      java.nio.file.Files.write(meta,
        (existing ++ tagKeys).distinct.sorted.mkString("\n").getBytes(UTF_8))
      // marker: this measurement is also a prom metric (remote write)
      if (prom)
        java.nio.file.Files.write(java.nio.file.Paths.get(p, "_prom"),
          Array.empty[Byte])
    }

  // the user catalog persists beside the data — a restarted gateway
  // with auth enabled must NOT reopen the unauthenticated bootstrap
  // window (the reference's users live in its durable meta store)
  private def usersFile =
    persistDir.map(d => java.nio.file.Paths.get(d, "_users.tsv"))
  /** Temp + ATOMIC_MOVE so a crash mid-write can never leave a
    * truncated catalog (an empty `_users.tsv` restores to ZERO users,
    * which with requireAuth silently reopens the unauthenticated
    * bootstrap window — the exact hole persistence exists to close).
    * Callers serialize the mutate+persist pair on the auth monitor, so
    * the snapshot on disk is never an out-of-order older state. */
  private def persistUsers(): Unit =
    usersFile.foreach { f =>
      val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp, auth.snapshotTsv.getBytes(UTF_8))
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  // reload persisted measurements under the in-memory/init catalog
  usersFile.filter(java.nio.file.Files.exists(_)).foreach { f =>
    auth.restoreTsv(new String(java.nio.file.Files.readAllBytes(f), UTF_8))
    // a present-but-adminless catalog with auth on means the file was
    // damaged (or bootstrap never finished): the gateway would serve
    // UNAUTHENTICATED until someone recreates the admin — say so loudly
    if (requireAuth && !auth.adminExists)
      System.err.println(
        "[gateway] WARNING: _users.tsv restored with no admin user; " +
        "requireAuth is on but the unauthenticated bootstrap window is " +
        "OPEN until an admin is created")
  }
  // the database set persists beside the data (meta store durability)
  private def dbFile =
    persistDir.map(d => java.nio.file.Paths.get(d, "_databases.txt"))
  // the logstream (log-store measurement) registry persists the same way
  private def logStoresFile =
    persistDir.map(d => java.nio.file.Paths.get(d, "_logstreams.txt"))
  private def persistLogStores(): Unit =
    logStoresFile.foreach { f =>
      val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp, logStores.toSeq.sorted
        .map(java.net.URLEncoder.encode(_, "UTF-8") + "\n")
        .mkString.getBytes(UTF_8))
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  private def persistDatabases(): Unit =
    dbFile.foreach { f =>
      val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
      val body = databases.toSeq.sorted.map { d =>
        val rps = retention.getOrElse(d, Retention.autogen).toSeq
          .sortBy(_._1).map { case (n, rp) =>
            s"${java.net.URLEncoder.encode(n, "UTF-8")}=" +
              s"${rp.durationS},${rp.shardGroupS},${rp.replicaN}," +
              s"${rp.default},${rp.hotS},${rp.warmS}"
          }.mkString(";")
        s"${java.net.URLEncoder.encode(d, "UTF-8")}\t$rps"
      }.mkString("\n")
      java.nio.file.Files.write(tmp, body.getBytes(UTF_8))
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  dbFile.filter(java.nio.file.Files.exists(_)).foreach { f =>
    // defaultDb always survives a reload: the constructor-injected
    // catalog lives there
    val lines = new String(java.nio.file.Files.readAllBytes(f), UTF_8)
      .split("\n").filter(_.nonEmpty).toSeq
    val parsed = lines.map { line =>
      val parts = line.split("\t", 2)
      val db = java.net.URLDecoder.decode(parts(0), "UTF-8")
      val rps =
        if (parts.length < 2 || parts(1).isEmpty) Retention.autogen
        else parts(1).split(";").filter(_.nonEmpty).map { kv =>
          val Array(n, v) = kv.split("=", 2)
          val fs = v.split(",")
          // hot/warm fields are round-10 additions — older files lack them
          java.net.URLDecoder.decode(n, "UTF-8") ->
            Retention.Rp(fs(0).toLong, fs(1).toLong, fs(2).toLong,
              fs(3).toBoolean,
              if (fs.length > 4) fs(4).toLong else 0L,
              if (fs.length > 5) fs(5).toLong else 0L)
        }.toMap
      db -> rps
    }
    databases = parsed.map(_._1).toSet + defaultDb
    if (parsed.exists(_._1 == defaultDb)) defaultDbTouched = true
    retention = parsed.toMap
      .updated(defaultDb, parsed.toMap.getOrElse(defaultDb,
        Retention.autogen))
  }
  // logstream registry loads BEFORE the measurement scan: the scan's
  // read-time point-dedup decision needs to know which dirs are logs
  logStoresFile.filter(java.nio.file.Files.exists(_)).foreach { f =>
    logStores = new String(java.nio.file.Files.readAllBytes(f), UTF_8)
      .split("\n").filter(_.nonEmpty)
      .map(java.net.URLDecoder.decode(_, "UTF-8")).toSet
  }
  persistDir.foreach { d =>
    val base = java.nio.file.Paths.get(d)
    if (java.nio.file.Files.isDirectory(base)) {
      val s = java.nio.file.Files.list(base)
      try s.filter(p => java.nio.file.Files.isDirectory(p) &&
          !p.getFileName.toString.startsWith("_")).forEach { p =>
        val name = java.net.URLDecoder.decode(p.getFileName.toString, "UTF-8")
        // namespaced keys re-register their database even if the
        // database file predates multi-db support
        if (name.contains('\u0000'))
          databases = databases + name.substring(0, name.indexOf('\u0000'))
        val meta = p.resolve("_tags.txt")
        val tags =
          if (java.nio.file.Files.exists(meta))
            new String(java.nio.file.Files.readAllBytes(meta), UTF_8)
              .split("\n").filter(_.nonEmpty).toSeq
          else Nil
        // cold-tier partitions (hierarchical storage sweep) union in
        val coldP = p.getParent.resolve("_cold").resolve(
          p.getFileName.toString)
        val hotDf = spark.read.option("mergeSchema", "true")
          .parquet(p.toString).drop("day")
        val raw =
          if (java.nio.file.Files.isDirectory(coldP))
            hotDf.unionByName(spark.read.option("mergeSchema", "true")
              .parquet(coldP.toString).drop("day"),
              allowMissingColumns = true)
          else hotDf
        // `_pts` dirs hold point-merged TS batches: restore point
        // identity across batches by read-time dedup (never for logs)
        val df =
          if (java.nio.file.Files.exists(p.resolve("_pts")) &&
              !logStores.contains(name))
            HttpGateway.dedupPersisted(raw, tags)
          else raw.drop("__wseq")
        // footer extent (driver metadata read): seeds the write path's
        // append-vs-merge decision and the fill-spine bounds
        val ext = try graft.sources.ParquetStats.timeExtentMsOf(raw, "ts")
                  catch { case _: Exception => None }
        catalog = catalog + (name -> (catalog.get(name) match {
          case Some(prev) => InfluxQL.Measurement(
            prev.df.unionByName(df, allowMissingColumns = true),
            (prev.tags ++ tags).distinct, prev.time)
          case None => InfluxQL.Measurement(df, tags, "ts", extentMs = ext)
        }))
        // promCat is a single namespace: a (rare) namespaced prom
        // measurement re-registers under its bare metric name
        val promName = name.substring(name.indexOf('\u0000') + 1)
        if (java.nio.file.Files.exists(p.resolve("_prom")))
          promCat = promCat + (promName -> (promCat.get(promName) match {
            case Some(prev) => prev.copy(
              df = prev.df.unionByName(df, allowMissingColumns = true),
              labels = (prev.labels ++ tags).distinct, extentMs = None)
            case None => PromQL.Metric(df, tags, "ts", "value")
          }))
        if (java.nio.file.Files.exists(p.resolve("_promstore")))
          promStores = promStores +
            (promName -> PromQL.Metric(df, tags, "ts", "value"))
      } finally s.close()
    } else java.nio.file.Files.createDirectories(base)
  }
  // Replay the DDL journal AFTER databases/RPs and measurement data
  // loaded: validation sees restored state, and a declared measurement
  // that also has persisted data keeps its data frame (registerMst only
  // installs the empty typed frame when no data exists).
  ddlFile.filter(java.nio.file.Files.exists(_)).foreach { f =>
    new String(java.nio.file.Files.readAllBytes(f), UTF_8)
      .split("\n").filter(_.nonEmpty).foreach { line =>
        val Array(kind, dbE, extra, textE) = line.split("\t", 4)
        val db = dec(dbE); val text = dec(textE)
        try kind match {
          case "cq" => registerCq(db, text)
          case "stream" => registerStream(db, text, extra.toLong)
          case "sub" => registerSub(db, text)
          case "ds" => registerDs(db, text)
          case "mst" => registerMst(db, text)
          case _ =>
        } catch { case e: Exception =>
          // one corrupt line must not block startup — skip loudly
          System.err.println(
            s"[gateway] DDL restore skipped: $line (${e.getMessage})")
        }
      }
  }
  // Replay the DML journal LAST: tombstones filter the fully-restored
  // catalog in issue order, with each statement's original now() pinned
  // so time-relative deletes remove the same rows they removed live.
  replayDmlJournal()
  fencesFile.filter(java.nio.file.Files.exists(_)).foreach { f =>
    new String(java.nio.file.Files.readAllBytes(f), UTF_8)
      .split("\n").filter(_.nonEmpty).foreach { line =>
        try {
          val Array(idE, geoE) = line.split("\t", 2)
          fences = fences + (dec(idE) -> Fence.parse(dec(idE), dec(geoE)))
        } catch { case e: Exception =>
          System.err.println(
            s"[gateway] fence restore skipped: $line (${e.getMessage})")
        }
      }
  }

  // Each write path grows its measurement by one unionByName per
  // request; left unchecked the logical plan (and every query's
  // analysis cost) grows linearly with write count. Every
  // `CompactEvery` unions the accumulated plan is truncated with an
  // eager localCheckpoint — the in-memory analogue of the /write
  // path's parquet [[graft.sources.Compaction]]. Guarded by the same
  // `synchronized` the write paths already hold.
  private val CompactEvery = 32
  private val unionDepth = scala.collection.mutable.Map.empty[String, Int]
  private def maybeCompact(key: String, df: DataFrame): DataFrame = {
    val d = unionDepth.getOrElse(key, 0) + 1
    if (d >= CompactEvery) {
      unionDepth(key) = 0
      df.localCheckpoint(true)
    } else { unionDepth(key) = d; df }
  }
  // extent-splitting PromQL range results cache (results_cache.go);
  // invalidated whenever the prom catalog changes (remote write)
  private val resultsCache =
    new ResultsCache[Sample](_.evalMs)
  // hot-reloadable per-tenant prom limits (services/runtimecfg +
  // lib/validation) — the tenant key is the metric store / mst, like
  // FilterInvalidTimeSeries(mst, …); file lives beside the data
  private val runtimeOverrides = new Validation.Overrides(
    persistDir.map(d => java.nio.file.Paths.get(d, "_runtimecfg.yaml")))

  /** handler_prom.go:99 FilterInvalidTimeSeries + servePromWriteBase's
    * partial semantics: invalid series are dropped, valid ones write,
    * and ANY invalid series turns the final status into a 400 carrying
    * the FIRST validation error (after the valid data landed). Returns
    * (valid series, first error). */
  private def filterInvalidSeries(tenant: String,
                                  series: Seq[PromRemoteWrite.Series]):
      (Seq[PromRemoteWrite.Series], Option[String]) = {
    val limits = runtimeOverrides.limitsFor(tenant)
    if (!limits.promLimitEnabled) return (series, None)
    var firstErr: Option[String] = None
    val valid = series.filter { s =>
      Validation.validateSeries(limits, s.labels,
          s.samples.map(_._1)) match {
        case Some(err) => if (firstErr.isEmpty) firstErr = Some(err); false
        case None => true
      }
    }
    (valid, firstErr)
  }
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // concurrent handlers: without an executor the JDK server serializes
  // requests on its dispatcher thread, and a KILL QUERY could never be
  // served while the query it targets is running
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())

  // ---------------------------------------------- live query registry
  // The reference's TaskManager (`query/task_manager.go:152,266`): every
  // /query request is attached under a qid for its lifetime; SHOW
  // QUERIES lists them, KILL QUERY cancels one. Cancellation rides
  // Spark's job groups — each request's Spark actions run in group
  // `query-<qid>`, and cancelJobGroup interrupts them mid-stage.
  private final class RunningQuery(val qid: Long, val query: String,
                                   val db: String, val startNs: Long) {
    @volatile var status: String = "running"
    def group: String = s"query-$qid"
  }
  private val qidCounter = new java.util.concurrent.atomic.AtomicLong(0)
  // syscontrol switches + failpoint registry (/debug/ctrl, /failpoint)
  @volatile private var writesDisabled = false
  @volatile private var readsDisabled = false
  private val failpoints =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Serving statistics, the reference's `handler` expvar module
    * (lib/statisticsPusher/statistics/handler_statistics.go — field
    * names match its `name:` tags) rendered by /debug/vars. */
  object stats {
    import java.util.concurrent.atomic.AtomicLong
    val req = new AtomicLong(0)
    val queryReq = new AtomicLong(0)
    val writeReq = new AtomicLong(0)
    val pointsWrittenOK = new AtomicLong(0)
    val write400ErrReq = new AtomicLong(0)
    val pingReq = new AtomicLong(0)
    val statusReq = new AtomicLong(0)
    val authFail = new AtomicLong(0)
    val clientError = new AtomicLong(0)
    val serverError = new AtomicLong(0)
    val queryReqDurationNs = new AtomicLong(0)
    val writeReqDurationNs = new AtomicLong(0)
    def renderJson: String = {
      val rt = Runtime.getRuntime
      val (hits, evals) = resultsCache.stats
      "{\"handler\":{" +
        "\"req\":" + req.get + ",\"queryReq\":" + queryReq.get +
        ",\"writeReq\":" + writeReq.get +
        ",\"pointsWrittenOK\":" + pointsWrittenOK.get +
        ",\"write400ErrReq\":" + write400ErrReq.get +
        ",\"pingReq\":" + pingReq.get +
        ",\"statusReq\":" + statusReq.get +
        ",\"authFail\":" + authFail.get +
        ",\"clientError\":" + clientError.get +
        ",\"serverError\":" + serverError.get +
        ",\"queryReqDurationNs\":" + queryReqDurationNs.get +
        ",\"writeReqDurationNs\":" + writeReqDurationNs.get +
        "},\"resultsCache\":{\"hits\":" + hits +
        ",\"evals\":" + evals +
        "},\"runtime\":{\"totalMemory\":" + rt.totalMemory +
        ",\"freeMemory\":" + rt.freeMemory +
        ",\"availableProcessors\":" + rt.availableProcessors + "}}"
    }
  }
  private val running =
    scala.collection.mutable.LinkedHashMap.empty[Long, RunningQuery]

  private def attachQuery(q: String, db: String): RunningQuery = {
    val rq = new RunningQuery(qidCounter.incrementAndGet(), q, db,
      System.nanoTime())
    running.synchronized { running(rq.qid) = rq }
    spark.sparkContext.setJobGroup(rq.group, q, interruptOnCancel = true)
    rq
  }

  private def detachQuery(rq: RunningQuery): Unit = {
    spark.sparkContext.clearJobGroup()
    running.synchronized { running.remove(rq.qid) }
  }

  /** `task_manager.go:266` KillQuery: error on unknown qid, else cancel
    * the query's job group and mark it killed. */
  private def killQuery(qid: Long): Unit = {
    val rq = running.synchronized(running.get(qid))
      .getOrElse(sys.error(s"no such query id: $qid"))
    rq.status = "killed"
    spark.sparkContext.cancelJobGroup(rq.group)
  }

  /** Go-style duration rendering for SHOW QUERIES (second/ms/µs
    * truncation per `task_manager.go:161-169`). */
  private def fmtDur(ns: Long): String =
    if (ns >= 1000000000L) s"${ns / 1000000000L}s"
    else if (ns >= 1000000L) s"${ns / 1000000L}ms"
    else s"${ns / 1000L}µs"

  server.createContext("/ping", (ex: HttpExchange) => {
    stats.pingReq.incrementAndGet(); stats.req.incrementAndGet()
    ex.getResponseHeaders.set("X-Gemini-Compat", "graft")
    ex.sendResponseHeaders(204, -1); ex.close()
  })
  // deprecated alias for /ping (handler.go:1711 serveStatus)
  server.createContext("/status", (ex: HttpExchange) => {
    stats.statusReq.incrementAndGet(); stats.req.incrementAndGet()
    ex.sendResponseHeaders(204, -1); ex.close()
  })
  // GET /metrics (handler.go:329 serveMetrics): Prometheus text
  // exposition of the serving counters. The reference mounts promhttp
  // over its statistics collectors and — like /ping — does NOT require
  // auth on this route (route table auth flag false); the counter set
  // here is the same handler-module set /debug/vars renders as JSON.
  server.createContext("/metrics", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "GET")
      respond(ex, 405, "{\"error\":\"invalid method\"}")
    else {
      val rt = Runtime.getRuntime
      val (hits, evals) = resultsCache.stats
      val counters = Seq(
        "handler_req_total" -> stats.req.get,
        "handler_query_req_total" -> stats.queryReq.get,
        "handler_write_req_total" -> stats.writeReq.get,
        "handler_points_written_ok_total" -> stats.pointsWrittenOK.get,
        "handler_write_400_err_req_total" -> stats.write400ErrReq.get,
        "handler_ping_req_total" -> stats.pingReq.get,
        "handler_status_req_total" -> stats.statusReq.get,
        "handler_auth_fail_total" -> stats.authFail.get,
        "handler_client_error_total" -> stats.clientError.get,
        "handler_server_error_total" -> stats.serverError.get,
        "handler_query_req_duration_ns_total" ->
          stats.queryReqDurationNs.get,
        "handler_write_req_duration_ns_total" ->
          stats.writeReqDurationNs.get,
        "results_cache_hits_total" -> hits,
        "results_cache_evals_total" -> evals)
      val gauges = Seq(
        "runtime_total_memory_bytes" -> rt.totalMemory,
        "runtime_free_memory_bytes" -> rt.freeMemory,
        "runtime_available_processors" -> rt.availableProcessors.toLong)
      val body = new StringBuilder
      counters.foreach { case (n, v) =>
        body.append(s"# TYPE graft_$n counter\n")
        body.append(s"graft_$n $v\n")
      }
      gauges.foreach { case (n, v) =>
        body.append(s"# TYPE graft_$n gauge\n")
        body.append(s"graft_$n $v\n")
      }
      ex.getResponseHeaders.set("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      val bytes = body.toString.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    }
  })
  // internal serving metrics in /debug/vars format (handler.go:1806
  // serveExpvar; module/field names per handler_statistics.go)
  server.createContext("/debug/vars", (ex: HttpExchange) =>
    if (adminGuard(ex, params(ex, readBody = false)))
      respond(ex, 200, stats.renderJson))
  // /debug/query?mod=shards&db=… (syscontrol.go:15 serveDebugQuery):
  // GET-only (405), empty/unknown mod is a 400, mod=shards returns the
  // db's derived shard-group status
  server.createContext("/debug/query", (ex: HttpExchange) => {
    val p = params(ex, readBody = false)
    if (!adminGuard(ex, p)) ()
    else if (ex.getRequestMethod != "GET")
      respond(ex, 405, "{\"error\":\"invalid method\"}")
    else p.get("mod") match {
      case None | Some("") =>
        respond(ex, 400, "{\"error\":\"invalid mod\"}")
      case Some("shards") =>
        val db = p.getOrElse("db", defaultDb)
        val rows = shardGroupsOf(db).map { case (rp, g, s0, e0, x0) =>
          "{\"id\":" + g + ",\"rp\":" + jsonStr(rp) +
            ",\"start\":" + jsonStr(rfc3339(s0)) +
            ",\"end\":" + jsonStr(rfc3339(e0)) +
            ",\"expiry\":" + jsonStr(rfc3339(x0)) + "}"
        }
        respond(ex, 200, "{\"db\":" + jsonStr(db) +
          ",\"shards\":[" + rows.mkString(",") + "]}")
      case Some(m) =>
        respond(ex, 400, "{\"error\":\"process query request error: " +
          "unknown mod: " + m + "\"}")
    }
  })
  // POST /debug/ctrl?mod=…&switchon=… (handler.go:462 serveSysCtrl →
  // syscontrol.go:53 serveDebug): admin-only runtime toggles. The mods
  // that map to real switches in this engine flip them (disableWrite /
  // disableRead gate the write/read paths); the remaining documented
  // syscontrol mods are accepted as no-ops on a single-node Spark
  // engine (their effect is a store/cluster knob we don't have);
  // unknown mods are the reference's "unknown sysctrl mod" 400.
  server.createContext("/debug/ctrl", (ex: HttpExchange) => {
    val p = params(ex, readBody = false)
    if (!adminGuard(ex, p)) ()
    else if (ex.getRequestMethod != "POST")
      respond(ex, 405, "{\"error\":\"invalid method\"}")
    else p.get("mod") match {
      case None | Some("") =>
        respond(ex, 400, "{\"error\":\"invalid mod\"}")
      case Some(mod) =>
        val on = p.get("switchon").exists(_.equalsIgnoreCase("true"))
        val known = Set("flush", "compen", "merge", "snapshot",
          "downsample_in_order", "verifynode", "memusagelimit",
          "backgroundReadLimiter", "readonly", "chunk_reader_parallel",
          "binary_tree_merge", "print_logical_plan",
          "sliding_window_push_up", "log_rows", "force_broadcast_query",
          "time_filter_protection", "interruptquery", "uppermemusepct",
          "parallelbatch", "write_stream_points_enable")
        mod match {
          case "disablewrite" =>
            writesDisabled = on
            respond(ex, 200, "{\n\t\"success\"\n}\n")
          case "disableread" =>
            readsDisabled = on
            respond(ex, 200, "{\n\t\"success\"\n}\n")
          case m if known.contains(m) =>
            respond(ex, 200, "{\n\t\"success\"\n}\n")
          case m => respond(ex, 400,
            s"""{"error":"sysctrl execute error: unknown sysctrl mod: $m"}""")
        }
    }
  })
  // POST /failpoint?point=…&flag=enable|disable (handler.go:1717
  // failPoint): a fault-injection registry for tests. Enabled points
  // carry their `term`; the wired point `graft/query-error` makes
  // /query fail with the term as the error. DIVERGENCE: the reference
  // route is unauthenticated but only exists in failpoint test builds;
  // here the registry is always live, so the route requires admin —
  // an anonymous enable would be a one-request denial of service.
  server.createContext("/failpoint", (ex: HttpExchange) => {
    val p = params(ex, readBody = true)
    if (!adminGuard(ex, p)) ()
    else if (ex.getRequestMethod != "POST")
      respond(ex, 405, "{\"error\":\"invalid method\"}")
    else (p.get("point").filter(_.nonEmpty), p.getOrElse("flag", "")) match {
      case (Some(pt), "enable") =>
        failpoints.put(pt, p.getOrElse("term", "injected"))
        respond(ex, 200, "{\n\t\"success\"\n}\n")
      case (Some(pt), "disable") =>
        failpoints.remove(pt)
        respond(ex, 200, "{\n\t\"success\"\n}\n")
      case _ => respond(ex, 400, "{\"error\":\"invalid failpoint\"}")
    }
  })
  // backup service routes (handler.go:466-474 → syscontrol Backup/
  // AbortBackup/BackupStatus, lib/backup/backup.go): POST-only; run
  // copies the persisted store to backupPath/data_backup on its own
  // thread (isInc=true = manifest-diff incremental), status polls the
  // job, abort stops it between files
  @volatile private var backupJob: Option[Backup.Job] = None
  server.createContext("/backup/run", (ex: HttpExchange) => {
    val p = params(ex, readBody = false)
    if (!adminGuard(ex, p)) ()
    else if (ex.getRequestMethod != "POST")
      respond(ex, 405, "{\"error\":\"invalid method\"}")
    else if (persistDir.isEmpty)
      respond(ex, 400,
        "{\"error\":\"backup execute error: no persisted store\"}")
    else p.get("backupPath").filter(_.nonEmpty) match {
      case None => respond(ex, 400,
        "{\"error\":\"backup execute error: backupPath required\"}")
      case Some(bp) => synchronized {
        if (backupJob.exists(_.status == "running"))
          respond(ex, 400,
            "{\"error\":\"backup execute error: backup already running\"}")
        else {
          val job = new Backup.Job(bp, p.get("isInc").contains("true"))
          backupJob = Some(job)
          val t = new Thread(() => Backup.run(persistDir.get, job),
            "graft-backup")
          t.setDaemon(true); t.start()
          respond(ex, 200, "{\"status\":\"started\",\"backupPath\":" +
            jsonStr(bp) + "}")
        }
      }
    }
  })
  server.createContext("/backup/status", (ex: HttpExchange) =>
    if (!adminGuard(ex, params(ex, readBody = false))) ()
    else if (ex.getRequestMethod != "POST")
      respond(ex, 405, "{\"error\":\"invalid method\"}")
    else respond(ex, 200, backupJob.map(_.renderJson)
      .getOrElse("{\"status\":\"idle\"}")))
  server.createContext("/backup/abort", (ex: HttpExchange) =>
    if (!adminGuard(ex, params(ex, readBody = false))) ()
    else if (ex.getRequestMethod != "POST")
      respond(ex, 405, "{\"error\":\"invalid method\"}")
    else backupJob match {
      case Some(j) if j.status == "running" =>
        j.abort.set(true)
        respond(ex, 200, "{\"status\":\"aborting\"}")
      case _ => respond(ex, 400,
        "{\"error\":\"backup execute error: no backup running\"}")
    })
  // fence routes (handler.go:288,292 → handler_fence.go): GET
  // match_batch takes a JSON float array [lat,lon,…] and answers the
  // BatchFenceMatchResponse shape; POST delete_fence removes by id
  server.createContext("/fence/match_batch", (ex: HttpExchange) => {
    val p = params(ex, readBody = false)
    if (guard(ex, p, Auth.WritePrivilege, "write").isDefined) {
    val pts = p.getOrElse("points", "")
    val parsed: Option[Seq[Double]] =
      try {
        val t = pts.trim
        if (!t.startsWith("[") || !t.endsWith("]")) None
        else {
          val inner = t.substring(1, t.length - 1).trim
          if (inner.isEmpty) Some(Nil)
          else Some(inner.split(",").toSeq.map(_.trim.toDouble))
        }
      } catch { case _: Exception => None }
    parsed.filter(_.size % 2 == 0) match {
      case None =>
        respond(ex, 200,
          "{\"code\":-1,\"error\":\"invalid points\",\"result\":null}")
      case Some(flat) =>
        val fs = fences.values.toSeq
        val results = flat.grouped(2).zipWithIndex.map { case (pt, i) =>
          val ids = fs.filter(_.contains(pt(0), pt(1))).map(_.id).sorted
          val fid =
            if (ids.isEmpty) "null"
            else ids.map(jsonStr).mkString("[", ",", "]")
          "{\"seq\":" + i + ",\"fence_id\":" + fid + "}"
        }.mkString(",")
        respond(ex, 200,
          "{\"code\":0,\"error\":\"\",\"result\":[" + results + "]}")
    }
    }
  })
  server.createContext("/fence/delete_fence", (ex: HttpExchange) => {
    val p = params(ex, readBody = false)
    if (guard(ex, p, Auth.WritePrivilege, "write").isDefined) {
    val id = p.getOrElse("fenceId", "")
    synchronized {
      if (fences.contains(id)) {
        fences = fences - id
        persistFences()
        respond(ex, 200, "{\"code\":0,\"error\":\"\",\"result\":null}")
      } else respond(ex, 200,
        "{\"code\":-1,\"error\":\"remove fence file err\",\"result\":null}")
    }
    }
  })
  // Flux is not served, exactly like a default-config reference node
  // (handler.go:240 AddFluxAPIRoute with FluxEnabled=false → 403)
  // POST /api/v1/tsdb/{tsdb} (handler.go:393 servePromCreateTSDB):
  // creates a metric-store namespace ahead of writes. Name rules are
  // the reference's (meta ValidMeasurementName: printable, none of
  // `,;/\`, not "." or ".."); the optional OBS-options body is
  // storage-backend config with no analogue here (persistDir IS the
  // store) — accepted and ignored. Registers an empty store frame so
  // the scoped query routes answer empty-success immediately.
  server.createContext("/api/v1/tsdb/", (ex: HttpExchange) => {
    val name = decode(ex.getRequestURI.getPath.stripPrefix("/api/v1/tsdb/"))
    if (guardDb(ex, params(ex, readBody = false), Auth.WritePrivilege,
        "write", name).isEmpty) ()
    else if (ex.getRequestMethod != "POST")
      respond(ex, 405, "{\"error\":\"invalid method\"}")
    else if (name.isEmpty)
      respond(ex, 400, "{\"error\":\"tsdb name should not be none\"}")
    else if (name == "." || name == ".." ||
        name.exists(c => ",;/\\".contains(c) || !(c >= ' ')))
      respond(ex, 400, "{\"error\":\"invalid tsdb name\"}")
    else {
      synchronized {
        if (!promStores.contains(name)) {
          import org.apache.spark.sql.types._
          val empty = spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            StructType(Seq(StructField("__name__", StringType),
              StructField("value", DoubleType),
              StructField("ts", TimestampType))))
          promStores = promStores +
            (name -> PromQL.Metric(empty, Seq("__name__"), "ts", "value"))
        }
      }
      respond(ex, 200, "")
    }
  })
  // metric-store-scoped prom API (handler.go:397-433,
  // /prometheus/{metric_store}/api/v1/*): the store is one measurement
  // holding all its series (__name__ as a label). read/series remain on
  // the default-namespace routes — store queries address the mst.
  server.createContext("/prometheus", (ex: HttpExchange) => {
    val parts = ex.getRequestURI.getPath
      .stripPrefix("/prometheus/").split("/").toList
    parts match {
      case store :: "api" :: "v1" :: rest if store.nonEmpty =>
        rest match {
          case List("write") => handlePromStoreWrite(ex, store)
          case List("query") | List("query_range") =>
            val range = rest == List("query_range")
            promStores.get(store) match {
              case Some(m) => handleProm(ex, range,
                () => new StoreCatView(m), s"store:$store|",
                tenant = store)
              case None =>
                val rt = if (range) "matrix" else "vector"
                respond(ex, 200, "{\"status\":\"success\",\"data\":" +
                  "{\"resultType\":\"" + rt + "\",\"result\":[]}}")
            }
          case List("labels") =>
            if (guardDb(ex, params(ex, readBody = false),
                Auth.ReadPrivilege, "read", store).isDefined) {
              val names = promStores.get(store)
                .map(_.labels.sorted).getOrElse(Nil)
              respond(ex, 200, "{\"status\":\"success\",\"data\":[" +
                names.map(jsonStr).mkString(",") + "]}")
            }
          case List("label", label, "values") =>
            if (guardDb(ex, params(ex, readBody = false),
                Auth.ReadPrivilege, "read", store).isDefined) {
              val vals = promStores.get(store).toSeq.flatMap { m =>
                if (!m.df.columns.contains(label)) Nil
                else m.df.select(label).distinct().orderBy(label)
                  .limit(1000).collect()
                  .flatMap(r => Option(r.getString(0))).toSeq
              }
              respond(ex, 200, "{\"status\":\"success\",\"data\":[" +
                vals.map(jsonStr).mkString(",") + "]}")
            }
          case _ => respond(ex, 404, "{\"error\":\"not found\"}")
        }
      case _ =>
        // empty {metric_store}: the reference's InvalidPromMstName 404
        respond(ex, 404, "{\"error\":\"invalid the metric store\"}")
    }
  })
  server.createContext("/api/v2/query", (ex: HttpExchange) =>
    respond(ex, 403, "{\"error\":\"Flux query service disabled. " +
      "Verify flux-enabled=true in the [http] section of the InfluxDB " +
      "config.\"}"))
  server.createContext("/query", (ex: HttpExchange) => handleQuery(ex))
  server.createContext("/write", (ex: HttpExchange) => handleWrite(ex))
  // influxdb-2.x write compat (handler.go:1470 serveWriteV2): the v2
  // `bucket` maps onto the v1 database[/rp]; body and precision are the
  // same line protocol
  server.createContext("/api/v2/write",
    (ex: HttpExchange) => handleWrite(ex, v2 = true))
  server.createContext("/api/v1/query_range",
    (ex: HttpExchange) => handleProm(ex, range = true))
  server.createContext("/api/v1/query",
    (ex: HttpExchange) => handleProm(ex, range = false))
  server.createContext("/api/v1/labels",
    (ex: HttpExchange) => handleLabels(ex))
  server.createContext("/api/v1/label/",
    (ex: HttpExchange) => handleLabelValues(ex))
  server.createContext("/api/v1/series",
    (ex: HttpExchange) => handleSeries(ex))
  // Prometheus remote write — the reference serves it at both
  // `/api/v1/write` (handler.go:333) and `/api/v1/prom/write`
  // (handler.go:637)
  server.createContext("/api/v1/write",
    (ex: HttpExchange) => handlePromWrite(ex))
  server.createContext("/api/v1/prom/write",
    (ex: HttpExchange) => handlePromWrite(ex))
  server.createContext("/api/v1/read",
    (ex: HttpExchange) => handlePromRead(ex))
  // the reference also serves the PromQL evaluator at /api/v1/prom/query
  // (handler.go:633 route table) — same handler, second mount
  server.createContext("/api/v1/prom/query_range",
    (ex: HttpExchange) => handleProm(ex, range = true))
  server.createContext("/api/v1/prom/query",
    (ex: HttpExchange) => handleProm(ex, range = false))
  // Logkeeper CRUD (handler.go:483-512, handler_logstore.go): a
  // REPOSITORY is a database and a LOGSTREAM is a measurement in it —
  // the thin mapping the reference's own handlers perform against the
  // meta client. Log INGEST rides the ordinary paths (/write?db=repo
  // line protocol; OTLP logs land in the `logs` measurement).
  server.createContext("/api/v1/repository",
    (ex: HttpExchange) => handleRepository(ex))
  server.createContext("/api/v1/logstream",
    (ex: HttpExchange) => handleLogstream(ex))
  // Logkeeper pipe-syntax query surface (handler.go:532-560 route table):
  // /repo/{repository}/logstreams/{logStream}/{logs|histogram|analytics},
  // the `content:err | EXTRACT … | stats` language of logparser/sql.y
  // compiled by [[graft.query.LogPipe]] onto the measurement frame.
  server.createContext("/repo",
    (ex: HttpExchange) => handleLogQueryRoutes(ex))
  // OTLP metrics remote write (handler.go:316, handler_otlp.go:109)
  server.createContext("/api/v1/arrow/doput",
    (ex: HttpExchange) => handleArrowDoPut(ex))
  server.createContext("/api/v1/arrow/doget",
    (ex: HttpExchange) => handleArrowDoGet(ex))
  server.createContext("/api/v1/otlp/metrics",
    (ex: HttpExchange) => handleOtlpWrite(ex))
  // OTLP logs remote write (handler.go:320 -> the `logs` measurement)
  server.createContext("/api/v1/otlp/logs",
    (ex: HttpExchange) => handleOtlpLogs(ex))
  // OTLP traces remote write (handler.go:312 -> the `spans` measurement)
  server.createContext("/api/v1/otlp/traces",
    (ex: HttpExchange) => handleOtlpTraces(ex))
  // Prom metric metadata (handler.go:385 servePromQueryMetaData):
  // every known metric reported untyped with empty help/unit — the
  // engine's catalog carries no HELP/TYPE declarations
  server.createContext("/api/v1/metadata", (ex: HttpExchange) => {
    if (guard(ex, params(ex, readBody = false),
        Auth.ReadPrivilege, "read from").nonEmpty) {
      val entries = promCat.keys.toSeq.sorted.map(m =>
        s"${jsonStr(m)}:[{\"type\":\"unknown\",\"help\":\"\",\"unit\":\"\"}]")
      respond(ex, 200, s"""{"status":"success","data":{${entries.mkString(",")}}}""")
    }
  })
  // Grafana probes buildinfo on datasource connect and falls back to
  // legacy behavior on 404 — answer with a prom-compatible version body
  server.createContext("/api/v1/status/buildinfo", (ex: HttpExchange) => {
    val body = """{"status":"success","data":{"version":"2.45.0",""" +
      """"application":"graft","features":{}}}"""
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes); ex.close()
  })

  def start(): Int = { server.start(); boundPort }
  def stop(): Unit = {
    if (kafka != null) kafka.stop()
    server.stop(0)
  }
  def boundPort: Int = server.getAddress.getPort

  @volatile private var kafka: KafkaConsume = _

  /** Start the Kafka wire-protocol consume listener (reference:
    * `services/consume/` — a separate TCP service sharing the engine).
    * The fetch topic is an InfluxQL query compiled against the default
    * database's live catalog (`processor.go:56-66` resolves the
    * measurement from the query's FROM), row-capped like every other
    * serving surface. Each Fetch message's payload is the reference's
    * `lib/record` columnar ConsumeRecord codec ([[RecordCodec]]) — one
    * record batch per series, tag columns as Tags, fields sorted by
    * name with epoch-ns time last — so a consumer built against the
    * reference's payload decoder parses ours unchanged. Returns the
    * bound port. */
  def startKafkaConsume(port: Int = 0): Int = {
    if (kafka != null) kafka.stop() // re-start replaces, never leaks
    kafka = new KafkaConsume(sql => {
      val cat = sliceOf(catalog, defaultDb)
      val out = InfluxQL.execute(cat, sql)
      // Tag columns come from the QUERY'S OWN measurement(s) — the
      // reference derives TagAux from the fetched measurement
      // (`services/consume/processor.go:56-66`), so a selected field
      // whose name collides with ANOTHER measurement's tag stays a
      // field. Union-of-all-tags only as a parse-failure fallback.
      def meas(q: InfluxQL.Query): Set[String] = {
        val own = q.fromSub.map(meas).getOrElse(
          Set(q.fromBare.getOrElse(q.from)) ++ q.fromMore)
        own ++ q.join.toSeq.flatMap(j =>
          j.rightSub.map(meas).getOrElse(Set(j.right))).toSet
      }
      val tagCols =
        try meas(InfluxQL.parse(sql))
          .flatMap(n => cat.get(n).map(_.tags.toSet).getOrElse(Set.empty))
        catch { case _: Exception => cat.values.flatMap(_.tags).toSet }
      RecordCodec.payloadsFromResult(out.limit(maxRowLimit),
        tagCols = tagCols, maxRows = maxRowLimit)
    })
    kafka.start(port)
  }

  /** Current measurement catalog (grows via /write and SELECT INTO). */
  def measurements: Map[String, InfluxQL.Measurement] = catalog

  /** (cached samples served, gap evaluations run) — results cache. */
  def resultsCacheStats: (Long, Long) = resultsCache.stats

  // ------------------------------------------------------------ plumbing
  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def respond(ex: HttpExchange, code: Int, body: String,
                      ctype: String = "application/json"): Unit = {
    if (code == 401 || code == 403) stats.authFail.incrementAndGet()
    if (code >= 400 && code < 500) stats.clientError.incrementAndGet()
    else if (code >= 500) stats.serverError.incrementAndGet()
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1L else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def decode(s: String): String = URLDecoder.decode(s, UTF_8)

  /** URI query params, plus form-encoded POST body params for /query
    * (the reference accepts `q` in either place). */
  private def params(ex: HttpExchange, readBody: Boolean): Map[String, String] = {
    val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    val fromBody =
      if (readBody && ex.getRequestMethod == "POST" &&
          ct.startsWith("application/x-www-form-urlencoded"))
        new String(ex.getRequestBody.readAllBytes(), UTF_8)
      else ""
    (Option(ex.getRequestURI.getRawQuery).getOrElse("") + "&" + fromBody)
      .split('&').filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => decode(k) -> decode(v)
          case Array(k) => decode(k) -> ""
        }
      }.toMap
  }

  // ---------------------------------------------------------------- auth
  /** Resolve the request's principal (`handler.go:1913` authenticate):
    * when auth is off — or no admin exists yet (the bootstrap window
    * that lets the first `CREATE USER … WITH ALL PRIVILEGES` through,
    * `handler.go:1923`) — requests run unrestricted with no principal.
    * Otherwise credentials come from `u`/`p` params, `Basic`, or
    * `Token user:pw` headers (`handler.go:1861` ParseCredentials); the
    * two 401 messages mirror the reference's. Returns None after
    * answering 401 itself. */
  private def authed(ex: HttpExchange,
                     p: Map[String, String]): Option[Option[Auth.User]] =
    if (!requireAuth || !auth.adminExists) Some(None)
    else {
      def deny(msg: String): Option[Option[Auth.User]] = {
        ex.getResponseHeaders.set("WWW-Authenticate", "Basic realm=\"graft\"")
        respond(ex, 401, s"""{"error":${jsonStr(msg)}}""")
        None
      }
      val creds: Option[(String, String)] = (p.get("u"), p.get("p")) match {
        case (Some(u), Some(pw)) if u.nonEmpty && pw.nonEmpty => Some((u, pw))
        case _ =>
          Option(ex.getRequestHeaders.getFirst("Authorization")).flatMap { h =>
            h.split(" ", 2) match {
              case Array("Basic", b64) =>
                val up = new String(
                  java.util.Base64.getDecoder.decode(b64), UTF_8)
                up.split(":", 2) match {
                  case Array(u, pw) => Some((u, pw)); case _ => None
                }
              case Array("Token", tok) => tok.split(":", 2) match {
                case Array(u, pw) => Some((u, pw)); case _ => None
              }
              case _ => None
            }
          }
      }
      creds match {
        case None => deny("unable to parse authentication credentials")
        case Some((u, pw)) => auth.authenticate(u, pw) match {
          case Some(user) => Some(Some(user))
          case None => deny("authorization failed")
        }
      }
    }

  /** Authenticate AND check one privilege on the request's `db` param —
    * the per-route guard for write/prom endpoints. Answers 401/403
    * itself and returns None when the request is already done. */
  private def guard(ex: HttpExchange, p: Map[String, String], need: Int,
                    verb: String): Option[Option[Auth.User]] =
    guardDb(ex, p, need, verb, p.getOrElse("db", ""))

  /** [[guard]] against an explicit database name (for routes that carry
    * the store/db in the path rather than a `db` param). */
  private def guardDb(ex: HttpExchange, p: Map[String, String], need: Int,
                      verb: String, db: String): Option[Option[Auth.User]] =
    authed(ex, p) match {
      case None => None
      case Some(principal) =>
        principal match {
          case Some(u) if !u.authorizeDatabase(need, db) =>
            respond(ex, 403, s"""{"error":${jsonStr(
              s"""user "${u.name}" is not authorized to $verb database "$db"""")}}""")
            None
          case pr => Some(pr)
        }
    }

  /** Admin-only route guard (the reference's `handler.go` checkAuth
    * wrapping backup/debug syscontrol routes): authenticates, then —
    * when auth is live — requires the admin flag. Answers 401/403
    * itself; true means proceed. */
  private def adminGuard(ex: HttpExchange, p: Map[String, String]): Boolean =
    authed(ex, p) match {
      case None => false
      case Some(Some(u)) if !u.admin =>
        respond(ex, 403, s"""{"error":${jsonStr(
          s"""user "${u.name}" is not authorized, requires admin privilege""")}}""")
        false
      case _ => true
    }

  /** Whole-query pre-authorization, the reference's shape
    * (`authorizer.go:92` AuthorizeQuery loops statements before any
    * executes): management needs admin, selects need READ on `db`,
    * INTO adds WRITE; user-management needs admin except SET PASSWORD
    * for oneself (the influxdb self-service carve-out). Returns the
    * first denial message. */
  private def authorizeStatements(user: Auth.User, db: String,
                                  statements: Seq[String]): Option[String] =
    statements.map(_.trim).flatMap { stmt =>
      val lower = stmt.toLowerCase
      if (Auth.isUserStatement(stmt)) {
        if (user.admin || setPasswordTarget(stmt).contains(user.name)) None
        else Some(s"statement '$stmt', requires admin privilege")
      } else if (Seq("drop ", "create ", "kill ", "delete", "alter ")
          .exists(lower.startsWith)) {
        if (user.admin) None
        else Some(s"statement '$stmt', requires admin privilege")
      } else {
        val into = lower.startsWith("select") &&
          "(?is).*\\bINTO\\b.*".r.matches(stmt)
        if (!user.authorizeDatabase(Auth.ReadPrivilege, db))
          Some(s"""user "${user.name}" is not authorized to read from database "$db"""")
        else if (into && !user.authorizeDatabase(Auth.WritePrivilege, db))
          Some(s"""user "${user.name}" is not authorized to write to database "$db"""")
        else None
      }
    }.headOption

  /** `SET PASSWORD FOR <name> …` → Some(name), else None. */
  private def setPasswordTarget(sql: String): Option[String] =
    try InfluxQL.lex(sql) match {
      case InfluxQL.TIdent(s) :: InfluxQL.TIdent(pw) :: InfluxQL.TIdent(f)
          :: rest if s.equalsIgnoreCase("set") &&
          pw.equalsIgnoreCase("password") && f.equalsIgnoreCase("for") =>
        rest.headOption.collect {
          case InfluxQL.TIdent(n) => n
          case InfluxQL.TStr(n) => n
        }
      case _ => None
    } catch { case _: Throwable => None }

  /** Gateway-state rows (SHOW USERS/GRANTS/QUERIES) → a small DataFrame
    * so the response flows through the same [[ResultShaper]] as every
    * other series. */
  private def gatewayRowsDf(cols: Seq[String],
                            rows: Seq[Seq[Any]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(cols.map {
      case c @ ("admin" | "rwuser" | "default") =>
        StructField(c, BooleanType)
      case c @ ("qid" | "replicaN" | "ReplicaN" | "SHARD_GROUP" | "id" |
                "shard_group" | "downSample_level") =>
        StructField(c, LongType)
      case c @ ("destinations" | "SHARD_KEY" | "PRIMARY_KEY" | "SORT_KEY" |
                "PROPERTY_KEY" | "PROPERTY_VALUE") =>
        StructField(c, ArrayType(StringType))
      case c => StructField(c, StringType)
    })
    spark.createDataFrame(
      rows.map(r => Row(r: _*)).asJava, schema)
  }

  // ------------------------------------------------------------- /query
  /** Split `q` on top-level semicolons (quotes respected) — the
    * reference accepts multiple statements per request and emits one
    * result object per statement. */
  private def splitStatements(q: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (quote != 0) {
        // `\'` inside a single-quoted string is an escaped quote, not
        // a terminator (matches InfluxQL.lex) — an escape-blind
        // tracker here would let a bound value close the literal and
        // run an injected second statement
        if (quote == '\'' && c == '\\' && i + 1 < q.length) {
          cur += c += q.charAt(i + 1); i += 1
        } else { cur += c; if (c == quote) quote = 0 }
      }
      else if (c == '\'' || c == '"') { quote = c; cur += c }
      else if (c == ';') { out += cur.result(); cur.clear() }
      else cur += c
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Bind `$name` placeholders from the request's `params` JSON object
    * (`handler.go:854` — clients send `params={"h":"server01","n":3}`).
    * Substitution is quote-aware: `$` inside single-quoted strings is
    * literal. Strings render as escaped InfluxQL strings, numbers and
    * booleans as bare literals. */
  private def bindParams(q: String, paramsJson: String): String = {
    import org.json4s._
    val JObject(fields) =
      org.json4s.jackson.JsonMethods.parse(paramsJson): @unchecked
    val binds: Map[String, String] = fields.map {
      // escape backslashes FIRST, then quotes — a value ending in `\`
      // must not escape the closing quote we add around it
      case (k, JString(s)) =>
        k -> ("'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'")
      case (k, JInt(n)) => k -> n.toString
      case (k, JDouble(d)) => k -> d.toString
      case (k, JDecimal(d)) => k -> d.toString
      case (k, JBool(b)) => k -> b.toString
      case (k, v) => sys.error(s"unsupported bind parameter $k: $v")
    }.toMap
    val out = new StringBuilder
    var i = 0; var inStr = false
    while (i < q.length) {
      val c = q.charAt(i)
      if (inStr && c == '\\' && i + 1 < q.length) {
        // escaped char inside a string (incl. \') — not a terminator
        out += c += q.charAt(i + 1); i += 2
      }
      else if (c == '\'') { inStr = !inStr; out += c; i += 1 }
      else if (c == '$' && !inStr) {
        val j0 = i + 1
        var j = j0
        while (j < q.length && (q.charAt(j).isLetterOrDigit ||
            q.charAt(j) == '_')) j += 1
        if (j == j0) { out += c; i += 1 }
        else {
          val name = q.substring(j0, j)
          out ++= binds.getOrElse(name,
            sys.error(s"missing parameter value for $$$name"))
          i = j
        }
      } else { out += c; i += 1 }
    }
    out.result()
  }

  private def handleQuery(ex: HttpExchange): Unit = {
    stats.queryReq.incrementAndGet(); stats.req.incrementAndGet()
    // syscontrol disableRead (syscontrol.go:526 case disableRead) and
    // the failpoint registry (handler.go:1717) both gate the read path
    if (readsDisabled) {
      respond(ex, 400, "{\"error\":\"disable read!\"}"); return
    }
    val fpTerm = failpoints.get("graft/query-error")
    if (fpTerm != null) {
      respond(ex, 500, s"""{"error":${jsonStr(fpTerm)}}"""); return
    }
    val _t0 = System.nanoTime()
    try handleQuery0(ex)
    finally stats.queryReqDurationNs.addAndGet(System.nanoTime() - _t0)
  }

  private def handleQuery0(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = true)
      val principal = authed(ex, p) match {
        case None => return
        case Some(pr) => pr
      }
      val q = p.getOrElse("q",
        sys.error("missing required parameter \"q\""))
      val bound0 = p.get("params").map(bindParams(q, _)).getOrElse(q)
      // plain comments strip here; optimizer-hint comments (`SELECT
      // /*+ full_series */ …`) stay — the engine reads them off the
      // statement text (Query.hints) and the lexer skips them for
      // parsing. Quote-aware (a literal "/*" is content, not a comment).
      val bound = {
        val noPlain = new StringBuilder
        var i = 0; var quote: Char = 0
        while (i < bound0.length) {
          val c = bound0.charAt(i)
          if (quote != 0) {
            noPlain.append(c)
            if (c == '\\' && i + 1 < bound0.length) {
              noPlain.append(bound0.charAt(i + 1)); i += 1
            } else if (c == quote) quote = 0
            i += 1
          } else if (c == '\'' || c == '"') {
            quote = c; noPlain.append(c); i += 1
          } else if (c == '/' && i + 1 < bound0.length &&
              bound0.charAt(i + 1) == '*' &&
              !(i + 2 < bound0.length && bound0.charAt(i + 2) == '+')) {
            val end = bound0.indexOf("*/", i + 2)
            noPlain.append(' ')
            i = if (end < 0) bound0.length else end + 2
          } else { noPlain.append(c); i += 1 }
        }
        noPlain.toString
      }
      // no epoch param → the reference's default RFC3339 rendering
      val epoch = p.getOrElse("epoch", "rfc3339")
      val statements = splitStatements(bound)
      require(statements.nonEmpty, "empty query")
      val denial = principal.flatMap(user =>
        authorizeStatements(user, p.getOrElse("db", ""), statements))
      denial match {
        case Some(msg) =>
          respond(ex, 403, s"""{"error":${jsonStr(msg)}}""")
          return
        case None => ()
      }
      // attach to the live registry for SHOW QUERIES / KILL QUERY;
      // detach when the request finishes, success or failure
      val rq = attachQuery(bound, p.getOrElse("db", ""))
      // request database: empty/missing db param targets the default
      // database; existence is checked per data statement, so
      // CREATE DATABASE / user statements still run against a fresh name
      val reqDb = p.get("db").filter(_.nonEmpty).getOrElse(defaultDb)
      def reqCat(db: String = reqDb) = {
        if (!databases.contains(db))
          sys.error(s"database not found: $db")
        catalogFor(db, principal)
      }
      // `SHOW … ON <db>` scopes to THAT database (parser.go
      // parseShowMeasurementsStatement etc.) — the ON clause wins over
      // the request's db param, like the reference's statement rewrite
      def showDb(stmt: String): String = {
        val toks = InfluxQL.lex(stmt)
        toks.sliding(2).collectFirst {
          case Seq(InfluxQL.TIdent(on), InfluxQL.TIdent(d))
              if on.equalsIgnoreCase("on") => d
        }.getOrElse(reqDb)
      }
      try {

      def resultObj(stmt: String, id: Int): String =
        if (stmt.trim.toLowerCase.startsWith("show queries")) {
          // the live registry, not the library's empty frame
          // (statement_executor.go:2127 column set incl. host)
          val nowNs = System.nanoTime()
          val rows = running.synchronized(running.values.toSeq)
            .map(r => Seq[Any](r.qid, r.query, r.db,
              fmtDur(nowNs - r.startNs), r.status,
              s"127.0.0.1:$boundPort"))
          val cols = Seq("qid", "query", "database", "duration",
            "status", "host")
          ResultShaper.toResultObj(
            gatewayRowsDf(cols, rows), "queries", Nil, cols, epoch, id)
        } else if (stmt.trim.toLowerCase.startsWith("kill query")) {
          val qid = stmt.trim.split("\\s+").lift(2)
            .flatMap(s => scala.util.Try(s.toLong).toOption)
            .getOrElse(sys.error("KILL QUERY expects a query id"))
          killQuery(qid)
          s"""{"statement_id":$id}"""
        } else if (Auth.isUserStatement(stmt)) {
          // mutate+persist as one unit on the auth monitor: concurrent
          // user statements can't interleave a stale snapshot over a
          // newer one (lost update)
          auth.synchronized {
            auth.execute(stmt) match {
              case None =>
                persistUsers() // user catalog mutated — journal it
                s"""{"statement_id":$id}"""
              case Some((name, cols, rows)) =>
                ResultShaper.toResultObj(
                  gatewayRowsDf(cols, rows), name, Nil, cols, epoch, id)
            }
          }
        } else if (stmt.trim.toLowerCase.startsWith("show databases")) {
          // the gateway's real database set (the library's constant is
          // its single-db standalone answer). The implicit default
          // database lists only once it holds anything or was created
          // explicitly — a fresh server shows none (DefaultDBAndRP exp
          // lists db0 alone).
          val listed = databases.toSeq.sorted
            .filter(db => db != defaultDb || defaultDbTouched)
          if (stmt.trim.toLowerCase.contains("detail"))
            // SHOW DATABASES DETAIL: ReplicaN + tag-attribute columns
            // (statement_executor.go executeShowDatabasesDetail)
            ResultShaper.toResultObj(
              gatewayRowsDf(Seq("name", "ReplicaN", "Tag Attribute"),
                listed.map(db => Seq[Any](db, 1L, "default"))),
              "databases", Nil, Seq("name", "ReplicaN", "Tag Attribute"),
              epoch, id)
          else if (listed.isEmpty)
            // zero databases still render the column-only series
            // (DatabaseCommands "show database should have no results")
            s"""{"statement_id":$id,"series":[{"name":"databases","columns":["name"]}]}"""
          else ResultShaper.toResultObj(
            gatewayRowsDf(Seq("name"), listed.map(Seq(_))),
            "databases", Nil, Seq("name"), epoch, id)
        } else if (stmt.trim.toLowerCase.matches("(?s)(create|drop)\\s+database\\b.*")) {
          // real database DDL (meta/database.go CreateDatabase/DropDatabase)
          val toks = InfluxQL.lex(stmt)
          val isCreateDb = stmt.trim.toLowerCase.startsWith("create")
          // the reference's yacc parse errors, verbatim
          // (DatabaseCommands goldens) — these 400 at the request level
          def yaccErr(msg: String): Nothing =
            sys.error(s"error parsing query: syntax error: $msg")
          val name = toks.drop(2).headOption match {
            case Some(InfluxQL.TIdent(n)) => n
            case Some(InfluxQL.TStr(n)) => n
            case Some(_: InfluxQL.TDur) | Some(_: InfluxQL.TNum)
                if isCreateDb =>
              yaccErr("unexpected DURATIONVAL, expecting IDENT")
            case _ => sys.error("expected database name")
          }
          // WITH-option argument kinds (parser.go grammar)
          if (isCreateDb) toks.zipWithIndex.foreach {
            case (InfluxQL.TIdent(k), i)
                if k.equalsIgnoreCase("duration") =>
              toks.lift(i + 1) match {
                case Some(_: InfluxQL.TDur) | Some(_: InfluxQL.TNum) => ()
                case Some(InfluxQL.TIdent(x))
                    if x.equalsIgnoreCase("inf") => ()
                case _ => yaccErr("unexpected IDENT, expecting DURATIONVAL")
              }
            case (InfluxQL.TIdent(k), i)
                if k.equalsIgnoreCase("replication") =>
              toks.lift(i + 1) match {
                case Some(_: InfluxQL.TNum) => ()
                case _ => yaccErr("unexpected IDENT, expecting INTEGER")
              }
            case (InfluxQL.TIdent(k), i) if k.equalsIgnoreCase("name") =>
              toks.lift(i + 1) match {
                case Some(_: InfluxQL.TIdent) | Some(_: InfluxQL.TStr) => ()
                case None => yaccErr("unexpected $end, expecting IDENT")
                case _ => yaccErr("unexpected IDENT, expecting IDENT")
              }
            case _ => ()
          }
          // name validation (meta validation: "." names are invalid) —
          // statement-level (DatabaseCommands "invalid name" goldens)
          def validName(n: String): Unit =
            if (n == "." || n == ".." || n.contains("/"))
              throw new InfluxQL.StatementError("invalid name")
          synchronized {
            if (isCreateDb) {
              validName(name)
              // WITH … NAME <rp> names the born-default retention
              // policy (parser.go parseCreateDatabaseStatement —
              // `CREATE DATABASE db4 WITH SHARD DURATION 12h … NAME
              // rp3`); durations present ride onto it
              val named = toks.sliding(2).collectFirst {
                case Seq(InfluxQL.TIdent(k), InfluxQL.TIdent(v))
                  if k.equalsIgnoreCase("name") => v
                case Seq(InfluxQL.TIdent(k), InfluxQL.TStr(v))
                  if k.equalsIgnoreCase("name") => v
              }
              named.foreach(validName)
              // WITH DURATION on an EXISTING database must agree with
              // the default policy (meta CreateDatabaseWithRetention-
              // Policy conflict — DatabaseCommands golden)
              // the PLAIN `WITH DURATION d` option only — shard/index/
              // hot/warm duration options don't constrain the default
              // policy's retention (PreAgg_OutOfOrderData re-creates
              // db3 WITH SHARD DURATION … without conflict)
              val qualifiers =
                Set("shard", "index", "hot", "warm")
              val withDurS: Option[Long] = toks.zipWithIndex.collectFirst {
                case (InfluxQL.TIdent(k), i)
                    if k.equalsIgnoreCase("duration") && i > 0 &&
                      (toks(i - 1) match {
                        case InfluxQL.TIdent(p) =>
                          !qualifiers.contains(p.toLowerCase)
                        case _ => true
                      }) =>
                  toks.lift(i + 1) match {
                    case Some(InfluxQL.TDur(ns)) => ns / 1000000000L
                    case _ => 0L
                  }
              }
              if (databases.contains(name) && withDurS.isDefined) {
                val existing = retention.getOrElse(name, Retention.autogen)
                  .values.find(_.default)
                if (!existing.exists(_.durationS == withDurS.get))
                  throw new InfluxQL.StatementError(
                    "retention policy conflicts with an existing policy")
              }
              databases = databases + name
              if (name == defaultDb) defaultDbTouched = true
              if (!retention.contains(name)) {
                val rp0 = Retention.autogen.head._2
                  .copy(durationS = withDurS.getOrElse(0L))
                retention = retention +
                  (name -> Map(named.getOrElse("autogen") -> rp0))
              }
            } else {
              databases = databases - name
              retention = retention - name
              val pre = name + "\u0000"
              catalog = catalog.filterNot(_._1.startsWith(pre))
              if (name == defaultDb)
                catalog = catalog.filter(_._1.contains('\u0000'))
            }
            persistDatabases()
          }
          s"""{"statement_id":$id}"""
        } else if (Retention.isRpStatement(stmt)) {
          val st = Retention.parse(stmt)
          if (!databases.contains(st.db)) {
            // DROP on a missing database is a silent no-op; CREATE/ALTER
            // carry the error INSIDE the result
            // (RetentionPolicyCommands goldens)
            if (st.verb == "drop") return s"""{"statement_id":$id}"""
            throw new InfluxQL.StatementError(
              s"database not found: ${st.db}")
          }
          synchronized {
            val rps = retention.getOrElse(st.db, Retention.autogen)
            st.verb match {
              case "create" =>
                if (st.rp == "." || st.rp == ".." || st.rp.contains("/"))
                  throw new InfluxQL.StatementError("invalid name")
                val d = st.durationS.getOrElse(0L)
                // meta validation: 0 = infinite, else ≥ 1h
                // (RetentionPolicyCommands golden, verbatim)
                if (d > 0L && d < 3600L)
                  throw new InfluxQL.StatementError(
                    "retention policy duration must be at least 1h0m0s")
                val rp = Retention.Rp(d,
                  st.shardGroupS.getOrElse(Retention.shardGroupFor(d)),
                  st.replicaN.getOrElse(1L), st.default,
                  st.hotS.getOrElse(0L), st.warmS.getOrElse(0L))
                if (rps.contains(st.rp)) {
                  // idempotent when identical; a differing spec is the
                  // reference's conflict error
                  val prev = rps(st.rp)
                  if (prev.durationS == rp.durationS &&
                      prev.replicaN == rp.replicaN &&
                      prev.default == rp.default)
                    return s"""{"statement_id":$id}"""
                  throw new InfluxQL.StatementError(
                    "retention policy conflicts with an existing policy")
                }
                val cleared = if (st.default)
                  rps.view.mapValues(_.copy(default = false)).toMap else rps
                retention = retention + (st.db -> (cleared + (st.rp -> rp)))
              case "alter" =>
                val prev = rps.getOrElse(st.rp,
                  sys.error(s"retention policy not found: ${st.rp}"))
                val d = st.durationS.getOrElse(prev.durationS)
                val rp = prev.copy(durationS = d,
                  shardGroupS = st.shardGroupS.getOrElse(
                    if (st.durationS.isDefined) Retention.shardGroupFor(d)
                    else prev.shardGroupS),
                  replicaN = st.replicaN.getOrElse(prev.replicaN),
                  default = prev.default || st.default,
                  hotS = st.hotS.getOrElse(prev.hotS),
                  warmS = st.warmS.getOrElse(prev.warmS))
                val cleared = if (st.default)
                  rps.view.mapValues(_.copy(default = false)).toMap else rps
                retention = retention + (st.db -> (cleared + (st.rp -> rp)))
              case "drop" =>
                // dropping the default policy is allowed (the reference
                // drops it and the database keeps no default —
                // RetentionPolicyCommands "drop rp0" golden); a missing
                // policy is a silent no-op like a missing database
                if (rps.contains(st.rp))
                  retention = retention + (st.db -> (rps - st.rp))
              case v => sys.error(s"unsupported retention verb $v")
            }
            persistDatabases()
          }
          s"""{"statement_id":$id}"""
        } else if (stmt.trim.toLowerCase.startsWith("show retention")) {
          val db = showDb(stmt)
          if (!databases.contains(db))
            sys.error(s"database not found: $db")
          // full reference column set (meta/data.go:2061) — hot/warm
          // are the hierarchical tier bounds; index duration is meta
          // the engine does not organize by (0s)
          val rows = retention.getOrElse(db, Retention.autogen).toSeq
            .sortBy(_._1).map { case (n, rp) => Seq[Any](n,
              Retention.renderDuration(rp.durationS),
              Retention.renderDuration(rp.shardGroupS),
              Retention.renderDuration(rp.hotS),
              Retention.renderDuration(rp.warmS),
              // index group duration defaults to the shard group
              // duration (meta/data.go; DefaultDBAndRP golden)
              Retention.renderDuration(rp.shardGroupS),
              rp.replicaN, rp.default) }
          val cols = Seq("name", "duration", "shardGroupDuration",
            "hot duration", "warm duration", "index duration",
            "replicaN", "default")
          // models.Row name,omitempty: SHOW RETENTION POLICIES series
          // are UNNAMED (DefaultDBAndRP golden)
          ResultShaper.toResultObj(gatewayRowsDf(cols, rows),
            "", Nil, cols, epoch, id)
        } else if ("(?is)^\\s*create\\s+continuous\\s+query\\b.*".r
            .matches(stmt)) {
          synchronized { registerCq(reqDb, stmt.trim); persistDdl() }
          s"""{"statement_id":$id}"""
        } else if ("(?is)^\\s*drop\\s+continuous\\s+query\\b.*".r
            .matches(stmt)) {
          val toks = stmt.trim.split("\\s+")
          val name = toks(3)
          val db = if (toks.length >= 6 && toks(4).equalsIgnoreCase("on"))
            toks(5) else reqDb
          synchronized {
            cqRegistry = cqRegistry - ((db, name)); persistDdl()
          }
          s"""{"statement_id":$id}"""
        } else if ("(?is)^\\s*show\\s+continuous\\s+queries\\s*$".r
            .matches(stmt.trim)) {
          val rows = cqRegistry.toSeq
            .collect { case ((db, name), e) if db == reqDb =>
              Seq[Any](name, e.text) }
            .sortBy(_.head.toString)
          ResultShaper.toResultObj(
            gatewayRowsDf(Seq("name", "query"), rows),
            reqDb, Nil, Seq("name", "query"), epoch, id)
        } else if (MeasurementDDL.isCreate(stmt)) {
          synchronized { registerMst(reqDb, stmt.trim); persistDdl() }
          s"""{"statement_id":$id}"""
        } else if (MeasurementDDL.isAlterShardKey(stmt)) {
          val (dbOpt, _, name, key, tpe) = MeasurementDDL.parseAlter(stmt)
          val db = dbOpt.getOrElse(reqDb)
          synchronized {
            val sc = mstSchemas.getOrElse((db, name),
              if (sliceOf(catalog, db).contains(name))
                MeasurementDDL.Schema(Some(db), None, name, Nil, Nil,
                  Nil, "hash", "tsstore", Nil, Nil, Nil)
              else sys.error(s"measurement not found: $name"))
            mstSchemas = mstSchemas +
              ((db, name) -> sc.copy(shardKey = key, shardType = tpe))
            persistDdl()
          }
          s"""{"statement_id":$id}"""
        } else if (MeasurementDDL.isShowKeys(stmt)) {
          val (kind, dbOpt, _, name) = MeasurementDDL.parseShowKeys(stmt)
          val db = dbOpt.getOrElse(reqDb)
          val sc = mstSchemas.getOrElse((db, name),
            sys.error("measurement not found"))
          val colstoreOnly = Set("primarykey", "sortkey", "property",
            "compact")
          if (colstoreOnly(kind) && sc.engineType != "columnstore")
            sys.error("only support for COLUMNSTORE engine")
          // statement_executor.go:1366-1432 row shapes
          def section(kind: String): (Seq[String], Seq[Seq[Any]]) =
            kind match {
              case "shardkey" => (Seq("SHARD_KEY", "TYPE", "SHARD_GROUP"),
                if (sc.shardKey.isEmpty) Nil
                else Seq(Seq[Any](sc.shardKey, sc.shardType, 0L)))
              case "enginetype" =>
                (Seq("ENGINETYPE"), Seq(Seq[Any](sc.engineType)))
              case "indexes" => (Seq("INDEXES"),
                sc.indexes.map { case (n, cols) =>
                  Seq[Any](s"${n.toUpperCase}(${cols.mkString(",")})") })
              case "primarykey" =>
                (Seq("PRIMARY_KEY"), Seq(Seq[Any](sc.primaryKey)))
              case "sortkey" =>
                (Seq("SORT_KEY"), Seq(Seq[Any](sc.sortKey)))
              case "property" =>
                (Seq("PROPERTY_KEY", "PROPERTY_VALUE"),
                  Seq(Seq[Any](Seq.empty[String], Seq.empty[String])))
              case "compact" =>
                (Seq("COMPACTION_TYPE"), Seq(Seq[Any]("row")))
              case other => sys.error(s"$other is not support")
            }
          def seriesOf(kind: String): String = {
            val (cols, rows) = section(kind)
            val o = ResultShaper.toResultObj(gatewayRowsDf(cols, rows),
              "", Nil, cols, epoch, id)
            val i = o.indexOf("\"series\":[")
            o.substring(i + 10, o.length - 2)
          }
          val kinds =
            if (kind != "schema") Seq(kind)
            else if (sc.engineType == "columnstore")
              Seq("shardkey", "enginetype", "indexes", "primarykey",
                "sortkey", "compact")
            else Seq("shardkey", "enginetype", "indexes")
          val series = kinds.map(seriesOf).filter(_.nonEmpty)
            .mkString(",")
          s"""{"statement_id":$id,"series":[$series]}"""
        } else if ("(?is)^\\s*create\\s+subscription\\b.*".r.matches(stmt)) {
          synchronized { registerSub(reqDb, stmt.trim); persistDdl() }
          s"""{"statement_id":$id}"""
        } else if ("(?is)^\\s*drop\\s+subscription\\b.*".r.matches(stmt)) {
          // DROP SUBSCRIPTION name ON db.rp (ast.go DropSubscription)
          var toks = InfluxQL.lex(stmt).drop(2)
          def pop(): InfluxQL.Tok = {
            val t = toks.head; toks = toks.drop(1); t }
          val name = pop() match {
            case InfluxQL.TIdent(n) => n
            case InfluxQL.TStr(n) => n
            case t => sys.error(s"expected subscription name, got $t")
          }
          pop() // ON
          val db = pop() match { case InfluxQL.TIdent(n) => n
            case InfluxQL.TStr(n) => n; case t => sys.error(s"bad db: $t") }
          pop() // .
          val rp = pop() match { case InfluxQL.TIdent(n) => n
            case InfluxQL.TStr(n) => n; case t => sys.error(s"bad rp: $t") }
          synchronized {
            if (!subRegistry.contains((db, rp, name)))
              sys.error(s"subscription not found: $name")
            subRegistry = subRegistry - ((db, rp, name))
            persistDdl()
          }
          s"""{"statement_id":$id}"""
        } else if ("(?is)^\\s*show\\s+shards\\s*$".r.matches(stmt.trim)) {
          // meta/data.go:1974 ShowShards: one series per database,
          // 10-column set; 1 shard per group, single-node owner
          val cols = Seq("id", "database", "retention_policy",
            "shard_group", "start_time", "end_time", "expiry_time",
            "owners", "tier", "downSample_level")
          val nowTier = System.currentTimeMillis()
          val series = databases.toSeq.sorted.flatMap { db =>
            val rows = shardGroupsOf(db).map { case (rp, g, s0, e0, x0) =>
              Seq[Any](g, db, rp, g, rfc3339(s0), rfc3339(e0),
                rfc3339(x0), "0", tierOf(db, e0, nowTier), 0L) }
            if (rows.isEmpty) None
            else Some(ResultShaper.toResultObj(gatewayRowsDf(cols, rows),
              db, Nil, cols, epoch, id))
          }.map { o =>
            val i = o.indexOf("\"series\":[")
            o.substring(i + 10, o.length - 2)
          }.filter(_.nonEmpty)
          s"""{"statement_id":$id,"series":[${series.mkString(",")}]}"""
        } else if ("(?is)^\\s*show\\s+shard\\s+groups\\s*$".r
            .matches(stmt.trim)) {
          // meta/data.go:2015: one series "shard groups", all databases
          val cols = Seq("id", "database", "retention_policy",
            "start_time", "end_time", "expiry_time")
          val rows = databases.toSeq.sorted.flatMap { db =>
            shardGroupsOf(db).map { case (rp, g, s0, e0, x0) =>
              Seq[Any](g, db, rp, rfc3339(s0), rfc3339(e0), rfc3339(x0)) }
          }
          ResultShaper.toResultObj(gatewayRowsDf(cols, rows),
            "shard groups", Nil, cols, epoch, id)
        } else if ("(?is)^\\s*drop\\s+shard\\s+\\d+\\s*$".r
            .matches(stmt.trim)) {
          // data.go:2271 DropShard(id) — scoped here to the request
          // database (ids are per-db group indexes, not a global counter)
          val sid = stmt.trim.split("\\s+")(2).toLong
          synchronized {
            val before = sliceOf(catalog, reqDb)
            if (!dropShardData(reqDb, sid))
              sys.error(s"shard not found: $sid")
            journalDml(reqDb, stmt.trim, System.currentTimeMillis())
            propagateDml(reqDb, before, sliceOf(catalog, reqDb))
          }
          s"""{"statement_id":$id}"""
        } else if ("(?is)^\\s*show\\s+subscriptions\\b.*".r.matches(stmt)) {
          // one series per database (meta SHOW SUBSCRIPTIONS shape);
          // the gateway's single-db request view renders reqDb's series
          val cols = Seq("retention_policy", "name", "mode", "destinations")
          val rows = subRegistry.toSeq
            .collect { case ((d, rp, name), s) if d == reqDb =>
              Seq[Any](rp, name, s.mode, s.destinations) }
            .sortBy(r => (r.head.toString, r(1).toString))
          ResultShaper.toResultObj(gatewayRowsDf(cols, rows),
            reqDb, Nil, cols, epoch, id)
        } else if ("(?is)^\\s*create\\s+stream\\b.*".r.matches(stmt)) {
          synchronized {
            registerStream(reqDb, stmt.trim, Long.MinValue); persistDdl()
          }
          s"""{"statement_id":$id}"""
        } else if ("(?is)^\\s*drop\\s+stream\\b.*".r.matches(stmt)) {
          // DROP STREAM 'name' (sql.y DROP STREAM STRING_TYPE)
          val name = InfluxQL.lex(stmt).drop(2).headOption match {
            case Some(InfluxQL.TIdent(n)) => n
            case Some(InfluxQL.TStr(n)) => n
            case _ => sys.error("expected stream name")
          }
          synchronized {
            if (!streamRegistry.contains((reqDb, name)))
              sys.error(s"stream not found: $name")
            streamRegistry = streamRegistry - ((reqDb, name))
            persistDdl()
          }
          s"""{"statement_id":$id}"""
        } else if ("(?is)^\\s*show\\s+streams\\b.*".r.matches(stmt)) {
          val db = showDb(stmt)
          // meta/data.go:3918 ShowStreams column set
          val cols = Seq("database", "retention", "measurement", "Name",
            "source measurement", "dimensions", "calls", "interval",
            "delay", "condition")
          val rows = streamRegistry.toSeq
            .collect { case ((d, name), e) if d == db =>
              val st = e.stmt
              Seq[Any](d, "autogen", st.target, name,
                s"$d.autogen.${st.from}",
                st.tags.mkString(","),
                st.calls.map { case (fn, f) => s"$fn($f)" }.mkString(","),
                Retention.renderDuration(st.intervalNs / 1000000000L),
                Retention.renderDuration(st.delayNs / 1000000000L),
                "") }
            .sortBy(_(3).toString)
          ResultShaper.toResultObj(gatewayRowsDf(cols, rows),
            "streams", Nil, cols, epoch, id)
        } else if (DownSample.isCreate(stmt)) {
          synchronized { registerDs(reqDb, stmt.trim); persistDdl() }
          s"""{"statement_id":$id}"""
        } else if (DownSample.isDrop(stmt)) {
          val toks = stmt.trim.split("[\\s.]+")
          synchronized {
            if (toks(1).equalsIgnoreCase("downsamples")) {
              // DROP DOWNSAMPLES [ON db]
              val db = if (toks.length >= 4) toks(3) else reqDb
              dsRegistry = dsRegistry.filterNot(_._1._1 == db)
            } else {
              // DROP DOWNSAMPLE ON [db.]rp
              val (db, rp) =
                if (toks.length >= 5) (toks(3), toks(4))
                else (reqDb, toks(3))
              if (!dsRegistry.contains((db, rp)))
                sys.error(s"downsample policy not found on $db.$rp")
              dsRegistry = dsRegistry - ((db, rp))
            }
            persistDdl()
          }
          s"""{"statement_id":$id}"""
        } else if (DownSample.isShow(stmt)) {
          val db = showDb(stmt)
          // meta/data.go:3827 ShowDownSamplePolicies column set
          val cols = Seq("rpName", "field_operator", "duration",
            "sampleInterval", "timeInterval")
          val rows = dsRegistry.toSeq
            .collect { case ((d, rp), p) if d == db =>
              Seq[Any](rp, p.fieldOperator,
                Retention.renderDuration(p.durationS),
                p.sampleS.map(Retention.renderDuration).mkString(","),
                p.timeS.map(Retention.renderDuration).mkString(",")) }
            .sortBy(_.head.toString)
          ResultShaper.toResultObj(gatewayRowsDf(cols, rows),
            "downsamples", Nil, cols, epoch, id)
        } else if ("(?is)^\\s*set\\s+config\\b.*".r.matches(stmt)) {
          // SET CONFIG <component> <key> = <value> (sql.y:4011; key is
          // IDENT|STRING, dots scan into bare idents — scanner.go:722).
          // The executor accepts only the sql component's logging.level
          // with a string value (statement_executor.go:2572); a non-
          // string there is "illegal type of logging level input", any
          // other component/key is "unsupported config command".
          val m = ("(?is)^\\s*set\\s+config\\s+(\\S+)\\s+" +
            "(?:\"([^\"]*)\"|(\\S+))\\s*=\\s*(.+?)\\s*$").r
            .findFirstMatchIn(stmt).getOrElse(
              throw new InfluxQL.StatementError("syntax error"))
          val component = m.group(1)
          val key = Option(m.group(2)).getOrElse(m.group(3))
          val rawVal = m.group(4).trim
          val isString = rawVal.startsWith("'") ||
            "^[A-Za-z_][A-Za-z0-9_.-]*$".r.matches(rawVal)
          if (!(component == "sql" && key == "logging.level"))
            throw new InfluxQL.StatementError("unsupported config command")
          if (!isString)
            throw new InfluxQL.StatementError(
              "illegal type of logging level input")
          val lvl = rawVal.stripPrefix("'").stripSuffix("'").toLowerCase
          // the reference delegates to its zap-backed logger.SetLevel;
          // mirror zap's accepted level atoms
          if (!Set("debug", "info", "warn", "error", "dpanic", "panic",
              "fatal").contains(lvl))
            throw new InfluxQL.StatementError(
              s"""unrecognized level: "$rawVal"""")
          loggingLevel = lvl
          s"""{"statement_id":$id}"""
        } else if ("(?is)^\\s*show\\s+configs\\s*$".r.matches(stmt.trim)) {
          // the gateway's ACTUAL effective knobs in the reference's
          // 4-column shape (executeShowConfigs,
          // statement_executor.go:2560: component, instance, name,
          // value — names sorted, instance = bind address). Reference
          // names where a knob maps onto one of its config keys;
          // graft-specific knobs keep their own dotted namespace.
          val lim = Validation.defaults
          val knobs: Seq[(String, Any)] = Seq(
            "http.auth-enabled" -> requireAuth,
            "http.bind-address" -> s"127.0.0.1:$boundPort",
            "http.max-row-limit" -> maxRowLimit,
            "limits.enforce-metadata-metric-name" -> lim.enforceMetricName,
            "limits.max-label-name-length" -> lim.maxLabelNameLength,
            "limits.max-label-names-per-series" ->
              lim.maxLabelNamesPerSeries,
            "limits.max-label-value-length" -> lim.maxLabelValueLength,
            "limits.prom-limit-enabled" -> lim.promLimitEnabled,
            "limits.reject-old-samples" -> lim.rejectOldSamples,
            "logging.level" -> loggingLevel,
            "storage.hot-tier-max-bytes" -> spark.conf.get(
              graft.Tables.hotTierConfKey,
              graft.Tables.hotTierDefaultMaxBytes.toString),
            "spark.sql.shuffle.partitions" -> spark.conf
              .get("spark.sql.shuffle.partitions"))
          // values keep their native JSON types (the reference emits
          // bools/numbers unquoted in the config table) — rendered
          // directly, the row set is driver-known and tiny
          def jval(v: Any): String = v match {
            case b: Boolean => b.toString
            case n: Int => n.toString
            case n: Long => n.toString
            case s => jsonStr(String.valueOf(s))
          }
          val inst = jsonStr(s"127.0.0.1:$boundPort")
          val values = knobs.sortBy(_._1).map { case (k, v) =>
            s"""["sql",$inst,${jsonStr(k)},${jval(v)}]""" }.mkString(",")
          s"""{"statement_id":$id,"series":[{"columns":""" +
            s"""["component","instance","name","value"],""" +
            s""""values":[$values]}]}"""
        } else if (("(?is)^\\s*(prepare\\s+snapshot|end\\s+(prepare\\s+)?" +
            "snapshot|get\\s+runtimeinfo)\\b.*").r.matches(stmt.trim)) {
          // parsed but rejected, the reference's exact error
          // (statement_executor.go:409-416 returns
          // meta2.ErrUnsupportCommand for PrepareSnapshot/
          // EndPrepareSnapshot/GetRuntimeInfo)
          throw new InfluxQL.StatementError("unsupported command")
        } else if (Seq("drop ", "create ", "kill ", "delete", "alter ",
            "grant ", "revoke ", "set ")
            .exists(stmt.trim.toLowerCase.startsWith)) {
          synchronized {
            val before = sliceOf(catalog, reqDb)
            val nowMs = System.currentTimeMillis()
            val after = Map.empty ++
              InfluxQL.executeManage(reqCat(), stmt, nowMs)
            applySlice(reqDb, before, after)
            // journal only statements that actually changed data — the
            // accepted-no-op meta statements (CREATE DATABASE, GRANT …)
            // return the catalog's own entries untouched
            val changed = before.keySet != after.keySet ||
              after.exists { case (k, m) => !before.get(k).exists(_ eq m) }
            if (changed) {
              journalDml(reqDb, stmt.trim, nowMs)
              propagateDml(reqDb, before, after)
            }
          }
          s"""{"statement_id":$id}"""
        } else if ("(?is).*\\bINTO\\b.*".r.matches(stmt) &&
            stmt.trim.toLowerCase.startsWith("select")) {
          val before = sliceOf(catalog, reqDb)
          val (cat2, df) = InfluxQL.executeInto(reqCat(), stmt)
          val written = df.count()
          synchronized { applySlice(reqDb, before, Map.empty ++ cat2) }
          s"""{"statement_id":$id,"series":[{"name":"result","columns":["time","written"],"values":[[0,$written]]}]}"""
        } else {
          val cat =
            if (stmt.trim.toLowerCase.startsWith("show")) reqCat(showDb(stmt))
            else reqCat()
          val (name, tags, df0, desc) =
            InfluxQL.executeShapedOrd(cat, stmt)
          // the engine's `time` output is epoch ms (LONG) — or the exact
          // epoch-ns `__tns` axis for raw rows off an LP-ingested frame;
          // epoch=/RFC3339 rendering happens at the HTTP edge
          val timeNs = df0.columns.contains("__tns")
          val df =
            if (timeNs)
              df0.withColumn("time",
                org.apache.spark.sql.functions.col("__tns")).drop("__tns")
            else df0.schema.find(_.name == "time").map(_.dataType) match {
              case Some(org.apache.spark.sql.types.LongType) |
                   Some(org.apache.spark.sql.types.IntegerType) =>
                df0.withColumn("time",
                  org.apache.spark.sql.functions.timestamp_millis(
                    org.apache.spark.sql.functions.col("time")))
              case _ => df0
            }
          // `__series_name` names each row's series (per-measurement
          // SHOW output)
          val nameCol =
            if (df.columns.contains("__series_name")) Some("__series_name")
            else None
          // a group tag the statement explicitly projects (or a grouped
          // field dimension under a star) renders as a COLUMN too
          val alsoCols = InfluxQL.alsoColumnTags(cat, stmt)
            .filter(df.columns.contains).toSet
          val valueCols = HttpGateway.shapedValueCols(
            df.columns.toIndexedSeq.filterNot(nameCol.contains),
            tags.filterNot(alsoCols.contains))
          // non-chunked responses are bounded by http.max-row-limit
          // (config.go:37) — over-limit series are truncated and marked
          // partial; use chunked=true to stream past the limit
          ResultShaper.toResultObj(df, name, tags, valueCols, epoch, id,
            maxRowLimit, timeNs = timeNs, seriesDesc = desc,
            nameCol = nameCol,
            pruneNullCols = "(?is).*/\\*\\+\\s*filter_null_column\\s*\\*/.*"
              .r.matches(stmt))
        }

      if (p.get("chunked").contains("true")) {
        // chunked emission is per-series-batch within ONE statement
        require(statements.size == 1,
          "chunked=true supports a single statement")
        val (name, tags, df0, desc) =
          InfluxQL.executeShapedOrd(reqCat(), statements.head)
        val timeNs = df0.columns.contains("__tns")
        val df =
          if (timeNs)
            df0.withColumn("time",
              org.apache.spark.sql.functions.col("__tns")).drop("__tns")
          else df0.schema.find(_.name == "time").map(_.dataType) match {
            case Some(org.apache.spark.sql.types.LongType) |
                 Some(org.apache.spark.sql.types.IntegerType) =>
              df0.withColumn("time",
                org.apache.spark.sql.functions.timestamp_millis(
                  org.apache.spark.sql.functions.col("time")))
            case _ => df0
          }
        val alsoCols = InfluxQL.alsoColumnTags(reqCat(), statements.head)
          .filter(df.columns.contains).toSet
        val valueCols = HttpGateway.shapedValueCols(
          df.columns.toIndexedSeq, tags.filterNot(alsoCols.contains))
        val n = p.get("chunk_size").map(_.toInt).getOrElse(10000)
        // stream chunk documents as they come off toLocalIterator —
        // driver heap stays bounded by one partition + one chunk no
        // matter how many rows the statement returns (the reference's
        // httpsender streams the same way); chunked responses are
        // exempt from max-row-limit like the reference's
        val lines = ResultShaper.streamSeriesJsonChunked(
          df, name, tags, valueCols, n, epoch, timeNs = timeNs,
          seriesDesc = desc)
        if (rq.status == "killed")
          sys.error(s"query ${rq.qid} was killed")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, 0)
        val os = ex.getResponseBody
        try lines.foreach { l => os.write(l.getBytes(UTF_8)); os.write('\n') }
        finally { os.close(); ex.close() }
      } else {
        val objs = statements.zipWithIndex
          .map { case (s, i) =>
            // statement-level errors land INSIDE the statement's result
            // object with a 200 (the reference's compile-error contract,
            // e.g. "mixing aggregate and non-aggregate queries" —
            // tests/server_test.go:5401); parse and transport errors
            // still 400 at the request level below
            try resultObj(s, i)
            catch { case e: InfluxQL.StatementError =>
              s"""{"statement_id":$i,"error":${jsonStr(e.getMessage)}}"""
            }
          }
        // a KILL that landed before this query's job was submitted
        // cancels nothing (cancelJobGroup hits active jobs only) — the
        // killed flag closes that window: results are discarded
        if (rq.status == "killed")
          sys.error(s"query ${rq.qid} was killed")
        respond(ex, 200, s"""{"results":[${objs.mkString(",")}]}""")
      }

      } finally detachQuery(rq)
    } catch {
      case e: Throwable =>
        // a failure after chunked streaming began cannot 400 anymore —
        // headers are out; drop the connection like the reference does
        try respond(ex, 400,
          s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
        catch { case _: Throwable => ex.close() }
    }

  // ------------------------------------------------------------- /write
  private val TimeUnset = Long.MinValue

  private def handleWrite(ex: HttpExchange, v2: Boolean = false): Unit = {
    stats.writeReq.incrementAndGet(); stats.req.incrementAndGet()
    // syscontrol disableWrite (syscontrol.go:518): reject before parse
    if (writesDisabled) {
      respond(ex, 400, "{\"error\":\"disable write!\"}"); return
    }
    val _t0 = System.nanoTime()
    try handleWrite0(ex, v2)
    finally stats.writeReqDurationNs.addAndGet(System.nanoTime() - _t0)
  }

  private def handleWrite0(ex: HttpExchange, v2: Boolean): Unit =
    try {
      val p0 = params(ex, readBody = false)
      // v2: bucket → database (`bucket2dbrp`); missing bucket is a 404
      val p =
        if (!v2) p0
        else p0.get("bucket").filter(_.nonEmpty) match {
          case Some(b) => p0 + ("db" -> b.split("/", 2)(0))
          case None =>
            respond(ex, 404, s"""{"error":${jsonStr(
              "bucket name is required")}}""")
            return
        }
      if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
      val wdb = writeDb(ex, p).getOrElse(return)
      val mult = p.getOrElse("precision", "ns") match {
        case "ns" | "n" => 1L
        case "u" | "µ" => 1000L
        case "ms" => 1000000L
        case "s" => 1000000000L
        case "m" => 60L * 1000000000L
        case "h" => 3600L * 1000000000L
        case x => sys.error(s"invalid precision $x")
      }
      val nowNs = System.currentTimeMillis() * 1000000L
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val parsed = body.split('\n').toSeq
        .map(l => LineProtocol.parseLineFanned(l, TimeUnset))
      // tag-array fan-out writes DISTINCT rows even at one ns
      // (server_test.go:13187 keeps the plain tv9 point and the
      // array's tv9 point side by side) — skip the point merge for
      // the measurements a fanned line touched
      val fannedMsts = parsed.filter(_.size > 1)
        .flatMap(_.map(_.measurement)).toSet
      val pts = parsed.flatten
        .map(pt => pt.copy(
          time = if (pt.time == TimeUnset) nowNs else pt.time * mult))
      ingestPoints(wdb, pts, noMergeMsts = fannedMsts)
      ex.sendResponseHeaders(204, -1); ex.close()
    } catch {
      case e: Throwable =>
        stats.write400ErrReq.incrementAndGet()
        respond(ex, 400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }


  /** Shared ingest core for the write-family routes (/write, /api/v2/
    * write, logkeeper /records and /upload): fence registration, the
    * batch-level schema conflict gate, per-measurement table build +
    * persist + catalog merge. Callers respond; this throws on error. */
  private def ingestPoints(wdb: String,
                           pts: Seq[LineProtocol.Point],
                           mergeSameTime: Boolean = true,
                           noMergeMsts: Set[String] = Set.empty): Unit = {
    if (wdb == defaultDb) defaultDbTouched = true
    if (pts.isEmpty) sys.error("no points parsed")
    // fence registration rides the write path (fence.go:37
    // RewriteRows): rows in the `fence` measurement with an `id` tag
    // and a string `geometry` field register a fence (existing ids
    // are skipped, like the reference); the rows also land as
    // ordinary measurement data below
    val fenceRows = pts.filter(_.measurement == "fence")
    if (fenceRows.nonEmpty) synchronized {
      fenceRows.foreach { pt =>
        (pt.tags.get("id"), pt.stringFields.get("geometry")) match {
          case (Some(id), Some(geo)) if !fences.contains(id) =>
            try fences = fences + (id -> Fence.parse(id, geo))
            catch { case e: Exception =>
              System.err.println(
                s"[gateway] fence parse failed: ${e.getMessage}") }
          case _ =>
        }
      }
      persistFences()
    }
    // batch-level schema-on-write conflict gate (write_helper.go:463)
    val conflicts = pts.flatMap { pt =>
      (pt.floatFields.keys.map((pt.measurement, _, "float")) ++
        pt.intFields.keys.map((pt.measurement, _, "integer")) ++
        pt.boolFields.keys.map((pt.measurement, _, "boolean")) ++
        pt.stringFields.keys.map((pt.measurement, _, "string")))
    }.distinct.groupBy(t => (t._1, t._2)).filter(_._2.size > 1)
    if (conflicts.nonEmpty) {
      val (m, f) = conflicts.head._1
      sys.error(s"partial write: field type conflict: $m.$f")
    }
    synchronized {
      pts.groupBy(_.measurement).foreach { case (m, ps) =>
        val tagKeys = ps.flatMap(_.tags.keys).distinct.sorted
        val pdf = spark.createDataset(ps)(
          Encoders.product[LineProtocol.Point]).toDF()
        val tbl = LineProtocol.toMeasurementTable(pdf, m, tagKeys,
          ps.flatMap(_.floatFields.keys).distinct.sorted,
          ps.flatMap(_.intFields.keys).distinct.sorted,
          ps.flatMap(_.boolFields.keys).distinct.sorted,
          ps.flatMap(_.stringFields.keys).distinct.sorted)
        val key = dbKey(wdb, m)
        // log stores (logkeeper logstreams) append: same-ns rows are
        // distinct log records, never one point
        val doMerge = mergeSameTime && !logStores.contains(key) &&
          !noMergeMsts.contains(m)
        if (doMerge) {
          // intra-batch LWW resolved once; the persisted batch is the
          // canonical merged frame, so a restart's read-time dedup
          // (ordered by the per-batch __wseq stamp) reproduces exactly
          // the live catalog's point semantics
          val mtbl = HttpGateway.mergeBatch(tbl, tagKeys)
          persistBatch(key, mtbl, tagKeys, merged = true)
          val lo = ps.iterator.map(_.time).min
          val hi = ps.iterator.map(_.time).max
          // A batch that cannot collide with any existing point (its ns
          // window is disjoint from the measurement's KNOWN extent)
          // appends with a plain union — O(batch) per write, which is
          // the dominant TS ingest shape; only overlapping batches pay
          // the point-merge groupBy (the cluster-scale analogue is the
          // LSM compaction merging only overlapping shard groups).
          // Unknown extent (e.g. an init-catalog frame) merges — the
          // safe direction.
          val known: Option[(Long, Long)] = extentSeenNs.get(key)
            .orElse(catalog.get(key).flatMap(_.extentMs).map {
              case (a, b) => (a * 1000000L, (b + 1) * 1000000L) })
          val overlaps = known.forall { case (sLo, sHi) =>
            lo <= sHi && hi >= sLo }
          val merged = catalog.get(key) match {
            case Some(prev) if overlaps => InfluxQL.Measurement(
              maybeCompact(key, HttpGateway.mergePoints(
                prev.df, mtbl, (prev.tags ++ tagKeys).distinct)),
              (prev.tags ++ tagKeys).distinct, prev.time)
            case Some(prev) => InfluxQL.Measurement(
              maybeCompact(key,
                prev.df.unionByName(mtbl, allowMissingColumns = true)),
              (prev.tags ++ tagKeys).distinct, prev.time)
            case None => InfluxQL.Measurement(mtbl, tagKeys, "ts")
          }
          known match {
            case Some((sLo, sHi)) =>
              extentSeenNs(key) = (math.min(sLo, lo), math.max(sHi, hi))
            case None if !catalog.contains(key) =>
              // fresh measurement: every point came from writes, so the
              // tracked window IS the full extent
              extentSeenNs(key) = (lo, hi)
            case None => () // unknown-extent frame present: stay
              // unknown — every write keeps merging (safe direction);
              // a too-small "known" extent would skip a needed merge
          }
          catalog = catalog + (key -> merged)
        } else {
          persistBatch(key, tbl, tagKeys)
          val merged = catalog.get(key) match {
            case Some(prev) => InfluxQL.Measurement(
              maybeCompact(key,
                prev.df.unionByName(tbl, allowMissingColumns = true)),
              (prev.tags ++ tagKeys).distinct, prev.time)
            case None => InfluxQL.Measurement(tbl, tagKeys, "ts")
          }
          catalog = catalog + (key -> merged)
        }
      }
    }
    stats.pointsWrittenOK.addAndGet(pts.size)
  }

  /** Resolve the ingest database for a write-family route: missing/
    * empty db targets the default database; an uncreated one is the
    * reference's HTTP 404 (errno.HttpDatabaseNotFound). Returns None
    * after responding. */
  private def writeDb(ex: HttpExchange,
                      p: Map[String, String]): Option[String] = {
    val wdb = p.get("db").filter(_.nonEmpty).getOrElse(defaultDb)
    if (!databases.contains(wdb)) {
      respond(ex, 404, s"""{"error":${jsonStr(
        "write error: database not found!")}}""")
      None
    } else Some(wdb)
  }

  /** Arrow do-put (`services/arrowflight/service.go:291` DoPut): the
    * Flight descriptor's `{db, rp, mst}` arrive as query params
    * (`mst` required), the body is an Arrow IPC stream of record
    * batches — the same payload Flight carries, minus the gRPC
    * transport Spark's jar set does not ship ([[ArrowIngest]] header
    * documents the divergence). Batches append to the measurement
    * under the request database, write-privilege checked like every
    * other ingest route. */
  private def handleArrowDoPut(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = false)
      if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
      val wdb = writeDb(ex, p).getOrElse(return)
      val mst = p.getOrElse("mst", sys.error("missing measurement (mst)"))
      val (df, tagKeys) = graft.sources.ArrowIngest.decode(
        spark, ex.getRequestBody.readAllBytes())
      synchronized {
        val key = dbKey(wdb, mst)
        persistBatch(key, df, tagKeys)
        catalog = catalog + (key -> (catalog.get(key) match {
          case Some(prev) => InfluxQL.Measurement(
            maybeCompact(key,
              prev.df.unionByName(df, allowMissingColumns = true)),
            (prev.tags ++ tagKeys).distinct, prev.time)
          case None => InfluxQL.Measurement(df, tagKeys, "ts")
        }))
      }
      respond(ex, 200, s"""{"rows":${df.count()}}""")
    } catch {
      case e: Throwable =>
        respond(ex, 400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** Arrow do-get (`services/arrowflight/service.go:349` DoGet →
    * HandleQuery): run an InfluxQL statement and stream the result
    * back as Arrow IPC record batches. READ-guarded like /query;
    * `db`/`q` params mirror the Flight ticket; rows stream off
    * `toLocalIterator` capped at `http.max-row-limit` (the non-chunked
    * truncation contract). */
  private def handleArrowDoGet(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = true)
      val principal = authed(ex, p) match {
        case None => return
        case Some(pr) => pr
      }
      val q = p.getOrElse("q", sys.error("missing required parameter \"q\""))
      val reqDb = p.get("db").filter(_.nonEmpty).getOrElse(defaultDb)
      principal.foreach { user =>
        authorizeStatements(user, p.getOrElse("db", ""), Seq(q)).foreach {
          msg => respond(ex, 403, s"""{"error":${jsonStr(msg)}}"""); return
        }
      }
      if (!databases.contains(reqDb))
        sys.error(s"database not found: $reqDb")
      val (_, _, df) = InfluxQL.executeShaped(
        catalogFor(reqDb, principal), q)
      ex.getResponseHeaders.set("Content-Type",
        "application/vnd.apache.arrow.stream")
      ex.sendResponseHeaders(200, 0)
      val os = ex.getResponseBody
      try graft.sources.ArrowIngest.writeStream(df, os,
        maxRows = maxRowLimit.toLong)
      finally { os.close(); ex.close() }
    } catch {
      case e: Throwable =>
        try respond(ex, 400,
          s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
        catch { case _: Throwable => ex.close() }
    }

  /** Metric-store remote write (`handler_prom.go:91`
    * servePromWriteWithMetricStore): every series in the body lands in
    * the ONE measurement named by the URL's {metric_store}, `__name__`
    * kept as an ordinary label. The store is immediately queryable on
    * the scoped prom routes AND as an InfluxQL measurement. */
  private def handlePromStoreWrite(ex: HttpExchange, store: String): Unit =
    try {
      val p = params(ex, readBody = false)
      if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
      val body = ex.getRequestBody.readAllBytes()
      val series0 = PromRemoteWrite.decode(body)
      if (series0.isEmpty) sys.error("no timeseries in write request")
      // per-tenant write limits, tenant = the metric store (mst)
      val (series, partialErr) = filterInvalidSeries(store, series0)
      if (series.isEmpty)
        sys.error(partialErr.getOrElse("timeseries have no sample"))
      val (df, tagKeys) =
        PromRemoteWrite.toStoreMeasurement(spark, series, store)
      synchronized {
        val key = dbKey(defaultDb, store)
        persistBatch(key, df, tagKeys)
        // marker: a restart rebuilds the store registry from this dir
        persistPath(key).foreach { d =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d, "_promstore"), Array.empty[Byte])
        }
        catalog = catalog + (key -> (catalog.get(key) match {
          case Some(prev) => InfluxQL.Measurement(
            maybeCompact(key,
              prev.df.unionByName(df, allowMissingColumns = true)),
            (prev.tags ++ tagKeys).distinct, prev.time)
          case None => InfluxQL.Measurement(df, tagKeys, "ts")
        }))
        promStores = promStores + (store -> (promStores.get(store) match {
          case Some(prev) => prev.copy(
            df = maybeCompact(s"promstore:$store",
              prev.df.unionByName(df, allowMissingColumns = true)),
            labels = (prev.labels ++ tagKeys).distinct, extentMs = None)
          case None => PromQL.Metric(df, tagKeys, "ts", "value")
        }))
      }
      resultsCache.invalidateAll()
      partialErr match {
        // the valid series landed; a 400 carrying the first validation
        // error reports the dropped ones (servePromWriteBase:203)
        case Some(err) =>
          respond(ex, 400, s"""{"error":${jsonStr(err)}}""")
        case None => ex.sendResponseHeaders(204, -1); ex.close()
      }
    } catch {
      case e: Throwable =>
        respond(ex, 400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** Prometheus remote write (`handler_prom.go:86` servePromWrite): a
    * snappy+protobuf `WriteRequest` body ingested via
    * [[PromRemoteWrite]]. Series land in BOTH catalogs — as InfluxQL
    * measurements (tags + `value` field, like `timeSeries2Rows` rows)
    * and as PromQL metrics, immediately queryable from `/query` and
    * `/api/v1/query_range` alike. */
  private def handlePromWrite(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = false)
      if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
      val wdb = writeDb(ex, p).getOrElse(return)
      val body = ex.getRequestBody.readAllBytes()
      val series0 = PromRemoteWrite.decode(body)
      if (series0.isEmpty) sys.error("no timeseries in write request")
      // plain route: tenant = EmptyPromMst (servePromWrite passes "")
      val (series, promPartialErr) = filterInvalidSeries("", series0)
      if (series.isEmpty)
        sys.error(promPartialErr.getOrElse("timeseries have no sample"))
      synchronized {
        PromRemoteWrite.toMeasurements(spark, series).foreach {
          case (metric, (df, tagKeys)) =>
            val key = dbKey(wdb, metric)
            // the prom query surface is one namespace = the default
            // database; other dbs' series stay InfluxQL-queryable only
            persistBatch(key, df, tagKeys, prom = wdb == defaultDb)
            catalog = catalog + (key -> (catalog.get(key) match {
              case Some(prev) => InfluxQL.Measurement(
                maybeCompact(key,
                  prev.df.unionByName(df, allowMissingColumns = true)),
                (prev.tags ++ tagKeys).distinct, prev.time)
              case None => InfluxQL.Measurement(df, tagKeys, "ts")
            }))
            if (wdb == defaultDb)
              promCat = promCat + (metric -> (promCat.get(metric) match {
                case Some(prev) => prev.copy(
                  df = maybeCompact(s"prom:$metric",
                    prev.df.unionByName(df, allowMissingColumns = true)),
                  labels = (prev.labels ++ tagKeys).distinct,
                  extentMs = None)
                case None => PromQL.Metric(df, tagKeys, "ts", "value")
              }))
        }
      }
      resultsCache.invalidateAll()
      promPartialErr match {
        case Some(err) =>
          respond(ex, 400, s"""{"error":${jsonStr(err)}}""")
        case None => ex.sendResponseHeaders(204, -1); ex.close()
      }
    } catch {
      case e: Throwable =>
        respond(ex, 400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** OTLP metrics write (`handler_otlp.go:109`): gauge/sum data points
    * land as measurements named after the instrumentation scope, one
    * field per metric, attributes as tags (otlp_metrics_writer.go
    * schema). Success is an empty ExportMetricsServiceResponse. */
  private def handleOtlpWrite(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = false)
      if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
      val wdb = writeDb(ex, p).getOrElse(return)
      val samples = OtlpMetrics.decode(ex.getRequestBody.readAllBytes())
      if (samples.isEmpty) sys.error("no metric data points in request")
      synchronized {
        OtlpMetrics.toMeasurements(spark, samples).foreach {
          case (scope, (df, tagKeys)) =>
            val key = dbKey(wdb, scope)
            persistBatch(key, df, tagKeys)
            catalog = catalog + (key -> (catalog.get(key) match {
              case Some(prev) => InfluxQL.Measurement(
                maybeCompact(key,
                  prev.df.unionByName(df, allowMissingColumns = true)),
                (prev.tags ++ tagKeys).distinct, prev.time)
              case None => InfluxQL.Measurement(df, tagKeys, "ts")
            }))
        }
      }
      ex.getResponseHeaders.set("Content-Type", "application/x-protobuf")
      ex.sendResponseHeaders(200, -1); ex.close()
    } catch {
      case e: Throwable =>
        respond(ex, 400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** OTLP traces write (`handler_otlp.go:104` serveOtlpTracesWrite):
    * spans land in the `spans` measurement — trace_id/span_id tags,
    * duration_nano and friends as fields. */
  private def handleOtlpTraces(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = false)
      if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
      val wdb = writeDb(ex, p).getOrElse(return)
      val samples = OtlpTraces.decode(ex.getRequestBody.readAllBytes())
      if (samples.isEmpty) sys.error("no spans in request")
      synchronized {
        val (df, tagKeys) = OtlpTraces.toMeasurement(spark, samples)
        val name = dbKey(wdb, OtlpTraces.Measurement)
        persistBatch(name, df, tagKeys)
        catalog = catalog + (name -> (catalog.get(name) match {
          case Some(prev) => InfluxQL.Measurement(
            maybeCompact(name,
              prev.df.unionByName(df, allowMissingColumns = true)),
            (prev.tags ++ tagKeys).distinct, prev.time)
          case None => InfluxQL.Measurement(df, tagKeys, "ts")
        }))
      }
      ex.getResponseHeaders.set("Content-Type", "application/x-protobuf")
      ex.sendResponseHeaders(200, -1); ex.close()
    } catch {
      case e: Throwable =>
        respond(ex, 400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** OTLP logs write (`handler_otlp.go:114`): records land in the
    * `logs` measurement — severity/body fields, attrs as tags. */
  private def handleOtlpLogs(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = false)
      if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
      val wdb = writeDb(ex, p).getOrElse(return)
      val samples = OtlpLogs.decode(ex.getRequestBody.readAllBytes())
      if (samples.isEmpty) sys.error("no log records in request")
      synchronized {
        val (df, tagKeys) = OtlpLogs.toMeasurement(spark, samples)
        val name = dbKey(wdb, OtlpLogs.Measurement)
        persistBatch(name, df, tagKeys)
        catalog = catalog + (name -> (catalog.get(name) match {
          case Some(prev) => InfluxQL.Measurement(
            maybeCompact(name,
              prev.df.unionByName(df, allowMissingColumns = true)),
            (prev.tags ++ tagKeys).distinct, prev.time)
          case None => InfluxQL.Measurement(df, tagKeys, "ts")
        }))
      }
      ex.getResponseHeaders.set("Content-Type", "application/x-protobuf")
      ex.sendResponseHeaders(200, -1); ex.close()
    } catch {
      case e: Throwable =>
        respond(ex, 400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** Prometheus remote read (`handler_prom.go:303` servePromReadBase):
    * each decoded Query becomes a Spark range+matcher filter over the
    * matching metrics; raw samples come back as a snappy+protobuf
    * `ReadResponse`. Missing labels match the empty string, Prometheus
    * matcher semantics. */
  private def handlePromRead(ex: HttpExchange): Unit =
    try {
      if (guard(ex, params(ex, readBody = false),
          Auth.ReadPrivilege, "read from").isEmpty) return
      import org.apache.spark.sql.functions.{coalesce, col, lit, unix_millis}
      val queries =
        PromRemoteRead.decodeRequest(ex.getRequestBody.readAllBytes())
      if (queries.isEmpty) sys.error("no queries in read request")
      val results = queries.map { q =>
        val nameM = q.matchers.filter(_.name == PromRemoteWrite.MetricLabel)
        val labelM = q.matchers.filterNot(_.name == PromRemoteWrite.MetricLabel)
        promCat.toSeq.filter { case (name, _) => nameM.forall(_.matches(name)) }
          .sortBy(_._1)
          .flatMap { case (name, mt) =>
            val tus = unix_millis(col(mt.time))
            var df = mt.df.filter(tus >= q.startMs && tus <= q.endMs)
            labelM.foreach { m =>
              val c =
                if (df.columns.contains(m.name))
                  coalesce(col(m.name).cast("string"), lit(""))
                else lit("")
              df = df.filter(m.typ match {
                case 0 => c === m.value
                case 1 => c =!= m.value
                case 2 => c.rlike("^(?:" + m.value + ")$")
                case 3 => !c.rlike("^(?:" + m.value + ")$")
                case t => sys.error(s"unknown matcher type $t")
              })
            }
            // http.max-row-limit (config.go:37 DefaultMaxRowNum): bound
            // the driver-side collect like the reference bounds its
            // result emission — a wide-open read errs, not OOMs
            val rows = df.select(
              mt.labels.map(l =>
                coalesce(col(l).cast("string"), lit("")).as(l)) ++
                Seq(tus.as("_t"), col(mt.value).cast("double").as("_v")): _*)
              .limit(maxRowLimit + 1).collect()
            if (rows.length > maxRowLimit)
              sys.error(s"remote read exceeds max-row-limit ($maxRowLimit); " +
                "narrow the time range or matchers")
            rows.groupBy(r => mt.labels.map(l => r.getAs[String](l)))
              .toSeq.sortBy(_._1.mkString("\u0000"))
              .map { case (lv, rs) =>
                val labels = mt.labels.zip(lv).filter(_._2.nonEmpty).toMap +
                  (PromRemoteWrite.MetricLabel -> name)
                PromRemoteWrite.Series(labels,
                  rs.map(r => (r.getAs[Long]("_t"), r.getAs[Double]("_v")))
                    .sortBy(_._1).toSeq)
              }
          }
      }
      val body = PromRemoteRead.encodeResponse(results)
      ex.getResponseHeaders.set("Content-Type", "application/x-protobuf")
      ex.getResponseHeaders.set("Content-Encoding", "snappy")
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body); ex.close()
    } catch {
      case e: Throwable =>
        respond(ex, 400, s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  // ---------------------------------------------------------- /api/v1/…
  /** `15s` / `1m` / bare seconds → engine duration string. */
  private def stepOf(s: String): String = {
    val m = """^(\d+)(ms|s|m|h|d)?$""".r.findFirstMatchIn(s.trim)
      .getOrElse(sys.error(s"bad step: $s"))
    val n = m.group(1).toLong
    Option(m.group(2)).getOrElse("s") match {
      case "ms" => s"$n milliseconds"
      case "s" => s"$n seconds"
      case "m" => s"${n * 60} seconds"
      case "h" => s"${n * 3600} seconds"
      case "d" => s"${n * 86400} seconds"
    }
  }

  /** Prom time param: unix seconds (possibly fractional) or RFC3339. */
  private def promTimeMs(s: String): Long =
    try (s.toDouble * 1000.0).round
    catch {
      case _: NumberFormatException =>
        java.time.OffsetDateTime.parse(s.trim).toInstant.toEpochMilli
    }

  /** Go-style shortest float for sample values ("1" not "1.0"). */
  private def fmtVal(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v.isPosInfinity) "+Inf"
    else if (v.isNegInfinity) "-Inf"
    else if (v == v.toLong && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  private def fmtSec(ms: Long): String =
    if (ms % 1000 == 0) (ms / 1000).toString
    else (ms / 1000.0).toString

  // ------------------------------------------- prom metadata endpoints
  // (`httpd/handler.go:361-377`: servePromQueryLabels / LabelValues /
  // Series). Label names come from catalog metadata — no data pass;
  // label values and series run column-pruned distincts.

  private def promSuccess(ex: HttpExchange, dataJson: String): Unit =
    respond(ex, 200, s"""{"status":"success","data":$dataJson}""")

  /** Logkeeper repository CRUD (`handler_logstore.go:199-290`): a
    * repository IS a database. GET lists (raw sorted JSON array, the
    * reference's exact body shape); POST/DELETE create/drop. */
  private def handleRepository(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = true)
      val path = ex.getRequestURI.getPath
      val repo = "^/api/v1/repository/([^/]+)$".r
        .findFirstMatchIn(path).map(_.group(1))
      (ex.getRequestMethod.toUpperCase, repo) match {
        case ("GET", None) =>
          if (guard(ex, p, Auth.ReadPrivilege, "read from").isEmpty) return
          respond(ex, 200,
            databases.toSeq.sorted.map(jsonStr).mkString("[", ",", "]"))
        case ("POST", Some(r)) =>
          if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
          require(!r.startsWith("_") && !r.contains(' '),
            s"invalid repository name: $r")
          synchronized {
            if (databases.contains(r)) sys.error("repository already exists")
            databases = databases + r
            if (!retention.contains(r))
              retention = retention + (r -> Retention.autogen)
            persistDatabases()
          }
          respond(ex, 200, "{}")
        case ("DELETE", Some(r)) =>
          if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
          synchronized {
            if (!databases.contains(r)) sys.error("repository not found")
            databases = databases - r
            retention = retention - r
            val pre = r + " "
            catalog = catalog.filterNot(_._1.startsWith(pre))
            logStores = logStores.filterNot(_.startsWith(pre))
            persistDatabases(); persistLogStores()
          }
          respond(ex, 200, "{}")
        case (m, _) => respond(ex, 405, s"""{"error":"bad $m"}""")
      }
    } catch {
      case e: Throwable => respond(ex, 400,
        s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** Logkeeper logstream CRUD (`handler_logstore.go:351+`): a logstream
    * IS a measurement of its repository. Ingest/query ride the normal
    * /write and /query paths. */
  private def handleLogstream(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = true)
      val path = ex.getRequestURI.getPath
      val two = "^/api/v1/logstream/([^/]+)/([^/]+)$".r
        .findFirstMatchIn(path).map(m => (m.group(1), m.group(2)))
      val one = "^/api/v1/logstream/([^/]+)$".r
        .findFirstMatchIn(path).map(_.group(1))
      (ex.getRequestMethod.toUpperCase, two, one) match {
        case ("GET", None, Some(repo)) =>
          if (guard(ex, p, Auth.ReadPrivilege, "read from").isEmpty) return
          if (!databases.contains(repo)) sys.error("repository not found")
          respond(ex, 200, sliceOf(catalog, repo).keys.toSeq.sorted
            .map(jsonStr).mkString("[", ",", "]"))
        case ("POST", Some((repo, stream)), _) =>
          if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
          if (!databases.contains(repo)) sys.error("repository not found")
          synchronized {
            if (sliceOf(catalog, repo).contains(stream))
              sys.error("logstream already exists")
            import org.apache.spark.sql.types._
            val empty = spark.createDataFrame(
              java.util.Collections.emptyList[org.apache.spark.sql.Row](),
              StructType(Seq(StructField("time", LongType),
                StructField("ts", TimestampType))))
            catalog = catalog +
              (dbKey(repo, stream) -> InfluxQL.Measurement(empty, Nil, "ts"))
            logStores = logStores + dbKey(repo, stream)
            persistLogStores()
          }
          respond(ex, 200, "{}")
        case ("DELETE", Some((repo, stream)), _) =>
          if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
          synchronized {
            if (!sliceOf(catalog, repo).contains(stream))
              sys.error("logstream not found")
            catalog = catalog - dbKey(repo, stream)
            logStores = logStores - dbKey(repo, stream)
            persistLogStores()
          }
          respond(ex, 200, "{}")
        case (m, _, _) => respond(ex, 405, s"""{"error":"bad $m"}""")
      }
    } catch {
      case e: Throwable => respond(ex, 400,
        s"""{"error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** Logkeeper pipe-syntax queries (`handler.go:532-560` routes,
    * `handler_logstore_query.go` serveQueryLog / serveAggLogQuery /
    * serveAnalytics). The `query` param is `Ppl0 | Ppl1 | … [| SELECT …]`
    * ([[LogPipe.splitPplSql]]); PPL compiles onto the logstream frame
    * (extract columns + ANDed filter), the optional SELECT tail runs
    * through the InfluxQL executor with its FROM pinned to the stream —
    * the reference's rewriteStatementForLogStore source replacement.
    * Params mirror getQueryLogRequest: `from`/`to` epoch-ms (half-open),
    * `limit` (default 10, max 1000 — MaxLogLimit), `reverse` (default
    * true = newest first), `query`. All collects are limit-capped. */
  private def handleLogQueryRoutes(ex: HttpExchange): Unit =
    try {
      val t0 = System.nanoTime()
      val path = ex.getRequestURI.getPath
      val mc0 = LogRouteRx.consume.findFirstMatchIn(path)
      if (mc0.isDefined) {
        val mc = mc0.get
        handleConsumeRoutes(ex, t0, mc.group(1), mc.group(2), mc.group(3))
        return
      }
      val mw0 = LogRouteRx.ingest.findFirstMatchIn(path)
      if (mw0.isDefined) {
        val mw = mw0.get
        handleLogIngestRoutes(ex, mw.group(1), mw.group(2), mw.group(3))
        return
      }
      val mt0 = LogRouteRx.streamTask.findFirstMatchIn(path)
      if (mt0.isDefined) {
        val mt = mt0.get
        handleStreamTaskRoutes(ex, mt.group(1), mt.group(2),
          Option(mt.group(3)))
        return
      }
      val m0 = LogRouteRx.query.findFirstMatchIn(path).getOrElse {
        respond(ex, 404, """{"error":"unknown logkeeper route"}""")
        return
      }
      val (repo, stream, action) = (m0.group(1), m0.group(2), m0.group(3))
      val p = params(ex, readBody = true) + ("db" -> repo)
      if (guard(ex, p, Auth.ReadPrivilege, "read from").isEmpty) return
      if (!databases.contains(repo)) sys.error("repository not found")
      val meas = sliceOf(catalog, repo).getOrElse(stream,
        sys.error("logstream not found"))
      val fromMs = p.get("from").filter(_.nonEmpty).map(_.toLong)
        .getOrElse(0L)
      val toMs = p.get("to").filter(_.nonEmpty).map(_.toLong)
        .getOrElse(System.currentTimeMillis())
      require(fromMs <= toMs, "from value larger than to")
      val limit = math.min(
        p.get("limit").filter(_.nonEmpty).map(_.toInt).getOrElse(10), 1000)
      val reverse = p.get("reverse").filter(_.nonEmpty)
        .forall(_.toBoolean)
      val query = p.getOrElse("query", "")

      import org.apache.spark.sql.functions._
      val timeBound = meas.df.filter(
        unix_millis(col(meas.time)) >= fromMs &&
        unix_millis(col(meas.time)) < toMs)
      // __log___ resolves to the stream's content column (the logkeeper
      // write schema's log field), else its first string field
      val fullText =
        if (timeBound.columns.contains("content")) "content"
        else timeBound.schema.fields
          .find(_.dataType == org.apache.spark.sql.types.StringType)
          .map(_.name).getOrElse("content")
      val (ppl, sqlTail) = LogPipe.splitPplSql(query)
      val stmt =
        if (ppl.trim.nonEmpty) LogPipe.parse(ppl)
        else LogPipe.Statement(None, None)
      val frame = LogPipe.compile(timeBound, stmt, fullText)

      def msOf(v: Any): Any = v match {
        case ts: java.sql.Timestamp => ts.getTime
        case x => x
      }
      def cell(v: Any): String = msOf(v) match {
        case null => "null"
        case s: String => jsonStr(s)
        case b: Boolean => b.toString
        case n => n.toString
      }
      def tookMs = (System.nanoTime() - t0) / 1000000L

      action match {
        case "logs" =>
          val ordered = frame.orderBy(
            if (reverse) col(meas.time).desc else col(meas.time).asc)
          val rows = ordered.limit(limit).collect()
          val cols = logRenderCols(frame.columns.toSeq, meas.time)
          val logs = rows.map { r =>
            cols.map { c =>
              val i = r.fieldIndex(c)
              val v = if (c == meas.time) msOf(r.get(i)) else r.get(i)
              s"${jsonStr(if (c == meas.time) "time" else c)}:${cell(v)}"
            }.mkString("{", ",", "}")
          }.mkString("[", ",", "]")
          val keys = cols.map(c => if (c == meas.time) "time" else c)
          respond(ex, 200,
            s"""{"success":true,"code":"200","message":"",""" +
            s""""request_id":${jsonStr(java.util.UUID.randomUUID.toString)},""" +
            s""""count":${rows.length},"progress":"Complete",""" +
            s""""logs":$logs,"keys":${keys.map(jsonStr).mkString("[", ",", "]")},""" +
            s""""took_ms":$tookMs,"cursor_time":${if (reverse) toMs else fromMs},""" +
            s""""complete_progress":1.0,"scroll_id":""}""")
        case "histogram" =>
          // serveAggLogQuery: the pipe query + `select count(time)` per
          // adaptive bucket, zero-filled across [from, to) and edge
          // buckets clamped to the request range (GenZeroHistogram)
          val widthMs = LogPipe.adaptiveBucketMs(fromMs, toMs)
          val counts = frame
            .groupBy((floor(unix_millis(col(meas.time)) / widthMs)
              * widthMs).cast("long").as("_b"))
            .agg(count(lit(1)).as("_n"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val b0 = Math.floorDiv(fromMs, widthMs) * widthMs
          val hist = Iterator.iterate(b0)(_ + widthMs)
            .takeWhile(_ < toMs).map { b =>
              val from = math.max(b, fromMs)
              val to = math.min(b + widthMs, toMs)
              s"""{"from":$from,"to":$to,"count":${counts.getOrElse(b, 0L)}}"""
            }.mkString("[", ",", "]")
          val total = counts.valuesIterator.sum
          respond(ex, 200,
            s"""{"success":true,"code":"200","message":"",""" +
            s""""request_id":${jsonStr(java.util.UUID.randomUUID.toString)},""" +
            s""""count":$total,"progress":"1.000000","histograms":$hist,""" +
            s""""took_ms":$tookMs,"scroll_id":""}""")
        case "analytics" =>
          // serveAnalytics: no SELECT tail → the nil-request empty body
          sqlTail match {
            case None =>
              respond(ex, 200,
                s"""{"success":true,"code":"200","message":"",""" +
                s""""request_id":${jsonStr(java.util.UUID.randomUUID.toString)},""" +
                s""""total_size":0,"progress":"Complete","took_ms":$tookMs,""" +
                s""""scroll_id":""}""")
            case Some(sql) =>
              // rewriteStatementForLogStore pins the statement's source
              // to the logstream regardless of any FROM in the text —
              // execute against a one-measurement catalog of the
              // PPL-filtered frame, inserting the FROM when omitted
              val cat = Map(stream -> meas.copy(df = frame, extentMs = None))
              val out = InfluxQL.execute(cat, withFrom(sql, stream))
              val cols = out.columns.toSeq
              val dataCols = cols.filterNot(_ == "time") ++
                (if (cols.contains("time")) Seq("time") else Nil)
              val rows = out.limit(maxRowLimit + 1).collect()
              val header = dataCols.map(jsonStr).mkString("[", ",", "]")
              val body = rows.take(maxRowLimit).map { r =>
                dataCols.map { c =>
                  msOf(r.get(r.fieldIndex(c))) match {
                    case null => "\"\""
                    case d: Double => jsonStr(
                      if (d == d.floor && !d.isInfinite) d.toLong.toString
                      else d.toString)
                    case v => jsonStr(v.toString)
                  }
                }.mkString("[", ",", "]")
              }
              respond(ex, 200,
                s"""{"success":true,"code":"200","message":"",""" +
                s""""request_id":${jsonStr(java.util.UUID.randomUUID.toString)},""" +
                s""""total_size":${math.min(rows.length, maxRowLimit)},""" +
                s""""progress":"Complete","took_ms":$tookMs,"scroll_id":"",""" +
                s""""groupInfo":[],"dataset":${(header +: body).mkString("[", ",", "]")}}""")
          }
      }
    } catch {
      case e: Throwable => respond(ex, 400,
        s"""{"success":false,"code":"400","message":${
          jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** Pre-compiled logkeeper route patterns (per-request compile is
    * avoidable hot-path work). */
  private object LogRouteRx {
    val consume =
      ("^/repo/([^/]+)/logstreams/([^/]+)/" +
        "(consume/cursors|consume/logs|consume/cursor-time|context|" +
        "logbycursor|cursor(?:/[^/]*)?)$").r
    val ingest =
      "^/repo/([^/]+)/logstreams/([^/]+)/(records|upload|recalldata)$".r
    val streamTask =
      "^/repo/([^/]+)/logstreams/([^/]+)/stream-task(?:/([^/]+))?$".r
    val query =
      "^/repo/([^/]+)/logstreams/([^/]+)/(logs|histogram|analytics)$".r
  }

  /** Logkeeper ingest routes (`handler_logstore.go`): POST /records
    * (serveRecord :1653 — NDJSON or jsonArray log objects, `precision`
    * ns/us/ms/s with the reference's ms default, `mapping` JSON
    * renaming the timestamp key, `log-tags` header tags, gzip bodies;
    * rows that fail to parse land as fail-log rows tagged
    * `failLog=true` with the raw line as `content`, the reference's
    * fail-record stream), POST /upload (serveUpload :1833 — raw lines,
    * each becoming a `content` row stamped at request time) and POST
    * /recalldata (serveRecallData :3207 — revert a pending
    * retention-delete; deletion is immediate in this engine so a valid
    * target is an idempotent 200). All three reuse [[ingestPoints]],
    * so fence registration / schema conflict / persistence behave
    * exactly like /write. */
  private def handleLogIngestRoutes(ex: HttpExchange, repo: String,
                                    stream: String,
                                    action: String): Unit = {
    val p = params(ex, readBody = false) + ("db" -> repo)
    if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
    if (ex.getRequestMethod != "POST") {
      respond(ex, 405, "{\"error\":\"invalid method\"}"); return
    }
    if (!databases.contains(repo)) sys.error("repository not found")
    if (!sliceOf(catalog, repo).contains(stream))
      sys.error("logstream not found")
    if (action == "recalldata") { respond(ex, 200, ""); return }
    val rawBody = ex.getRequestBody.readAllBytes()
    val body =
      if (Option(ex.getRequestHeaders.getFirst("x-log-compresstype"))
          .contains("gzip")) {
        val gz = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(rawBody))
        try new String(gz.readAllBytes(), UTF_8) finally gz.close()
      } else new String(rawBody, UTF_8)
    val nowNs = System.currentTimeMillis() * 1000000L
    val logTags: Map[String, String] =
      Option(ex.getRequestHeaders.getFirst("log-tags"))
        .filter(_.nonEmpty)
        .map(MiniJson.parseObject(_).map { case (k, v) =>
          k -> String.valueOf(v) })
        .getOrElse(Map.empty)
    val pts: Seq[LineProtocol.Point] = action match {
      case "upload" =>
        body.split('\n').toSeq.filter(_.nonEmpty).map { line =>
          LineProtocol.Point(stream, logTags, Map.empty, Map.empty,
            Map.empty, Map("content" -> line), nowNs)
        }
      case _ => // records
        val mult = p.getOrElse("precision", "ms") match {
          case "ns" => 1L
          case "us" => 1000L
          case "ms" => 1000000L
          case "s" => 1000000000L
          case x => sys.error(s"invalid precision $x")
        }
        val mapping = p.get("mapping").filter(_.nonEmpty)
          .map(MiniJson.parseObject).getOrElse(Map.empty)
        val tsKey = mapping.get("timestamp")
          .map(String.valueOf(_)).getOrElse("time")
        def toPoint(m: Map[String, Any]): LineProtocol.Point = {
          var fl = Map.empty[String, Double]
          var st = Map.empty[String, String]
          var bo = Map.empty[String, Boolean]
          var t = nowNs
          m.foreach { case (k, v) =>
            if (k == tsKey) v match {
              case l2: java.lang.Long => t = l2 * mult // ns-exact
              case d: Double => t = d.toLong * mult
              case sStr: String => t = sStr.trim.toLong * mult
              case _ => ()
            } else v match {
              case sStr: String => st += k -> sStr
              case d: Double => fl += k -> d
              case l2: java.lang.Long => fl += k -> l2.toDouble
              case b: Boolean => bo += k -> b
              case null => ()
              case other => st += k -> MiniJson.render(other)
            }
          }
          LineProtocol.Point(stream, logTags, fl, Map.empty, bo, st, t)
        }
        def failPoint(raw: String): LineProtocol.Point =
          LineProtocol.Point(stream, logTags + ("failLog" -> "true"),
            Map.empty, Map.empty, Map.empty,
            Map("content" -> raw), nowNs)
        p.getOrElse("type", "json").toLowerCase match {
          case "" | "json" =>
            body.split('\n').toSeq.filter(_.trim.nonEmpty).map { line =>
              try toPoint(MiniJson.parseObject(line))
              catch { case _: Exception => failPoint(line) }
            }
          case "jsonarray" =>
            (MiniJson.parse(body) match {
              case xs: Vector[_] => xs
              case _ => sys.error("invalid log data type")
            }).map {
              case m: Map[_, _] =>
                // same per-record fallback as the NDJSON arm: one bad
                // record becomes a fail-log row, not a batch 400
                try toPoint(m.asInstanceOf[Map[String, Any]])
                catch { case _: Exception =>
                  failPoint(MiniJson.render(m)) }
              case other => failPoint(MiniJson.render(other))
            }
          case _ => sys.error("invalid log data type")
        }
    }
    if (pts.isEmpty) sys.error("no logs parsed")
    // logkeeper streams are LOG stores: rows at the same ns are
    // distinct records, never merged into one point
    ingestPoints(repo, pts, mergeSameTime = false)
    respond(ex, 200, "")
  }

  /** Logkeeper stream tasks (`handler_logstore_stream.go`): POST
    * creates a continuous stream view over the logstream — body
    * `{"query": "<ppl|sql>", "id": "<taskId>"}`, aggregations limited
    * to min/max/sum/count (streamSupportMap :31, StreamCheck), the
    * view measurement named `view-<logStream>-<id>`
    * (rewriteLogStream :146). Re-expressed on the engine's existing
    * stream registry: the task compiles to a canonical CREATE STREAM
    * statement, journals like every other stream, and flushes under
    * the same sweep. DELETE /stream-task/{taskId} drops it. */
  private def handleStreamTaskRoutes(ex: HttpExchange, repo: String,
                                     stream: String,
                                     taskId: Option[String]): Unit = {
    val p = params(ex, readBody = false) + ("db" -> repo)
    if (guard(ex, p, Auth.WritePrivilege, "write to").isEmpty) return
    if (!databases.contains(repo)) sys.error("repository not found")
    if (!sliceOf(catalog, repo).contains(stream))
      sys.error("logstream not found")
    (ex.getRequestMethod, taskId) match {
      case ("POST", None) =>
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val cfg = MiniJson.parseObject(body)
        val id = cfg.get("id").map(String.valueOf(_))
          .filter(_.nonEmpty).getOrElse(sys.error("id is required"))
        val query = cfg.get("query").map(String.valueOf(_))
          .filter(_.nonEmpty).getOrElse(sys.error("query is required"))
        // a pipe-less `select …` is pure SQL (getPureSqlQuery arm);
        // otherwise the SELECT is the query's last pipe segment
        val (_, sqlTail) = LogPipe.splitPplSql(query)
        val sql = sqlTail.getOrElse {
          if (query.trim.toLowerCase.startsWith("select")) query.trim
          else sys.error("query needs a SELECT")
        }
        val view = s"view-$stream-$id"
        val ddl = s"CREATE STREAM '$id' INTO '$view' ON " +
          withFrom(sql.trim, stream)
        // StreamCheck: only min/max/sum/count stream-aggregate
        val st = graft.streaming.StreamDDL.parse(ddl)
        val bad = st.calls.map(_._1)
          .filterNot(Set("min", "max", "sum", "count"))
        require(bad.isEmpty,
          s"unsupported call in stream task: ${bad.mkString(",")}")
        require(st.from == stream, "stream task must read its logstream")
        synchronized { registerStream(repo, ddl, Long.MinValue)
          persistDdl() }
        respond(ex, 200, s"""{"query":${jsonStr(ddl)},""" +
          s""""repo":${jsonStr(repo)},"logStream":${jsonStr(view)}}""")
      case ("DELETE", Some(id)) =>
        synchronized {
          if (!streamRegistry.contains((repo, id)))
            sys.error(s"stream task not found: $id")
          streamRegistry = streamRegistry - ((repo, id))
          persistDdl()
        }
        respond(ex, 200, "{}")
      case (m, t) => respond(ex, 405,
        s"""{"error":"bad stream-task request: $m $t"}""")
    }
  }

  /** Logkeeper consume surface (`handler_logstore_consume.go`): the
    * Kafka-like cursor consumption API. Cursor wire format replicated
    * exactly ([[Consume]]); positions re-expressed as
    * (timestamp ns, rows-consumed-at-timestamp) over the time-ordered
    * measurement frame — ties inside a timestamp ordered by a
    * deterministic row hash so repeated polls are stable regardless of
    * scan parallelism. `logbycursor` / `cursor[/x]` are EMPTY handlers
    * in the reference (serveQueryLogByCursor :57, serveGetCursor /
    * servePullLog :1006-1008) and mirror that here: authed 200, no body.
    * All collects are (skip + count + 1)-bounded with skip capped at
    * maxRowLimit. */
  private def handleConsumeRoutes(ex: HttpExchange, t0: Long,
                                  repo: String, stream: String,
                                  action: String): Unit = {
    val p = params(ex, readBody = false) + ("db" -> repo)
    if (guard(ex, p, Auth.ReadPrivilege, "read from").isEmpty) return
    if (action == "logbycursor" || action.startsWith("cursor")) {
      respond(ex, 200, ""); return
    }
    if (!databases.contains(repo)) sys.error("repository not found")
    val meas = sliceOf(catalog, repo).getOrElse(stream,
      sys.error("logstream not found"))
    import org.apache.spark.sql.functions._
    def tookMs = (System.nanoTime() - t0) / 1000000L
    def jnum(l: Long) = l.toString
    // ns-exact epoch for a logstream frame: prefer the raw ingest-time
    // `time` long column (exact ns) over unix_millis(ts) (ms-floored)
    def nsEpochExpr(m: graft.query.InfluxQL.Measurement) =
      if (m.time != "time" && m.df.columns.contains("time") &&
          m.df.schema("time").dataType ==
            org.apache.spark.sql.types.LongType) col("time")
      else unix_millis(col(m.time)) * 1000000L
    def renderCols(m: graft.query.InfluxQL.Measurement): Seq[String] =
      logRenderCols(m.df.columns.toSeq, m.time)

    action match {
      case "consume/cursors" =>
        // getQueryConsumeCursorsRequest: from/end in epoch-ns, end
        // optional (hasEnd), task_num capped at the pt count (= 1 here)
        val fromNs = p.get("from").filter(_.nonEmpty).map(_.toLong)
          .getOrElse(0L)
        val endOpt = p.get("end").filter(_.nonEmpty).map(_.toLong)
        require(endOpt.forall(fromNs < _),
          "from value must be lower than end value")
        val taskNum = math.max(1,
          p.get("task_num").filter(_.nonEmpty).map(_.toInt).getOrElse(1))
        val fromCur = Consume.mint(fromNs, stream, reverse = false,
          taskNum = taskNum)
        val endPart = endOpt.map { e =>
          s""","end_cursor":${jsonStr(
            Consume.mint(e - 1, stream, reverse = true,
              taskNum = taskNum).encode)}"""
        }.getOrElse(",\"end_cursor\":\"\"")
        respond(ex, 200,
          s"""[{"from_cursor":${jsonStr(fromCur.encode)}${endPart}}]""")

      case "consume/cursor-time" =>
        // serveConsumeCursorTime: min/max task timestamps, ns -> ms
        val cur = Consume.decode(p.get("cursor").filter(_.nonEmpty)
          .getOrElse(sys.error("cursor is illegal")))
        val ts = cur.tasks.map(_.curr.timestamp)
        val (t, maxT) =
          if (ts.isEmpty) (cur.time, cur.time)
          else if (cur.reverse) (ts.max, ts.min)
          else (ts.min, ts.max)
        respond(ex, 200, s"""{"cursor_time":${jnum(t / 1000000L)},""" +
          s""""max_cursor_time":${jnum(maxT / 1000000L)}}""")

      case "consume/logs" =>
        val fromCur = Consume.decode(p.get("from_cursor")
          .filter(_.nonEmpty)
          .getOrElse(sys.error("from_cursor is illegal")))
        val endRaw = p.get("end_cursor").filter(_.nonEmpty)
        val endCur = endRaw.map(Consume.decode)
        val count = p.get("count").filter(_.nonEmpty).map(_.toInt)
          .getOrElse(10)
        require(count > 0 && count <= 100, "count value is illegal")
        val task = fromCur.tasks.headOption
          .getOrElse(sys.error("cursor task num is not illegal"))
        val tNs = task.curr.timestamp
        val skip = task.curr.blockId
        require(skip >= 0 && skip <= maxRowLimit, "cursor is illegal")
        val endNs = endCur.map(_.time + 1).getOrElse(Long.MaxValue)
        // Ingested frames carry the exact ns epoch in the raw `time`
        // long (ingestPoints → toMeasurementTable); `ts` is µs-rounded.
        // Use it for _ns so an ns-precision from-cursor never skips the
        // partial-millisecond rows, and drop it from the rendered row
        // (meas.time is renamed to "time" there — two keys otherwise).
        val frameNs = nsEpochExpr(meas)
        val srcCols = renderCols(meas)
        val frame = meas.df
          .withColumn("_ns", frameNs)
          .withColumn("_h",
            xxhash64(to_json(struct(srcCols.map(col): _*))))
          .filter(col("_ns") >= tNs && col("_ns") < endNs)
          .orderBy(col("_ns").asc, col("_h").asc)
        val rows0 = frame.limit((skip + count + 1).toInt).collect()
        val nsIdx = rows0.headOption.map(_.fieldIndex("_ns")).getOrElse(0)
        // skip = rows already consumed at exactly the cursor timestamp
        var toSkip = skip
        val afterSkip = rows0.dropWhile { r =>
          val more = toSkip > 0 && r.getLong(nsIdx) == tNs
          if (more) toSkip -= 1
          more
        }
        val skipped = skip - toSkip
        val batch = afterSkip.take(count)
        val isComplete = afterSkip.length <= count
        def cell(v: Any): String = v match {
          case null => "null"
          case s: String => jsonStr(s)
          case b: Boolean => b.toString
          case ts: java.sql.Timestamp => ts.getTime.toString
          case n => n.toString
        }
        val logs = batch.map { r =>
          srcCols.map { c =>
            if (c == meas.time)
              s""""time":${r.getLong(nsIdx)}"""
            else s"${jsonStr(c)}:${cell(r.get(r.fieldIndex(c)))}"
          }.mkString("{", ",", "}")
        }.mkString("[", ",", "]")
        val newCur = batch.lastOption.map { last =>
          val lastNs = last.getLong(nsIdx)
          val atLast = batch.count(_.getLong(nsIdx) == lastNs) +
            (if (lastNs == tNs) skipped else 0L)
          fromCur.copy(time = lastNs, tasks = Seq(task.copy(
            curr = task.curr.copy(timestamp = lastNs, blockId = atLast))))
        }.getOrElse(fromCur)
        val maxLog = batch.lastOption.map(_.getLong(nsIdx)).getOrElse(0L)
        respond(ex, 200,
          s"""{"is_complete":$isComplete,"total_count":${batch.length},""" +
          s""""max_log_time":$maxLog,"took_ms":$tookMs,"logs":$logs,""" +
          s""""from_cursor":${jsonStr(newCur.encode)}""" +
          endRaw.map(e => s""","end_cursor":${jsonStr(e)}""").getOrElse("") +
          "}")

      case "context" =>
        // serveContextQueryLog: the logs query re-bounded at a scroll
        // cursor pivot (parseScrollID's simple `^^<ns>` / `ns|x|seq^…`
        // forms), direction forward|backward
        val direction = p.getOrElse("direction", "")
        val reverse = direction match {
          case "backward" => true
          case "forward" | "" => false
          case _ => sys.error("direction value is illegal")
        }
        val rawCur = p.get("cursor").filter(_.nonEmpty)
          .getOrElse(sys.error("no cursor"))
        val dec = new String(
          java.util.Base64.getDecoder.decode(rawCur), "UTF-8")
        val parts = dec.split("\\^", 3)
        require(parts.length == 3, "wrong scroll_id")
        // "^^<ns>" splits to ["", "", ns]; "<ns|x|seq>^a^b" carries the
        // pivot in the first component (parseScrollID's two arms)
        val pivotNs =
          if (parts(0).isEmpty)
            (if (parts(1).nonEmpty) parts(1) else parts(2)).toLong
          else parts(0).split("\\|")(0).toLong
        val fromMs = p.get("from").filter(_.nonEmpty).map(_.toLong)
          .getOrElse(0L)
        val toMs = p.get("to").filter(_.nonEmpty).map(_.toLong)
          .getOrElse(System.currentTimeMillis())
        require(fromMs <= toMs, "from value larger than to")
        val limit = math.min(p.get("limit").filter(_.nonEmpty)
          .map(_.toInt).getOrElse(10), 1000)
        val query = p.getOrElse("query", "")
        val (ppl, _) = LogPipe.splitPplSql(query)
        val stmt =
          if (ppl.trim.nonEmpty) LogPipe.parse(ppl)
          else LogPipe.Statement(None, None)
        val fullText =
          if (meas.df.columns.contains("content")) "content"
          else meas.df.schema.fields
            .find(_.dataType == org.apache.spark.sql.types.StringType)
            .map(_.name).getOrElse("content")
        val base = meas.df
          .withColumn("_ns", nsEpochExpr(meas))
        val bounded =
          if (reverse)
            base.filter(col("_ns") >= fromMs * 1000000L &&
              col("_ns") < math.min(toMs * 1000000L, pivotNs))
          else
            base.filter(col("_ns") >= math.max(fromMs * 1000000L, pivotNs)
              && col("_ns") < toMs * 1000000L)
        val frame = LogPipe.compile(bounded, stmt, fullText)
          .orderBy(if (reverse) col(meas.time).desc else col(meas.time).asc)
        val rows = frame.limit(limit).collect()
        def cellc(v: Any): String = v match {
          case null => "null"
          case s: String => jsonStr(s)
          case b: Boolean => b.toString
          case ts: java.sql.Timestamp => ts.getTime.toString
          case n => n.toString
        }
        val cols = logRenderCols(
          frame.columns.toSeq.filterNot(_ == "_ns"), meas.time)
        val logs = rows.map { r =>
          cols.map { c =>
            val v = r.get(r.fieldIndex(c))
            s"${jsonStr(if (c == meas.time) "time" else c)}:${cellc(v)}"
          }.mkString("{", ",", "}")
        }.mkString("[", ",", "]")
        val keys = cols.map(c => if (c == meas.time) "time" else c)
        respond(ex, 200,
          s"""{"success":true,"code":"200","message":"",""" +
          s""""request_id":${jsonStr(java.util.UUID.randomUUID.toString)},""" +
          s""""count":${rows.length},"progress":"Complete",""" +
          s""""logs":$logs,"keys":${keys.map(jsonStr).mkString("[", ",", "]")},""" +
          s""""took_ms":$tookMs,"cursor_time":${pivotNs / 1000000L},""" +
          s""""complete_progress":1.0,"scroll_id":""}""")
    }
  }

  /** Insert `FROM "stream"` into a SELECT that omitted it — the analytics
    * tail usually reads `select count(time)` and relies on the handler
    * pinning the source (rewriteStatementForLogStore). */
  private def withFrom(sql: String, stream: String): String = {
    val lower = sql.toLowerCase
    if (lower.matches("(?s).*\\bfrom\\b.*")) sql
    else {
      val cut = Seq(" group by", " order by", " where", " limit",
          " offset", " slimit", " soffset")
        .map(k => lower.indexOf(k)).filter(_ >= 0)
        .reduceOption(math.min).getOrElse(sql.length)
      sql.substring(0, cut) + s""" FROM "$stream"""" + sql.substring(cut)
    }
  }

  private def handleLabels(ex: HttpExchange): Unit =
    try {
      if (guard(ex, params(ex, readBody = false),
          Auth.ReadPrivilege, "read from").isEmpty) return
      val names = ("__name__" +: promCat.values.flatMap(_.labels).toSeq)
        .distinct.sorted
      promSuccess(ex, names.map(jsonStr).mkString("[", ",", "]"))
    } catch {
      case e: Throwable => respond(ex, 400,
        s"""{"status":"error","error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  private def handleLabelValues(ex: HttpExchange): Unit =
    try {
      if (guard(ex, params(ex, readBody = false),
          Auth.ReadPrivilege, "read from").isEmpty) return
      val path = ex.getRequestURI.getPath
      val m = "^/api/v1/label/([^/]+)/values$".r.findFirstMatchIn(path)
        .getOrElse(sys.error(s"bad label values path: $path"))
      val label = decode(m.group(1))
      val values =
        if (label == "__name__") promCat.keys.toSeq.sorted
        else promCat.values.toSeq.filter(_.labels.contains(label))
          .flatMap { mt =>
            mt.df.select(org.apache.spark.sql.functions.col(label))
              .distinct().collect()
              .map(r => String.valueOf(r.get(0)))
          }.filter(v => v != null && v.nonEmpty && v != "null")
          .distinct.sorted
      promSuccess(ex, values.map(jsonStr).mkString("[", ",", "]"))
    } catch {
      case e: Throwable => respond(ex, 400,
        s"""{"status":"error","error":${jsonStr(String.valueOf(e.getMessage))}}""")
    }

  private def handleSeries(ex: HttpExchange): Unit =
    try {
      val p = params(ex, readBody = true)
      if (guard(ex, p, Auth.ReadPrivilege, "read from").isEmpty) return
      val sel = p.getOrElse("match[]",
        sys.error("""missing required parameter "match[]""""))
      PromQL.parse(sel) match {
        case s: PromQL.Sel =>
          val mt = promCat.getOrElse(s.name,
            sys.error(s"unknown metric ${s.name}"))
          var df = mt.df
          s.matchers.foreach { case (label, op, v) =>
            import org.apache.spark.sql.functions.{col, lit}
            val c = if (df.columns.contains(label)) col(label) else lit("")
            df = df.filter(op match {
              case "=" => c === v
              case "!=" => c =!= v
              case "=~" => c.rlike("^(?:" + v + ")$")
              case "!~" => !c.rlike("^(?:" + v + ")$")
            })
          }
          val rows = df
            .select(mt.labels.map(org.apache.spark.sql.functions.col): _*)
            .distinct().limit(1000).collect()
          val sets = rows.map { r =>
            val pairs = (s"""${jsonStr("__name__")}:${jsonStr(s.name)}""" +:
              mt.labels.zipWithIndex.collect {
                case (l, i) if r.get(i) != null &&
                    String.valueOf(r.get(i)).nonEmpty =>
                  s"${jsonStr(l)}:${jsonStr(String.valueOf(r.get(i)))}"
              })
            pairs.mkString("{", ",", "}")
          }
          promSuccess(ex, sets.sorted.mkString("[", ",", "]"))
        case other => sys.error(s"match[] must be a selector, got $other")
      }
    } catch {
      case e: Throwable => respond(ex, 400,
        s"""{"status":"error","errorType":"bad_data","error":${
          jsonStr(String.valueOf(e.getMessage))}}""")
    }

  /** One collected (series, step) sample — the results-cache payload. */
  private case class Sample(labels: Seq[(String, String)], evalMs: Long,
                            value: Double)

  /** Evaluate `query` over `[loMs, hiMs]` and collect samples. */
  private def collectSamples(cat: Map[String, PromQL.Metric],
                             query: String, step: String,
                             loMs: Long, hiMs: Long): Seq[Sample] = {
    val df = PromQL.evaluate(cat, query, step,
      boundsMs = Some((loMs, hiMs)))
    val labelCols = df.columns.filterNot(Set("eval_ms", "value")).toSeq
    // driver-protection cap, like every other gateway collect
    // (`http.max-row-limit`, handler.go getResultRowsCnt): a hostile
    // step/range combination must error, not materialize unbounded
    // rows on the driver — Prometheus's own "too many samples" refusal
    val rows = df.limit(maxRowLimit + 1).collect()
    if (rows.length > maxRowLimit) sys.error(
      s"query processing would load too many samples into memory: " +
        s"more than max-row-limit ($maxRowLimit) — reduce the range " +
        s"or increase the step")
    rows.toSeq
      .map(r => Sample(labelCols.map(c => c -> r.getAs[String](c)),
        r.getAs[Long]("eval_ms"), r.getAs[Double]("value")))
      .filter(s => s.evalMs >= loMs && s.evalMs <= hiMs)
  }

  private def handleProm(ex: HttpExchange, range: Boolean,
                         cat: () => Map[String, PromQL.Metric] = () => promCat,
                         cacheKeyPrefix: String = "",
                         tenant: String = ""): Unit =
    try {
      val cat0 = cat()
      val p = params(ex, readBody = true)
      if (guard(ex, p, Auth.ReadPrivilege, "read from").isEmpty) return
      val query = p.getOrElse("query",
        sys.error("missing required parameter \"query\""))
      // instant queries evaluate the last 5m of buckets ending at `time`
      // and report the freshest one — Prometheus's instant-vector
      // lookback (its staleness delta), over this engine's step-bucketed
      // evaluation.
      val lookbackMs = 300000L
      val (loMs, hiMs, step) =
        if (range) {
          val lo = promTimeMs(p.getOrElse("start", sys.error("missing start")))
          val hi = promTimeMs(p.getOrElse("end", sys.error("missing end")))
          (lo, hi, stepOf(p.getOrElse("step", sys.error("missing step"))))
        } else {
          val t = promTimeMs(p.getOrElse("time", sys.error("missing time")))
          (t - lookbackMs, t, "1 seconds")
        }
      // per-tenant max query length (validate.go:172, enforced at the
      // prom query entry like handler_prom_util.go:498) — RANGE queries
      // only: an instant query's (lo, hi) is the synthesized 5-minute
      // lookback, not a user-requested range, and must not trip a
      // sub-5-minute limit
      val rangeErr =
        if (range) Validation.validateQueryTimeRange(
          runtimeOverrides.limitsFor(tenant), loMs, hiMs)
        else None
      if (rangeErr.isDefined) {
        respond(ex, 400, s"""{"status":"error","errorType":"bad_data",""" +
          s""""error":${jsonStr(rangeErr.get)}}""")
        return
      }
      // range queries flow through the extent-splitting results cache
      // (`results_cache.go`); `Cache-Control: no-store` opts out like
      // the reference's shouldCache. Queries pinned with `@ start()`/
      // `@ end()` bypass it entirely (Cortex isAtModifierCachable):
      // their pins resolve from the request bounds, so cached extents
      // are not reusable across requests and gap evaluation with gap
      // sub-range bounds would silently shift the pin.
      val noStore =
        Option(ex.getRequestHeaders.getFirst("Cache-Control"))
          .exists(_.contains("no-store"))
      val samples =
        if (range && !noStore && !PromQL.usesBoundRelativeAt(query))
          resultsCache.fetch(s"$cacheKeyPrefix$query|$step", loMs, hiMs,
            System.currentTimeMillis())(
            collectSamples(cat0, query, step, _, _))
        else collectSamples(cat0, query, step, loMs, hiMs)
      val grouped = samples.groupBy(_.labels)
        .toSeq.sortBy(_._1.map(_._2).mkString(" "))
      val result = grouped.flatMap { case (labels, rs) =>
        val metric = labels.filter(_._2 != null).filter(_._2.nonEmpty)
          .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }
          .mkString("{", ",", "}")
        val inWindow = rs.sortBy(_.evalMs)
        if (range) {
          val vals = inWindow.map(s =>
            s"[${fmtSec(s.evalMs)},${jsonStr(fmtVal(s.value))}]")
          Some(s"""{"metric":$metric,"values":${
            vals.mkString("[", ",", "]")}}""")
        } else inWindow.lastOption.map { s =>
          val v = s"[${fmtSec(hiMs)},${jsonStr(fmtVal(s.value))}]"
          s"""{"metric":$metric,"value":$v}"""
        }
      }.mkString("[", ",", "]")
      val rt = if (range) "matrix" else "vector"
      respond(ex, 200,
        s"""{"status":"success","data":{"resultType":"$rt","result":$result}}""")
    } catch {
      case e: Throwable =>
        respond(ex, 400,
          s"""{"status":"error","errorType":"bad_data","error":${
            jsonStr(String.valueOf(e.getMessage))}}""")
    }
}

object HttpGateway {
  /** Series value-column order: `time` first, then non-tag columns in
    * plan order — the reference's models.Rows column contract. */
  def shapedValueCols(cols: Seq[String], tags: Seq[String]): Seq[String] =
    (if (cols.contains("time")) Seq("time") else Nil) ++
      cols.filterNot(c => tags.contains(c) || c == "time")

  /** InfluxDB point identity: one row per (series, ns-timestamp). A
    * later write to the same point MERGES field-by-field, last write
    * winning per field (the reference's storage dedups on read —
    * `tsreader/iterator.go` newest-wins; e2e Where_Fields writes
    * alert_id and tenant_id as separate lines at one ns and reads ONE
    * row). At cluster scale this is the LSM compaction's job; the
    * resident gateway frames stay canonical by merging at write time,
    * so every read path gets point semantics for free. */
  /** NOTE: references `prev` exactly ONCE — a caller must never split
    * prev into two subtrees per write (filter-in ∪ merge(filter-out)
    * doubles the logical plan per write: 33 writes = 2^33 analysis
    * nodes). The append-vs-overwrite decision lives in the caller
    * (ingestPoints tracks each measurement's known ns extent and skips
    * the merge entirely for non-overlapping batches). */
  private[server] def mergePoints(prev: org.apache.spark.sql.DataFrame,
                                  fresh: org.apache.spark.sql.DataFrame,
                                  tagKeys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // prev is already one-row-per-point; any fresh row outranks it —
    // and REPLACES the point wholly (a field absent from the newest
    // write reads null afterwards: NilColumn re-writes (china,ada)
    // without address and count_address drops to 1)
    val all = prev.withColumn("__ds_seq", lit(0L)).unionByName(
      fresh.withColumn("__ds_seq", monotonically_increasing_id() + 1),
      allowMissingColumns = true)
    dedupPoints(all, tagKeys, fieldUnion = false)
  }

  /** Read-time point dedup for restart-restored frames: batches persist
    * ALREADY intra-batch-merged with a per-batch `__wseq` write-order
    * stamp, so across batches the newest stamped row wins per field —
    * the same LWW a live gateway applied at write time (the reference
    * dedups on read the same way, `tsreader/iterator.go` newest-wins).
    * Legacy rows without the stamp sort oldest. */
  private[server] def dedupPersisted(df: org.apache.spark.sql.DataFrame,
                                     tagKeys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val seqd =
      if (df.columns.contains("__wseq"))
        df.withColumn("__ds_seq", coalesce(col("__wseq"), lit(0L)))
          .drop("__wseq")
      else df.withColumn("__ds_seq", lit(0L))
    dedupPoints(seqd, tagKeys.filter(df.columns.contains),
      fieldUnion = false)
  }

  /** [[mergePoints]] for a single batch (line order = write order). */
  private[server] def mergeBatch(tbl: org.apache.spark.sql.DataFrame,
                                 tagKeys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    dedupPoints(tbl.withColumn("__ds_seq", monotonically_increasing_id()),
      tagKeys, fieldUnion = true)
  }

  /** `fieldUnion = true` merges same-point rows field-wise (lines of
    * ONE batch union their fields, newest line winning per field);
    * `false` is the cross-batch rule — the newest ROW replaces the
    * point wholly, absent fields read null (the reference's read-time
    * dedup takes the newest row, `tsreader/iterator.go`). */
  private def dedupPoints(all: org.apache.spark.sql.DataFrame,
                          tagKeys: Seq[String],
                          fieldUnion: Boolean)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // field/tag names may contain dots (`foo.bar.baz` — LP escaped
    // names); always backtick-quote
    def qc(c: String) = col(s"`$c`")
    val keys = tagKeys :+ "time"
    val fields = all.columns
      .filterNot(c => keys.contains(c) || c == "ts" || c == "__ds_seq")
    if (fields.isEmpty)
      return all.dropDuplicates(keys).drop("__ds_seq")
    val aggs = fields.map(f =>
      if (fieldUnion)
        max_by(qc(f), when(qc(f).isNotNull, col("__ds_seq"))).as(f)
      else max_by(qc(f), col("__ds_seq")).as(f))
    val merged = all.groupBy(keys.map(qc): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("ts", timestamp_micros(expr("time div 1000")))
    // restore the ingest column order (tags, fields, time, ts)
    merged.select((tagKeys ++ fields ++ Seq("time", "ts")).map(qc): _*)
  }
}
