package graft.server

/** Logkeeper consume cursors — the Kafka-like "give me cursors, then
  * poll batches from a cursor" consumption API of the reference's
  * `httpd/consume/consume.go` + `handler_logstore_consume.go`.
  *
  * The WIRE FORMAT is replicated exactly (consume.go:154-325):
  * a pipe-delimited cursor string
  * `reverse|taskNum|cursorID|currTotalPtNum|time|nTasks|(task)…`,
  * task = `(ptId^preTask^currTask)` with currTask
  * `sgId|metaIndexId|blockId|timestamp|remotePath`, then
  * gzip-compressed and base64 (StdEncoding) — a cursor minted by the
  * reference decodes here and vice versa.
  *
  * The POSITION SEMANTICS are re-expressed for the Spark engine: the
  * reference walks (shard-group, segment block) positions of its TSSP
  * store; our measurement is one time-ordered frame, so a position is
  * (timestamp ns, #rows already consumed at that exact timestamp) —
  * `Timestamp` and `BlockID` of the single task. Ties inside a
  * timestamp are ordered by a deterministic row hash, so repeated polls
  * see a stable order regardless of scan parallelism.
  */
object Consume {

  final case class Task(sgId: Long, metaIndexId: Int, blockId: Long,
                        timestamp: Long, remotePath: String) {
    def encode: String =
      s"$sgId|$metaIndexId|$blockId|$timestamp|$remotePath"
  }

  final case class SegmentTask(ptId: Int, pre: Option[Task], curr: Task) {
    def encode: String =
      s"($ptId^${pre.map(_.encode).getOrElse("")}^${curr.encode})"
  }

  final case class Cursor(reverse: Boolean, taskNum: Int, cursorId: Int,
                          currTotalPtNum: Int, time: Long,
                          tasks: Seq[SegmentTask]) {
    def encode: String = {
      val head = s"${if (reverse) "1" else "0"}|$taskNum|$cursorId|" +
        s"$currTotalPtNum|$time|${tasks.length}"
      val body = tasks.map("|" + _.encode).mkString
      java.util.Base64.getEncoder.encodeToString(gzip(head + body))
    }
  }

  private def gzip(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes("UTF-8")); gz.close()
    bos.toByteArray
  }

  private def gunzip(b: Array[Byte]): String = {
    val gz = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new String(gz.readAllBytes(), "UTF-8"); gz.close(); out
  }

  private def parseTask(s: String): Task = {
    val f = s.split("\\|", 5)
    Task(f(0).toLong, f(1).toInt, f(2).toLong, f(3).toLong,
      if (f.length > 4) f(4) else "")
  }

  /** Decode a base64(gzip(pipe-string)) cursor (consume.go:179-226,
    * GetConsumeCursor). Throws on malformed input — callers map that
    * to the reference's "cursor is illegal" 400. */
  def decode(b64: String): Cursor = {
    val raw = gunzip(java.util.Base64.getDecoder.decode(b64))
    val content = raw.split("\\|", 7)
    require(content.length == 6 || content.length == 7,
      "length of cursor is not illegal")
    val nTasks = content(5).toInt
    val tasks =
      if (content.length == 6) Nil
      else {
        val re = "\\((.*?)\\)".r
        val found = re.findAllMatchIn(content(6)).map(_.group(1)).toSeq
        require(found.length == nTasks, "cursor task num is not illegal")
        found.map { t =>
          val p = t.split("\\^", 3)
          SegmentTask(p(0).toInt,
            if (p(1).isEmpty) None else Some(parseTask(p(1))),
            parseTask(p(2)))
        }
      }
    Cursor(content(0) == "1", content(1).toInt, content(2).toInt,
      content(3).toInt, content(4).toLong, tasks)
  }

  /** Mint the from-cursor for [from, end) ns over a single-pt engine
    * (serveGetConsumeCursors with ptNum = 1): one task at position
    * (from, 0); RemotePath carries the stream name — non-empty means
    * consumable, the reference's empty-RemotePath = exhausted marker.
    *
    * The stream name is embedded verbatim in the pipe-string, so names
    * containing the cursor delimiters (`|`, `^`, `(`, `)`) would
    * mis-tokenize on decode — rejected here, exactly like a malformed
    * cursor would be on the way back in. */
  def mint(fromNs: Long, stream: String, reverse: Boolean = false,
           taskNum: Int = 1): Cursor = {
    require(!stream.exists(c => c == '|' || c == '^' || c == '(' ||
      c == ')'), "logstream name contains cursor delimiters")
    Cursor(reverse, taskNum, 0, 1, fromNs, Seq(SegmentTask(0, None,
      Task(0, 0, 0, fromNs, stream))))
  }
}
