package graft.server

import KafkaWire._

/** The logkeeper Kafka-wire consume service — a TCP listener speaking
  * the reference's Kafka-like protocol (`services/consume/kafka/
  * server.go:77-120` framing loop; `handle/handler.go:88-116` dispatch
  * table) so a streaming consumer can poll a logstream with
  * ApiVersions → Metadata → ListOffsets → Fetch, committing offsets and
  * heartbeating in between.
  *
  * Handler semantics replicated from the reference:
  *  - dispatch key = (apiKey, max(1, apiVersion)) (`handler.go:108`);
  *    an unregistered pair errors and CLOSES the connection
  *    (`server.go:85` returns the error out of the read loop);
  *  - ApiVersions V1 advertises exactly the reference's table
  *    (`api_version.go:31-40`), writing the throttle field only when
  *    the request version was > 0;
  *  - Metadata V1 answers this single node as the only broker and one
  *    partition per requested topic (`metadata.go:58-93` with one data
  *    node);
  *  - ListOffsets V1 is interaction-only: offset 0 at now-ns per topic
  *    (`list_offset.go:33-57`);
  *  - OffsetCommit V2 / Heartbeat V1 are interaction-only acks
  *    (`offset_commit.go:31-53`, `heartbeat.go:31-42`);
  *  - Fetch V2: the TOPIC IS A QUERY (`fetch.go:70` `topic.Query =
  *    req.Topics[0]`). The first fetch on a connection compiles and
  *    runs it; every fetch returns at most ONE message
  *    (`fetch.go:31` MessageCount, `processor.go:117` stop after the
  *    first record) whose FirstOffset is a per-connection counter that
  *    never resets (`fetch.go:40,97`); HighwaterMarkOffset = offset+1
  *    (`fetch.go:103`). When the result set is exhausted the fetch
  *    returns ZERO messages and releases the iterator
  *    (`processor.go:110-121` IteratorReset), so the NEXT fetch
  *    re-runs the query from the start.
  *
  * Message payloads are the reference's `record.ConsumeRecord` columnar
  * codec (`processor.go:117` passes the record straight through as the
  * Marshaler) — built by [[RecordCodec]], one record batch per series
  * (r13; the r12 JSON row shape is gone). This class stays
  * payload-agnostic: `runQuery` returns the marshaled message bodies.
  */
final class KafkaConsume(runQuery: String => Seq[Array[Byte]],
                         maxRequestSize: Long = 1L << 20) {

  @volatile private var server: java.net.ServerSocket = _
  @volatile private var closed = false

  def boundPort: Int = server.getLocalPort

  def start(port: Int = 0): Int = {
    server = new java.net.ServerSocket()
    server.bind(new java.net.InetSocketAddress("127.0.0.1", port))
    val acceptor = new Thread(() => {
      while (!closed) {
        try {
          val conn = server.accept()
          val t = new Thread(() => handleConn(conn), "kafka-consume-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: Exception if closed =>
          case _: Exception =>
            // persistent accept failures (fd exhaustion, …) must not
            // busy-spin the acceptor thread
            try Thread.sleep(50) catch { case _: InterruptedException => }
        }
      }
    }, "kafka-consume-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    boundPort
  }

  def stop(): Unit = {
    closed = true
    if (server != null) try server.close() catch { case _: Exception => }
  }

  /** Per-connection fetch state (`fetch.go:33-40`): the offset counter
    * and the open iterator both live with the connection. */
  private final class FetchState {
    var offset: Long = 0L
    var iter: Iterator[Array[Byte]] = _
  }

  private def handleConn(conn: java.net.Socket): Unit = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(conn.getInputStream))
    val out = new java.io.BufferedOutputStream(conn.getOutputStream)
    val fetch = new FetchState
    try {
      while (true) {
        // framing: uint32 BE length prefix (server.go:137 Reader.Read)
        val size = in.readInt().toLong & 0xffffffffL
        if (size > maxRequestSize)
          throw new IllegalArgumentException(
            s"invalid request size. max: $maxRequestSize; current: $size")
        val body = new Array[Byte](size.toInt)
        in.readFully(body)
        val dec = new Dec(body)
        val header = ReqHeader.unmarshal(dec)
        val resp = dispatch(header, dec, fetch)
        val e = new Enc
        e.sized(resp)
        out.write(e.result())
        out.flush()
      }
    } catch {
      case _: java.io.EOFException => // client closed — normal
      case _: Exception => // handler error closes the connection (server.go:85)
    } finally {
      try conn.close() catch { case _: Exception => }
    }
  }

  /** handler.go:108 Call — version floored to 1 for dispatch; the raw
    * request version still drives the ApiVersions throttle quirk. */
  private def dispatch(h: ReqHeader, d: Dec, st: FetchState): Array[Byte] = {
    val ver = math.max(1, h.apiVersion)
    (h.apiKey, ver) match {
      case (Versions, 1) => apiVersions(h)
      case (Metadata, 1) => metadata(h, d)
      case (ListOffsets, 1) => listOffsets(h, d)
      case (Fetch, 2) => fetchV2(h, d, st)
      case (OffsetCommit, 2) => offsetCommit(h, d)
      case (HeartBeat, 1) => heartbeat(h, d)
      case (k, v) => throw new IllegalArgumentException(
        s"unsupported API: $k, version: $v")
    }
  }

  private def apiVersions(h: ReqHeader): Array[Byte] =
    marshalApiVersions(h.correlationId, errorCode = 0,
      throttle = if (h.apiVersion > 0) 1 else -1,
      versions = Seq(
        ApiVersionRange(Versions, 1, 1),
        ApiVersionRange(ListOffsets, 1, 1),
        ApiVersionRange(Metadata, 1, 1),
        ApiVersionRange(Fetch, 2, 2),
        ApiVersionRange(OffsetCommit, 2, 2),
        ApiVersionRange(HeartBeat, 1, 1)))

  private def metadata(h: ReqHeader, d: Dec): Array[Byte] = {
    val req = ReqMetadataV1.unmarshal(d)
    marshalMetadataV1(h.correlationId,
      brokers = Seq(BrokerV1(0, "127.0.0.1", boundPort.toLong)),
      controllerId = 0,
      topics = req.topics.map { t =>
        TopicMetaV1(0, t, internal = false,
          partitions = Seq(PartitionMetaV1(0, 0, 0, Nil, Nil)))
      })
  }

  private def listOffsets(h: ReqHeader, d: Dec): Array[Byte] = {
    val req = ReqListOffsetsV1.unmarshal(d)
    marshalListOffsetsV1(h.correlationId,
      req.topics.map(t => TopicPartitionOffsetsV1(t,
        // wall-clock epoch ns (list_offset.go: time.Now().UnixNano())
        Seq(PartitionOffsetV1(0, 0,
          System.currentTimeMillis() * 1000000L, 0)))))
  }

  private def fetchV2(h: ReqHeader, d: Dec, st: FetchState): Array[Byte] = {
    val req = ReqFetchV2.unmarshal(d)
    if (req.topics.isEmpty) throw new IllegalArgumentException("miss topic")
    if (req.partitions.isEmpty)
      throw new IllegalArgumentException("miss partitions")
    // only a single topic is consumed (fetch.go:69-71)
    if (st.iter == null) st.iter = runQuery(req.topics.head).iterator
    val msgs =
      if (st.iter.hasNext) {
        val m = FetchMsg(st.offset, st.iter.next())
        st.offset += 1
        Seq(m)
      } else {
        st.iter = null // exhausted: release, next fetch re-runs
        Nil
      }
    marshalFetchV2(h.correlationId, throttle = 1, topic = req.topics.head,
      partition = req.partitions.head, errorCode = 0,
      highwater = st.offset + 1, messages = msgs)
  }

  private def offsetCommit(h: ReqHeader, d: Dec): Array[Byte] = {
    val req = ReqOffsetCommitV2.unmarshal(d)
    marshalOffsetCommitV2(req.topics.map(t =>
      OffsetCommitTopicRespV2(t.topic,
        Seq(OffsetCommitPartRespV2(0, 0)))))
  }

  private def heartbeat(h: ReqHeader, d: Dec): Array[Byte] = {
    ReqHeartbeatV0.unmarshal(d) // validates the frame
    marshalHeartbeatV0(0)
  }
}
