package graft.server

/** Wire codec for the logkeeper Kafka-protocol consume service — an
  * exact replication of the reference's hand-rolled binary format
  * (`services/consume/kafka/protocol/codec.go`, `request_v1.go:22-160`,
  * `request_v2.go:21-259`, `response_v1.go:21-171`,
  * `response_v2.go:21-117`, over `lib/codec/binary_encoder.go` +
  * `binary_decoder.go` primitives):
  *
  *  - unsigned ints are BIG-endian (`BinaryDecoder.Uint16/32/64`);
  *  - int32/int64/int16 are ZIGZAG-encoded then written as the unsigned
  *    twin (`binary_encoder.go:56` `(i<<1)^(i>>31)`;
  *    `binary_decoder.go:95` decodes) — NOT plain two's complement;
  *  - string = uint16 length + bytes (`AppendString`);
  *  - string slice = uint32 count + strings
  *    (`AppendStringSliceUsingAppendString` / `DecodeSmallStringSlice`);
  *  - uint32 slice = uint32 count + BE values
  *    (`AppendUint32SliceBigEndian`);
  *  - bytes = uint32 length + raw (`AppendBytes`);
  *  - framing = uint32 BE message length prefix (`codec.go:40`
  *    MarshalSize; `server.go:137` Reader).
  *
  * For the single-topic single-partition requests the reference's own
  * test drives with a stock Kafka client (`kafka/server_test.go:92`
  * TestClient via segmentio/kafka-go), these layouts coincide with the
  * real Kafka v1/v2 request wire format — which is what makes the
  * service consumable by Kafka tooling at all. Quirks of the reference
  * are replicated deliberately: FetchMessage.Length and CRC stay 0
  * (`fetch.go:88-96` never sets them), the OffsetCommit response
  * carries NO correlation id (`response_v2.go:85`), and the ApiVersions
  * response writes its throttle field only when the REQUEST version is
  * > 0 (`api_version.go:34-44`).
  */
object KafkaWire {

  // api keys (handle/handler.go:27-34) — the standard Kafka ids
  val Fetch = 1
  val ListOffsets = 2
  val Metadata = 3
  val OffsetCommit = 8
  val HeartBeat = 12
  val Versions = 18

  // ------------------------------------------------------------ encoder
  final class Enc {
    private val out = new java.io.ByteArrayOutputStream()
    def result(): Array[Byte] = out.toByteArray
    def u8(v: Int): Enc = { out.write(v & 0xff); this }
    def u16(v: Int): Enc = { out.write((v >>> 8) & 0xff); out.write(v & 0xff); this }
    def u32(v: Long): Enc = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt); this
    }
    def u64(v: Long): Enc = { u32(v >>> 32); u32(v & 0xffffffffL); this }
    /** zigzag int16 (lib encoding.MarshalInt16) */
    def i16(v: Short): Enc = u16(((v << 1) ^ (v >> 15)) & 0xffff)
    /** zigzag int32 (binary_encoder.go:56) */
    def i32(v: Int): Enc = u32(((v << 1) ^ (v >> 31)) & 0xffffffffL)
    /** zigzag int64 (encoding.MarshalInt64) */
    def i64(v: Long): Enc = u64((v << 1) ^ (v >> 63))
    def bool(v: Boolean): Enc = u8(if (v) 1 else 0)
    def str(s: String): Enc = {
      val b = s.getBytes("UTF-8"); u16(b.length); out.write(b, 0, b.length); this
    }
    def bytes(b: Array[Byte]): Enc = { u32(b.length); out.write(b, 0, b.length); this }
    def raw(b: Array[Byte]): Enc = { out.write(b, 0, b.length); this }
    def strSlice(ss: Seq[String]): Enc = { u32(ss.length); ss.foreach(str); this }
    def u32SliceBE(vs: Seq[Long]): Enc = { u32(vs.length); vs.foreach(u32); this }
    /** uint32 size prefix + payload (codec.go:40 MarshalSize) */
    def sized(payload: Array[Byte]): Enc = { u32(payload.length); raw(payload) }
  }

  // ------------------------------------------------------------ decoder
  final class Dec(buf: Array[Byte]) {
    private var off = 0
    def remain: Int = buf.length - off
    private def need(n: Int, what: String): Unit =
      if (remain < n) throw new IllegalArgumentException(
        s"$what: too small data block; need $n, have $remain")
    def u8(): Int = { need(1, "u8"); val v = buf(off) & 0xff; off += 1; v }
    def u16(): Int = { need(2, "u16"); val v = ((buf(off) & 0xff) << 8) | (buf(off + 1) & 0xff); off += 2; v }
    def u32(): Long = { need(4, "u32"); var v = 0L; var i = 0
      while (i < 4) { v = (v << 8) | (buf(off + i) & 0xff); i += 1 }; off += 4; v }
    def u64(): Long = { val hi = u32(); val lo = u32(); (hi << 32) | lo }
    def i32(): Int = { val u = u32().toInt; (u >>> 1) ^ -(u & 1) }
    def i64(): Long = { val u = u64(); (u >>> 1) ^ -(u & 1L) }
    def str(): String = {
      val n = u16(); need(n, "str")
      val s = new String(buf, off, n, "UTF-8"); off += n; s
    }
    def strSlice(): Seq[String] = {
      val n = u32().toInt; (0 until n).map(_ => str())
    }
    def u32SliceBE(): Seq[Long] = {
      val n = u32().toInt
      need(n * 4, "u32Slice")
      (0 until n).map(_ => u32())
    }
    def rest(): Array[Byte] = { val r = java.util.Arrays.copyOfRange(buf, off, buf.length); off = buf.length; r }
    def expectDrained(): Unit =
      if (remain > 0) throw new IllegalArgumentException(
        "unmarshal: trailing data after unmarshal")
  }

  // ------------------------------------------------------- request types
  /** request_v1.go:22 RequestHeader — matches the real Kafka header. */
  final case class ReqHeader(apiKey: Int, apiVersion: Int,
                             correlationId: Long, clientId: String) {
    def marshal(e: Enc): Enc =
      e.u16(apiKey).u16(apiVersion).u32(correlationId).str(clientId)
  }
  object ReqHeader {
    def unmarshal(d: Dec): ReqHeader =
      ReqHeader(d.u16(), d.u16(), d.u32(), d.str())
  }

  /** request_v2.go:21 RequestFetchV2. NOTE the reference reads ReplicaID
    * as a RAW uint32 (`int32(dec.Uint32())`), not zigzag — replicated. */
  final case class ReqFetchV2(replicaId: Int, maxWaitTime: Long,
                              minBytes: Long, topics: Seq[String],
                              partitions: Seq[Long], offset: Long,
                              maxBytes: Long)
  object ReqFetchV2 {
    def unmarshal(d: Dec): ReqFetchV2 = {
      val r = ReqFetchV2(d.u32().toInt, d.u32(), d.u32(), d.strSlice(),
        d.u32SliceBE(), d.u64(), d.u32())
      d.expectDrained(); r
    }
  }

  /** request_v1.go:64 RequestPartitionOffsetV1 (ListOffsets). */
  final case class ReqListOffsetsV1(replicaId: Int, topics: Seq[String],
                                    partitions: Seq[Long], timestamp: Long)
  object ReqListOffsetsV1 {
    def unmarshal(d: Dec): ReqListOffsetsV1 = {
      val r = ReqListOffsetsV1(d.u32().toInt, d.strSlice(),
        d.u32SliceBE(), d.u64())
      d.expectDrained(); r
    }
  }

  /** request_v1.go:103 RequestMetadataV1. */
  final case class ReqMetadataV1(topics: Seq[String])
  object ReqMetadataV1 {
    def unmarshal(d: Dec): ReqMetadataV1 = {
      val r = ReqMetadataV1(d.strSlice()); d.expectDrained(); r
    }
  }

  /** request_v1.go:121 RequestHeartbeatV0 (zigzag GenerationID). */
  final case class ReqHeartbeatV0(groupId: String, generationId: Int,
                                  memberId: String)
  object ReqHeartbeatV0 {
    def unmarshal(d: Dec): ReqHeartbeatV0 = {
      val r = ReqHeartbeatV0(d.str(), d.i32(), d.str())
      d.expectDrained(); r
    }
  }

  /** request_v2.go:85 RequestOffsetCommitV2 (+Topic +Partition). */
  final case class ReqOffsetCommitPartV2(partition: Int, offset: Long,
                                         metadata: String)
  final case class ReqOffsetCommitTopicV2(topic: String,
                                          parts: Seq[ReqOffsetCommitPartV2])
  final case class ReqOffsetCommitV2(groupId: String, generationId: Int,
                                     memberId: String, retentionTime: Long,
                                     topics: Seq[ReqOffsetCommitTopicV2])
  object ReqOffsetCommitV2 {
    def unmarshal(d: Dec): ReqOffsetCommitV2 = {
      val g = d.str(); val gen = d.i32(); val m = d.str(); val ret = d.i64()
      val nT = d.u32().toInt
      val topics = (0 until nT).map { _ =>
        val t = d.str()
        val nP = d.u32().toInt
        ReqOffsetCommitTopicV2(t, (0 until nP).map { _ =>
          ReqOffsetCommitPartV2(d.i32(), d.i64(), d.str())
        })
      }
      val r = ReqOffsetCommitV2(g, gen, m, ret, topics)
      d.expectDrained(); r
    }
    /** client-side marshal — the spec's round-trip + replay fixture. */
    def marshal(r: ReqOffsetCommitV2): Array[Byte] = {
      val e = new Enc
      e.str(r.groupId).i32(r.generationId).str(r.memberId)
        .i64(r.retentionTime).u32(r.topics.length)
      r.topics.foreach { t =>
        e.str(t.topic).u32(t.parts.length)
        t.parts.foreach(p => e.i32(p.partition).i64(p.offset).str(p.metadata))
      }
      e.result()
    }
  }

  // ------------------------------------------------------ response types
  /** response_v1.go:33 ResponseApiVersion — throttle field present only
    * when the handler set it >= 0 (api_version.go: request version > 0). */
  final case class ApiVersionRange(apiKey: Int, min: Int, max: Int)
  def marshalApiVersions(correlationId: Long, errorCode: Int,
                         throttle: Int,
                         versions: Seq[ApiVersionRange]): Array[Byte] = {
    val e = new Enc
    e.u32(correlationId).u16(errorCode)
    if (throttle >= 0) e.u32(throttle.toLong)
    e.u32(versions.length)
    versions.foreach(v => e.u16(v.apiKey).u16(v.min).u16(v.max))
    e.result()
  }

  /** response_v1.go:65 MetadataResponseV1. */
  final case class BrokerV1(nodeId: Long, host: String, port: Long,
                            rack: String = "")
  final case class PartitionMetaV1(errorCode: Int, partitionId: Long,
                                   leader: Long, replicas: Seq[Long],
                                   isr: Seq[Long])
  final case class TopicMetaV1(errorCode: Int, name: String,
                               internal: Boolean,
                               partitions: Seq[PartitionMetaV1])
  def marshalMetadataV1(correlationId: Long, brokers: Seq[BrokerV1],
                        controllerId: Long,
                        topics: Seq[TopicMetaV1]): Array[Byte] = {
    val e = new Enc
    e.u32(correlationId)
    e.u32(brokers.length)
    brokers.foreach(b => e.u32(b.nodeId).str(b.host).u32(b.port).str(b.rack))
    e.u32(controllerId)
    e.u32(topics.length)
    topics.foreach { t =>
      e.u16(t.errorCode).str(t.name).bool(t.internal)
      e.u32(t.partitions.length)
      t.partitions.foreach { p =>
        e.u16(p.errorCode).u32(p.partitionId).u32(p.leader)
          .u32SliceBE(p.replicas).u32SliceBE(p.isr)
      }
    }
    e.result()
  }

  /** response_v1.go:128 PartitionOffsetV1 family (ListOffsets). */
  final case class PartitionOffsetV1(partition: Long, errorCode: Int,
                                     timestamp: Long, offset: Long)
  final case class TopicPartitionOffsetsV1(topic: String,
                                           offsets: Seq[PartitionOffsetV1])
  def marshalListOffsetsV1(correlationId: Long,
                           list: Seq[TopicPartitionOffsetsV1]): Array[Byte] = {
    val e = new Enc
    e.u32(correlationId)
    e.u32(list.length)
    list.foreach { t =>
      e.str(t.topic)
      e.u32(t.offsets.length)
      t.offsets.foreach(p =>
        e.u32(p.partition).u16(p.errorCode).u64(p.timestamp).u64(p.offset))
    }
    e.result()
  }

  /** response_v2.go:34 FetchMessage + :56 ResponseFetchV2. Length and
    * CRC stay 0 exactly like the reference's fetch.go; the value is
    * size-prefixed (MarshalSize). */
  final case class FetchMsg(firstOffset: Long, payload: Array[Byte],
                            key: Array[Byte] = Array.emptyByteArray,
                            magic: Int = 0, attributes: Int = 0)
  def marshalFetchV2(correlationId: Long, throttle: Long, topic: String,
                     partition: Long, errorCode: Int, highwater: Long,
                     messages: Seq[FetchMsg]): Array[Byte] = {
    val e = new Enc
    e.u32(correlationId).u32(throttle)
    e.u32(1L).str(topic) // only one topic (response_v2.go:78)
    e.u32(1L)            // only one header
    e.u32(partition).u16(errorCode).u64(highwater)
    val ms = new Enc
    messages.foreach { m =>
      ms.u64(m.firstOffset).u32(0L).u32(0L) // Length, CrcOrLeaderEpoch
        .u8(m.magic).u8(m.attributes)
        .bytes(m.key)
        .sized(m.payload)
    }
    e.sized(ms.result())
    e.result()
  }

  /** response_v2.go:87 ResponseOffsetCommitV2 — NO correlation id. */
  final case class OffsetCommitPartRespV2(partition: Int, errorCode: Short)
  final case class OffsetCommitTopicRespV2(topic: String,
                                           parts: Seq[OffsetCommitPartRespV2])
  def marshalOffsetCommitV2(resps: Seq[OffsetCommitTopicRespV2]): Array[Byte] = {
    val e = new Enc
    e.u32(resps.length)
    resps.foreach { t =>
      e.str(t.topic)
      e.u32(t.parts.length)
      t.parts.foreach(p => e.i32(p.partition).i16(p.errorCode))
    }
    e.result()
  }

  /** response_v1.go:168 ResponseHeartbeatV0 — a lone zigzag int16. */
  def marshalHeartbeatV0(errorCode: Short): Array[Byte] =
    new Enc().i16(errorCode).result()
}
