package graft

import graft.server.{HttpGateway, KafkaWire}
import graft.server.KafkaWire._

import java.net.{HttpURLConnection, Socket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** E2E for the Kafka wire-protocol consume service (reference:
  * `services/consume/kafka/server_test.go` TestClient + the
  * `protocol/codec_test.go` frame fixtures): a minimal in-repo client
  * speaks the framed protocol over a real TCP socket against the
  * gateway-hosted listener — ApiVersions, Metadata, ListOffsets, then
  * drains a logstream with one-message-per-fetch Fetch V2 polls. */
class KafkaConsumeSpec extends SparkSpec {

  // ---- minimal client ------------------------------------------------
  private final class Client(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(20000)
    private val out = new java.io.DataOutputStream(sock.getOutputStream)
    private val in = new java.io.DataInputStream(sock.getInputStream)
    private var corr = 0L

    /** Send one framed request; returns the correlation id used. */
    def send(apiKey: Int, apiVersion: Int, body: Array[Byte]): Long = {
      corr += 1
      val e = new Enc
      ReqHeader(apiKey, apiVersion, corr, "graft-test").marshal(e)
      e.raw(body)
      val framed = new Enc
      framed.sized(e.result())
      out.write(framed.result()); out.flush()
      corr
    }

    def recv(): Dec = {
      val size = in.readInt()
      val buf = new Array[Byte](size)
      in.readFully(buf)
      new Dec(buf)
    }

    /** true when the server closed the connection (error path). */
    def closedByServer(): Boolean =
      try { in.read() == -1 } catch { case _: Exception => true }

    def close(): Unit = sock.close()
  }

  private def gatewayWithRows(): (HttpGateway, Int) = {
    val g = new HttpGateway(spark, Map.empty, Map.empty)
    g.start()
    val http = HttpClient.newHttpClient()
    def post(path: String, body: String) =
      http.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${g.boundPort}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    assert(post("/write?db=graft&precision=ms",
      "acc content=\"m1\" 1000\nacc content=\"m2\" 2000\n" +
      "acc content=\"m3\" 3000\nacc content=\"m4\" 4000\n" +
      "acc content=\"m5\" 5000").statusCode() == 204)
    val kPort = g.startKafkaConsume()
    (g, kPort)
  }

  test("codec: OffsetCommitV2 round-trip + the reference's 25-byte " +
      "response pin; zigzag int32/int64; header layout") {
    // codec_test.go TestRequestOffsetCommitV2 fixture
    val req = ReqOffsetCommitV2("testGroup1", 1, "testMember1", 1L,
      Seq(ReqOffsetCommitTopicV2("testTopic",
        Seq(ReqOffsetCommitPartV2(0, 0L, "testMetadata")))))
    val bytes = ReqOffsetCommitV2.marshal(req)
    val back = ReqOffsetCommitV2.unmarshal(new Dec(bytes))
    assert(back == req)
    // server_test.go TestRequestOffsetCommitV2: marshaled response is
    // exactly 25 bytes for one topic ("testTopic") + one partition
    val resp = marshalOffsetCommitV2(Seq(OffsetCommitTopicRespV2(
      "testTopic", Seq(OffsetCommitPartRespV2(0, 0)))))
    assert(resp.length == 25, resp.length.toString)
    // zigzag: -1 encodes as unsigned 1 (binary_encoder.go:56)
    val z = new Enc().i32(-1).result()
    assert(z.toSeq == Seq[Byte](0, 0, 0, 1), z.toSeq.toString)
    assert(new Dec(z).i32() == -1)
    val z64 = new Enc().i64(-2L).result()
    assert(new Dec(z64).i64() == -2L)
    // header: apiKey u16, version u16, corr u32, clientId u16+bytes
    val he = new Enc
    ReqHeader(18, 1, 7, "ab").marshal(he)
    assert(he.result().toSeq == Seq[Byte](0, 18, 0, 1, 0, 0, 0, 7, 0, 2,
      'a'.toByte, 'b'.toByte))
  }

  test("kafka consume e2e: ApiVersions/Metadata/ListOffsets handshake, " +
      "one-message-per-fetch drain, exhaustion + re-run, offsets never " +
      "reset; unsupported api closes the connection") {
    val (g, kPort) = gatewayWithRows()
    try {
      val c = new Client(kPort)
      try {
        // ApiVersions v1: throttle present (request version > 0)
        val corr1 = c.send(Versions, 1, Array.emptyByteArray)
        val d1 = c.recv()
        assert(d1.u32() == corr1)
        assert(d1.u16() == 0) // error code
        assert(d1.u32() == 1L) // throttle (v1 quirk)
        val nv = d1.u32().toInt
        val vers = (0 until nv).map(_ => (d1.u16(), d1.u16(), d1.u16()))
        assert(vers.contains((Fetch, 2, 2)) &&
          vers.contains((ListOffsets, 1, 1)) &&
          vers.contains((Versions, 1, 1)), vers.toString)
        d1.expectDrained()

        // Metadata v1: this node as the only broker, one partition
        val me = new Enc().strSlice(Seq("select content from acc"))
        val corr2 = c.send(Metadata, 1, me.result())
        val d2 = c.recv()
        assert(d2.u32() == corr2)
        assert(d2.u32() == 1L) // brokers
        assert(d2.u32() == 0L) // node id
        assert(d2.str() == "127.0.0.1")
        assert(d2.u32() == kPort.toLong)
        d2.str() // rack
        assert(d2.u32() == 0L) // controller
        assert(d2.u32() == 1L) // topics
        assert(d2.u16() == 0)
        assert(d2.str() == "select content from acc")
        assert(d2.u8() == 0) // internal=false
        assert(d2.u32() == 1L) // partitions
        d2.u16(); d2.u32(); d2.u32(); d2.u32SliceBE(); d2.u32SliceBE()
        d2.expectDrained()

        // ListOffsets v1 (kafka-go single-topic layout)
        val le = new Enc
        le.u32(0xffffffffL) // replica -1 raw
          .strSlice(Seq("select content from acc"))
          .u32SliceBE(Seq(0L))
          .u64(0L)
        val corr3 = c.send(ListOffsets, 1, le.result())
        val d3 = c.recv()
        assert(d3.u32() == corr3)
        assert(d3.u32() == 1L)
        assert(d3.str() == "select content from acc")
        assert(d3.u32() == 1L)
        assert(d3.u32() == 0L) // partition
        assert(d3.u16() == 0) // error
        assert(d3.u64() > 0L) // now-ns timestamp
        assert(d3.u64() == 0L) // offset
        d3.expectDrained()

        // Fetch v2 drain: ONE message per fetch, offsets 0..4, then an
        // empty fetch (exhausted), then a re-run starting at offset 5
        def fetchOnce(): (Long, Seq[(Long, String)]) = {
          val fe = new Enc
          fe.u32(0xffffffffL).u32(100L).u32(1L)
            .strSlice(Seq("select content from acc"))
            .u32SliceBE(Seq(0L))
            .u64(0L).u32(1000000L)
          val corr = c.send(Fetch, 2, fe.result())
          val d = c.recv()
          assert(d.u32() == corr)
          assert(d.u32() == 1L) // throttle
          assert(d.u32() == 1L) // one topic
          assert(d.str() == "select content from acc")
          assert(d.u32() == 1L) // one header
          assert(d.u32() == 0L) // partition
          assert(d.u16() == 0) // error
          val highwater = d.u64()
          val setLen = d.u32().toInt
          val set = new Dec(d.rest())
          d.expectDrained()
          var msgs = Seq.empty[(Long, String)]
          var consumed = 0
          while (consumed < setLen) {
            val offset = set.u64()
            set.u32() // Length (0, reference quirk)
            set.u32() // CRC (0)
            set.u8(); set.u8() // magic, attributes
            val keyLen = set.u32().toInt
            (0 until keyLen).foreach(_ => set.u8())
            val valLen = set.u32().toInt
            val value = new String(
              (0 until valLen).map(_ => set.u8().toByte).toArray, "UTF-8")
            msgs = msgs :+ (offset, value)
            consumed = setLen - set.remain
          }
          (highwater, msgs)
        }
        val drained = (0 until 5).map(_ => fetchOnce())
        val all = drained.flatMap(_._2)
        assert(all.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L), all.toString)
        assert(all.map(_._2).forall(_.contains("\"content\":")), all.toString)
        assert(all.map(_._2).mkString.contains("m1") &&
          all.map(_._2).mkString.contains("m5"))
        // exhausted: zero messages, highwater = offset+1 (fetch.go:103)
        val (hw, empty) = fetchOnce()
        assert(empty.isEmpty && hw == 6L, s"$hw $empty")
        // next fetch re-runs the query; per-connection offset continues
        val (_, rerun) = fetchOnce()
        assert(rerun.map(_._1) == Seq(5L), rerun.toString)
        assert(rerun.head._2.contains("m1"), rerun.toString)

        // OffsetCommit v2 ack (no correlation id in the response)
        val commit = ReqOffsetCommitV2.marshal(ReqOffsetCommitV2(
          "g1", 1, "m1", 1L, Seq(ReqOffsetCommitTopicV2("t",
            Seq(ReqOffsetCommitPartV2(0, 5L, ""))))))
        c.send(OffsetCommit, 2, commit)
        val dc = c.recv()
        assert(dc.u32() == 1L)
        assert(dc.str() == "t")
        assert(dc.u32() == 1L)
        assert(dc.i32() == 0 && dc.u16() == 0)
        dc.expectDrained()

        // Heartbeat v1 ack
        val hb = new Enc().str("g1").i32(1).str("m1").result()
        c.send(HeartBeat, 1, hb)
        val dh = c.recv()
        assert(dh.u16() == 0)
        dh.expectDrained()
      } finally c.close()

      // unsupported api key → error → server closes the connection
      val c2 = new Client(kPort)
      try {
        c2.send(99, 1, Array.emptyByteArray)
        assert(c2.closedByServer())
      } finally c2.close()

      // ApiVersions v0: throttle field ABSENT (api_version.go quirk);
      // dispatch still floors the version to 1 (handler.go:108)
      val c3 = new Client(kPort)
      try {
        val corr = c3.send(Versions, 0, Array.emptyByteArray)
        val d = c3.recv()
        assert(d.u32() == corr)
        assert(d.u16() == 0)
        val n = d.u32().toInt // straight to the versions count
        assert(n == 6, n.toString)
      } finally c3.close()
    } finally g.stop()
  }
}
