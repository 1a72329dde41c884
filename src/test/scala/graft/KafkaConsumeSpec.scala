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
      "acc,host=h1 content=\"m1\" 1000\nacc,host=h1 content=\"m2\" 2000\n" +
      "acc,host=h1 content=\"m3\" 3000\nacc,host=h2 content=\"m4\" 4000\n" +
      "acc,host=h2 content=\"m5\" 5000").statusCode() == 204)
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

  test("record codec: ConsumeRecord byte pins from lib/record marshal " +
      "rules; string/float/bool/null round-trip") {
    import graft.server.RecordCodec
    import graft.server.RecordCodec._
    // Full hand-derived pin: tags [("h","a")], schema [("v", Int=1)],
    // one int column [7, NULL]. Every byte below follows
    // iterator.go:31 / record_codec.go:23 / column_codec.go:21 /
    // binary_encoder.go (u32/str BE, ints zigzag BE64, Val bytes LE,
    // bitmap LSB-first 1=present, dense Val so the null adds nothing).
    val col = new ColVal().appendLong(7L).appendNull()
    val got = marshalConsume(Seq(Tag("h", "a")), Seq(Field("v", TInt)),
      Seq(col))
    val want = Array[Int](
      0, 0, 0, 1,                   // tag count
      0, 1, 'h',                    // tag key "h"
      0, 1, 'a',                    // tag value "a"
      0,                            // isArray=false
      0, 0, 0, 1,                   // schema len
      0, 0, 0, 11,                  // field size = (2+1) + 8
      0, 1, 'v',                    // field name
      0, 0, 0, 0, 0, 0, 0, 2,       // type Int=1, zigzag → 2
      0, 0, 0, 1,                   // col count
      0, 0, 0, 45,                  // colval size
      0, 0, 0, 0, 0, 0, 0, 4,       // Len=2, zigzag → 4
      0, 0, 0, 0, 0, 0, 0, 2,       // NilCount=1, zigzag → 2
      0, 0, 0, 0, 0, 0, 0, 0,       // BitMapOffset=0
      0, 0, 0, 8,                   // Val length (one dense value)
      7, 0, 0, 0, 0, 0, 0, 0,       // 7L little-endian
      0, 0, 0, 1,                   // Bitmap length
      1,                            // row0 present (bit0), row1 null
      0, 0, 0, 0                    // Offset count (fixed type: none)
    ).map(_.toByte)
    assert(got.toSeq == want.toSeq,
      got.map(b => b & 0xff).mkString(",") + " vs " +
        want.map(b => b & 0xff).mkString(","))

    // Reference iterator_test.go TestConsumeRecord_Marshal shape: two
    // tags + a schema-only record (one field, one EMPTY ColVal) — the
    // empty colval marshals as 3 zigzag ints + three zero-length slices.
    val emptyRec = marshalConsume(
      Seq(Tag("tag1", "val1"), Tag("tag2", "val2")),
      Seq(Field("schema1", 0)), Seq(new ColVal))
    val wantEmpty =
      Array[Int](0, 0, 0, 2) ++
      Array[Int](0, 4) ++ "tag1".map(_.toInt) ++
        Array[Int](0, 4) ++ "val1".map(_.toInt) ++ Array(0) ++
      Array[Int](0, 4) ++ "tag2".map(_.toInt) ++
        Array[Int](0, 4) ++ "val2".map(_.toInt) ++ Array(0) ++
      Array[Int](0, 0, 0, 1,
        0, 0, 0, 17) ++              // field size = (2+7) + 8
      Array[Int](0, 7) ++ "schema1".map(_.toInt) ++
      Array.fill(8)(0) ++            // type 0
      Array[Int](0, 0, 0, 1,
        0, 0, 0, 36) ++              // empty colval size = 24 + 4 + 4 + 4
      Array.fill(24)(0) ++           // Len/NilCount/BitMapOffset all 0
      Array[Int](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) // empty Val/Bitmap/Offset
    assert(emptyRec.toSeq == wantEmpty.map(_.toByte).toSeq)

    // Mixed-type round-trip incl. string nulls (per-row offsets) and
    // IEEE float bits; decoder mirrors record_codec.go Unmarshal.
    val sc = new ColVal().appendString("ab").appendStringNull()
      .appendString("")
    val fc = new ColVal().appendDouble(1.5).appendDouble(-0.0)
      .appendNull()
    val bc = new ColVal().appendBool(true).appendNull().appendBool(false)
    val payload = marshalConsume(Nil,
      Seq(Field("s", TString), Field("f", TFloat), Field("b", TBool)),
      Seq(sc, fc, bc))
    val (tags2, schema2, cols2) = RecordCodec.unmarshalConsume(payload)
    assert(tags2.isEmpty &&
      schema2 == Seq(Field("s", TString), Field("f", TFloat),
        Field("b", TBool)))
    assert(cols2(0).stringAt(0).contains("ab") && cols2(0).isNull(1) &&
      cols2(0).stringAt(2).contains(""))
    assert(cols2(0).offsets == Seq(0L, 2L, 2L)) // null repeats val end
    assert(cols2(1).doubleAt(0).contains(1.5) &&
      java.lang.Double.doubleToRawLongBits(cols2(1).doubleAt(1).get) ==
        java.lang.Double.doubleToRawLongBits(-0.0) &&
      cols2(1).isNull(2))
    assert(cols2(2).boolAt(0).contains(true) && cols2(2).isNull(1) &&
      cols2(2).boolAt(2).contains(false))
    // nine rows across a byte boundary: bitmap grows byte-at-a-time
    val wide = new ColVal
    (0 until 9).foreach(i => if (i % 2 == 0) wide.appendLong(i.toLong)
      else wide.appendNull())
    val (_, _, wcols) = RecordCodec.unmarshalConsume(
      marshalConsume(Nil, Seq(Field("w", TInt)), Seq(wide)))
    assert(wcols.head.bitmap.length == 2 && wcols.head.len == 9)
    assert((0 until 9).map(wcols.head.longAt) ==
      (0 until 9).map(i => if (i % 2 == 0) Some(i.toLong) else None))
  }

  test("payloadsFromResult: driver collect is row-capped — an unbounded " +
      "result throws at maxRows instead of materializing (the gateway's " +
      "max-row-limit guard, httpd/config/config.go:37)") {
    import graft.server.RecordCodec
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, s"h$i")).toDF("v", "host")
    // at the cap: fine
    val ok = RecordCodec.payloadsFromResult(df, tagCols = Set("host"),
      maxRows = 10)
    assert(ok.length == 10) // one series per distinct host tag
    // past the cap: refuse, don't collect
    val e = intercept[IllegalArgumentException] {
      RecordCodec.payloadsFromResult(df, tagCols = Set("host"), maxRows = 9)
    }
    assert(e.getMessage.contains("maxRows=9"), e.getMessage)
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

        // Fetch v2 drain: ONE message per fetch; each message is one
        // SERIES batch in the reference's record codec (RecordCodec) —
        // two series (host=h1, host=h2) → offsets 0,1 — then an empty
        // fetch (exhausted), then a re-run continuing the offsets
        val fetchTopic = "select content, host from acc"
        def fetchOnce(): (Long, Seq[(Long, Array[Byte])]) = {
          val fe = new Enc
          fe.u32(0xffffffffL).u32(100L).u32(1L)
            .strSlice(Seq(fetchTopic))
            .u32SliceBE(Seq(0L))
            .u64(0L).u32(1000000L)
          val corr = c.send(Fetch, 2, fe.result())
          val d = c.recv()
          assert(d.u32() == corr)
          assert(d.u32() == 1L) // throttle
          assert(d.u32() == 1L) // one topic
          assert(d.str() == fetchTopic)
          assert(d.u32() == 1L) // one header
          assert(d.u32() == 0L) // partition
          assert(d.u16() == 0) // error
          val highwater = d.u64()
          val setLen = d.u32().toInt
          val set = new Dec(d.rest())
          d.expectDrained()
          var msgs = Seq.empty[(Long, Array[Byte])]
          var consumed = 0
          while (consumed < setLen) {
            val offset = set.u64()
            set.u32() // Length (0, reference quirk)
            set.u32() // CRC (0)
            set.u8(); set.u8() // magic, attributes
            val keyLen = set.u32().toInt
            (0 until keyLen).foreach(_ => set.u8())
            val valLen = set.u32().toInt
            val value = (0 until valLen).map(_ => set.u8().toByte).toArray
            msgs = msgs :+ (offset, value)
            consumed = setLen - set.remain
          }
          (highwater, msgs)
        }
        import graft.server.RecordCodec
        def decode(payload: Array[Byte]) = {
          val (tags, schema, cols) = RecordCodec.unmarshalConsume(payload)
          assert(schema == Seq(RecordCodec.Field("content", 4),
            RecordCodec.Field("time", 1)), schema.toString)
          val n = cols.head.len
          (tags.map(t => (t.key, t.value)),
            (0 until n).map(i => cols(0).stringAt(i).get),
            (0 until n).map(i => cols(1).longAt(i).get))
        }
        val drained = (0 until 2).map(_ => fetchOnce())
        val all = drained.flatMap(_._2)
        assert(all.map(_._1) == Seq(0L, 1L), all.map(_._1).toString)
        val (tags1, vals1, times1) = decode(all(0)._2)
        assert(tags1 == Seq(("host", "h1")), tags1.toString)
        assert(vals1 == Seq("m1", "m2", "m3"), vals1.toString)
        assert(times1 == Seq(1000000000L, 2000000000L, 3000000000L),
          times1.toString) // precision=ms writes → epoch-ns time column
        val (tags2, vals2, times2) = decode(all(1)._2)
        assert(tags2 == Seq(("host", "h2")) &&
          vals2 == Seq("m4", "m5") &&
          times2 == Seq(4000000000L, 5000000000L),
          s"$tags2 $vals2 $times2")
        // exhausted: zero messages, highwater = offset+1 (fetch.go:103)
        val (hw, empty) = fetchOnce()
        assert(empty.isEmpty && hw == 3L, s"$hw $empty")
        // next fetch re-runs the query; per-connection offset continues
        val (_, rerun) = fetchOnce()
        assert(rerun.map(_._1) == Seq(2L), rerun.toString)
        assert(decode(rerun.head._2)._2 == Seq("m1", "m2", "m3"),
          "re-run restarts at the first series")

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
