package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import PgOutput._

/** Decoder unit + property tests: encode↔decode round-trip over
  * arbitrary relations/images, and the reference's documented edge
  * semantics (SURVEY §2.2): B/C dropped, unknown relation dropped,
  * n/u/t/b tags, O/K/N images, malformed-frame errors.
  *
  * (ScalaCheck is driven directly — the scalatestplus bridge is not
  * in the offline artifact cache.) */
class PgOutputSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val colName = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val identifier = Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val genRelation: Gen[RelationInfo] = for {
    id <- Gen.choose(1, Int.MaxValue)
    schema <- identifier
    table <- identifier
    ident <- Gen.oneOf('d', 'n', 'f', 'i')
    nCols <- Gen.choose(1, 8)
    names <- Gen.listOfN(nCols, colName).map(_.zipWithIndex.map { case (n, i) => s"${n}_$i" }) // unique
    types <- Gen.listOfN(nCols, Gen.choose(16, 5000))
  } yield RelationInfo(id, schema, table, ident,
    names.zip(types).map { case (n, t) => ColumnInfo(n, t, 0, -1) }.toIndexedSeq)

  private def genValue: Gen[WireValue] = Gen.frequency(
    2 -> Gen.const(WNull),
    1 -> Gen.const(WUnchanged),
    5 -> Gen.asciiPrintableStr.map(WText.apply),
    1 -> Gen.listOf(Gen.choose(0x20, 0x2fff)).map(cs => WText(cs.map(_.toChar).mkString)), // UTF-8 length ≠ char count
    2 -> Gen.listOf(Gen.choose(0, 255)).map(l => WBinary(l.map(_.toByte).toArray)))

  private def expected(rel: RelationInfo, vals: Seq[WireValue]): Map[String, String] =
    rel.columns.map(_.name).zip(vals).map {
      case (n, WNull) => n -> (null: String)
      case (n, WUnchanged) => n -> CdcEvent.UnchangedSentinel
      case (n, WText(v)) => n -> v
      case (n, WBinary(b)) => n -> b.map(x => f"${x & 0xff}%02x").mkString
    }.toMap

  test("insert round-trips for arbitrary relations and images") {
    check(Prop.forAll(genRelation.flatMap(r => Gen.listOfN(r.columns.size, genValue).map(r -> _))) {
      case (rel, vals) =>
        val d = new Decoder
        val noEvent = d.decode(Encoder.relation(rel), 1, 0).isEmpty
        val ev = d.decode(Encoder.insert(rel.id, vals), 2, 77).get
        noEvent &&
          ev.operation == "INSERT" &&
          ev.schema == rel.schema && ev.table == rel.table &&
          ev.columns == rel.columns.map(_.name) &&
          ev.oldValues.isEmpty &&
          ev.newValues.get == expected(rel, vals) &&
          ev.lsn == 2 && ev.timestampMicros == 77
    })
  }

  test("update round-trips with O and K old images; delete round-trips") {
    check(Prop.forAll(genRelation, Gen.oneOf('O', 'K')) { (rel, tag) =>
      val d = new Decoder
      d.decode(Encoder.relation(rel), 1, 0)
      val old = rel.columns.map(_ => WText("old"): WireValue)
      val neu = rel.columns.map(_ => WText("new"): WireValue)
      val up = d.decode(Encoder.update(rel.id, Some((tag, old)), neu), 2, 0).get
      val del = d.decode(Encoder.delete(rel.id, tag, old), 3, 0).get
      up.operation == "UPDATE" &&
        up.oldValues.get == expected(rel, old) &&
        up.newValues.get == expected(rel, neu) &&
        del.operation == "DELETE" &&
        del.oldValues.get == expected(rel, old) &&
        del.newValues.isEmpty
    })
  }

  test("update without old image yields empty oldValues") {
    val d = new Decoder
    d.decode(Encoder.relation(UsersFixture.relation), 1, 0)
    val neu = UsersFixture.Cols.map(_ => WText("x"))
    val ev = d.decode(Encoder.update(UsersFixture.RelId, None, neu), 2, 0).get
    assert(ev.oldValues.isEmpty && ev.newValues.nonEmpty)
  }

  test("B/C markers and unknown message types decode to no event") {
    val d = new Decoder
    assert(d.decode(Encoder.begin(), 1, 0).isEmpty)
    assert(d.decode(Encoder.commit(), 2, 0).isEmpty)
    assert(d.decode(Array('Z'.toByte, 1, 2, 3), 3, 0).isEmpty)
    assert(d.decode(Array.emptyByteArray, 4, 0).isEmpty)
  }

  test("changes for unregistered relations are dropped and counted") {
    val d = new Decoder
    assert(d.decode(Encoder.insert(42, Seq(WText("v"))), 1, 0).isEmpty)
    assert(d.droppedUnknownRelation == 1)
  }

  test("truncate decodes one imageless event per known relation, txn-stamped") {
    val d = new Decoder
    d.decode(Encoder.relation(UsersFixture.relation), 1, 0)
    d.decode(Encoder.begin(), 5, 0)
    // one known + one unknown relation in the same frame
    val evts = d.decodeAll(
      Encoder.truncate(Seq(UsersFixture.RelId, 4242), optionBits = 3), 6, 77)
    assert(evts.length == 1)
    val e = evts.head
    assert(e.operation == "TRUNCATE")
    assert(e.table == UsersFixture.relation.table)
    assert(e.columns == UsersFixture.relation.columns.map(_.name))
    assert(e.oldValues.isEmpty && e.newValues.isEmpty)
    assert(e.lsn == 6L && e.timestampMicros == 77L)
    assert(e.txnSeq.contains(5L)) // inside the B..C span
    assert(d.droppedUnknownRelation == 1)
    d.decode(Encoder.commit(), 7, 0)
    // decode (single-event view) still sees a multi-relation frame's head
    d.decode(Encoder.relation(UsersFixture.relation), 8, 0)
    assert(d.decode(Encoder.truncate(Seq(UsersFixture.RelId)), 9, 0).exists(_.operation == "TRUNCATE"))
  }

  test("logical decoding Message surfaces as an ignorable MESSAGE event") {
    val d = new Decoder
    d.decode(Encoder.begin(), 1, 0)
    val evts = d.decodeAll(
      Encoder.message("graft.watermark", Array[Byte](0x00, 0x7F, 0xFF.toByte), transactional = true), 2, 9)
    assert(evts.length == 1)
    val e = evts.head
    assert(e.operation == "MESSAGE" && e.table == "graft.watermark")
    assert(e.newValues.get("content") == "007fff")
    assert(e.newValues.get("transactional") == "t")
    assert(e.txnSeq.contains(1L) && e.lsn == 2L && e.timestampMicros == 9L)
    // declared content length beyond the buffer is malformed, not a crash
    val bad = Encoder.message("p", Array[Byte](1, 2, 3))
    intercept[MalformedFrame] {
      d.decodeAll(bad.take(bad.length - 2), 3, 0)
    }
  }

  test("truncated frames raise MalformedFrame") {
    val d = new Decoder
    d.decode(Encoder.relation(UsersFixture.relation), 1, 0)
    val full = Encoder.insert(UsersFixture.RelId, UsersFixture.Cols.map(_ => WText("abcdef")))
    intercept[MalformedFrame] {
      d.decode(full.take(full.length - 3), 2, 0)
    }
  }

  test("tuple wider than the registered relation raises MalformedFrame; PERMISSIVE drops it") {
    val d = new Decoder
    d.decode(Encoder.relation(UsersFixture.relation), 1, 0)
    // 7 wire columns against a 6-column relation (ALTER TABLE racing
    // the next R-frame) — must be MalformedFrame, not IndexOutOfBounds
    val wide = Encoder.insert(UsersFixture.RelId, (0 to 6).map(i => WText(s"v$i")))
    intercept[MalformedFrame] { d.decode(wide, 2, 0) }
    // and the PERMISSIVE path survives it
    val evs = CdcDecode.decodeSeq(
      Seq(
        CdcFrame(1, 0, Encoder.relation(UsersFixture.relation)),
        CdcFrame(2, 0, wide),
        CdcFrame(3, 0, Encoder.insert(UsersFixture.RelId, UsersFixture.Cols.map(_ => WText("x"))))),
      dropMalformed = true)
    assert(evs.map(_.lsn) == Seq(3L))
  }

  test("decodeSeq over the users fixture yields the golden event sequence") {
    val evs = CdcDecode.decodeSeq(UsersFixture.frames)
    assert(evs.map(_.operation) == Seq("INSERT", "UPDATE", "DELETE", "INSERT", "UPDATE"))
    assert(evs.map(_.lsn) == Seq(1002L, 1005L, 1008L, 1011L, 1012L))
    // B/C markers stamp a txn id = the Begin frame's LSN (fixture B
    // frames sit at 1001/1004/1007); bare frames carry none
    assert(evs.map(_.txnSeq) == Seq(Some(1001L), Some(1004L), Some(1007L), None, None))
    val up = evs(1)
    assert(up.newValues.get("email") == CdcEvent.UnchangedSentinel)
    val bin = evs(3)
    assert(bin.newValues.get("status") == "cafe") // 'b' tag → lowercase hex
    assert(bin.newValues.get("email") == null)    // 'n' tag → NULL
  }

  test("hostile value length: a frame declaring 2 GB of value bytes is MalformedFrame, never an allocation") {
    val d = new Decoder
    d.decode(Encoder.relation(UsersFixture.relation), 1, 0)
    // hand-build an INSERT whose first column declares Int.MaxValue bytes
    val bos = new java.io.ByteArrayOutputStream()
    bos.write('I'); bos.write(Array[Byte](0, 0, 0x40, 0))        // relid 16384
    bos.write('N'); bos.write(Array[Byte](0, 6))                 // 6 wire columns
    bos.write('t'); bos.write(Array[Byte](0x7f, -1, -1, -1))     // len = Int.MaxValue
    intercept[MalformedFrame] { d.decode(bos.toByteArray, 2, 0) }
  }

  test("fuzz: arbitrary frame bytes decode to events or MalformedFrame — never raw runtime exceptions") {
    val d = new Decoder
    d.decode(Encoder.relation(UsersFixture.relation), 1, 0)
    val anyBytes = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    val genFrame: Gen[Array[Byte]] = Gen.oneOf(
      anyBytes,
      // a known dispatch byte + random tail: drives the per-type parsers
      for { t <- Gen.oneOf("RIUDTMBCYOSEcA".toSeq); tail <- anyBytes }
        yield (t.toByte +: tail).toArray,
      // a change frame addressing the REGISTERED relation + random
      // tail: drives readTuple's tag/length handling specifically
      for { t <- Gen.oneOf('I', 'U', 'D'); tail <- anyBytes }
        yield Array[Byte](t.toByte, 0, 0, 0x40, 0) ++ tail)
    var lsn = 100L
    check(Prop.forAll(genFrame) { bytes =>
      lsn += 1
      try { d.decodeAll(bytes, lsn, 0); true }
      catch {
        case _: MalformedFrame => true
        case _: IllegalStateException => true // documented buffer-cap failure mode
      } // anything else (underflow, OOB, negative-size alloc) fails the property
    })
  }

  test("v2 streamed buffering is replay-idempotent: re-decoding a frame range never double-buffers") {
    val d = new Decoder
    d.decode(Encoder.relation(UsersFixture.relation), 1, 0)
    val xid = 31337
    val img = UsersFixture.Cols.map(c => WText(s"v-$c"))
    val seg = Seq[(Array[Byte], Long)](
      (Encoder.streamStart(xid), 10L),
      (Encoder.insert(UsersFixture.RelId, img, streamXid = Some(xid)), 11L),
      (Encoder.update(UsersFixture.RelId, Some(('O', img)), img, streamXid = Some(xid)), 12L),
      (Encoder.streamStop(), 13L))
    seg.foreach { case (p, l) => d.decodeAll(p, l, 0) }
    assert(d.bufferedStreamedEvents == 2L)
    // a speculative retry / second action replays the SAME frames into
    // the shared per-stream decoder — the lsn watermark must skip them
    seg.foreach { case (p, l) => d.decodeAll(p, l, 0) }
    assert(d.bufferedStreamedEvents == 2L, "replay must not double-buffer")
    val evts = d.decodeAll(Encoder.streamCommit(xid, 1700000000000000L), 14, 0)
    assert(evts.map(_.operation) == Seq("INSERT", "UPDATE"), "commit emits each event once")
    // after commit the watermark clears: a FULL re-decode of the whole
    // txn (txnAtomic batch retry) rebuilds and re-emits identically
    seg.foreach { case (p, l) => d.decodeAll(p, l, 0) }
    val again = d.decodeAll(Encoder.streamCommit(xid, 1700000000000000L), 14, 0)
    assert(again.map(_.operation) == Seq("INSERT", "UPDATE"))
  }

  test("truncated in-segment v2 frame raises MalformedFrame (not raw underflow); PERMISSIVE drops it") {
    val d = new Decoder
    d.decode(Encoder.relation(UsersFixture.relation), 1, 0)
    d.decodeAll(Encoder.streamStart(4242), 2, 0)
    // 1-byte 'I' payload: the v2 xid-prefix read itself underflows
    intercept[MalformedFrame] { d.decodeAll(Array('I'.toByte), 3, 0) }
    val evs = CdcDecode.decodeSeq(
      Seq(
        CdcFrame(1, 0, Encoder.relation(UsersFixture.relation)),
        CdcFrame(2, 0, Encoder.streamStart(4242)),
        CdcFrame(3, 0, Array('I'.toByte)),
        CdcFrame(4, 0, Encoder.streamStop()),
        CdcFrame(5, 0, Encoder.insert(UsersFixture.RelId, UsersFixture.Cols.map(_ => WText("x"))))),
      dropMalformed = true)
    assert(evs.map(_.lsn) == Seq(5L), "PERMISSIVE path survives the truncated in-segment frame")
  }

  test("v2 streamed txn round-trips through the Encoder: buffer, commit, abort") {
    val d = new Decoder
    d.decode(Encoder.relation(UsersFixture.relation), 1, 0)
    val xid = 4242
    val img = UsersFixture.Cols.map(c => WText(s"v-$c"))
    // segment 1: one insert, buffered
    assert(d.decodeAll(Encoder.streamStart(xid), 10, 0).isEmpty)
    assert(d.decodeAll(Encoder.insert(UsersFixture.RelId, img, streamXid = Some(xid)), 11, 0).isEmpty)
    assert(d.decodeAll(Encoder.streamStop(), 12, 0).isEmpty)
    // segment 2: an update and a delete, still buffered
    assert(d.decodeAll(Encoder.streamStart(xid, firstSegment = false), 13, 0).isEmpty)
    assert(d.decodeAll(
      Encoder.update(UsersFixture.RelId, Some(('O', img)), img, streamXid = Some(xid)), 14, 0).isEmpty)
    assert(d.decodeAll(
      Encoder.delete(UsersFixture.RelId, 'K', img, streamXid = Some(xid)), 15, 0).isEmpty)
    assert(d.decodeAll(Encoder.streamStop(), 16, 0).isEmpty)
    assert(d.bufferedStreamedEvents == 3L)
    val commitUs = 1700000000000000L
    val evts = d.decodeAll(Encoder.streamCommit(xid, commitUs), 17, 0)
    assert(evts.map(_.operation) == Seq("INSERT", "UPDATE", "DELETE"))
    assert(evts.forall(_.txnSeq.contains(10L)) && evts.forall(_.commitMicros.contains(commitUs)))
    // a second streamed txn aborted before commit emits nothing
    d.decodeAll(Encoder.streamStart(9999), 20, 0)
    d.decodeAll(Encoder.insert(UsersFixture.RelId, img, streamXid = Some(9999)), 21, 0)
    d.decodeAll(Encoder.streamStop(), 22, 0)
    assert(d.decodeAll(Encoder.streamAbort(9999, 9999), 23, 0).isEmpty)
    assert(d.streamedAbortDiscards == 1L)
    assert(d.decodeAll(Encoder.streamCommit(9999, commitUs), 24, 0).isEmpty)
  }
}
