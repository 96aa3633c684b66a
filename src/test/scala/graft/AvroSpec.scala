package graft

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroBinary, CustomerEventAvro}

/** S4 binary Avro codec: byte layout pinned against values hand-computed
  * from the public Avro binary-encoding spec (zigzag varints, length-
  * prefixed strings, enum index, union branch index), plus the Spark-side
  * encode∘decode = id round trip on the synthesized fixture events.
  */
class AvroSpec extends AnyFunSuite {
  import SparkTestSession._

  private def row(values: Any*): GenericInternalRow = {
    val r = new GenericInternalRow(values.length)
    values.zipWithIndex.foreach {
      case (null, i) => r.setNullAt(i)
      case (s: String, i) => r.update(i, UTF8String.fromString(s))
      case (v, i) => r.update(i, v)
    }
    r
  }

  test("varint zigzag primitives match the Avro spec") {
    def enc(v: Long): Seq[Int] = {
      val w = new AvroBinary.Writer()
      w.writeLong(v)
      w.result().map(_ & 0xff).toSeq
    }
    // spec examples: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    assert(enc(0) == Seq(0x00))
    assert(enc(-1) == Seq(0x01))
    assert(enc(1) == Seq(0x02))
    assert(enc(-2) == Seq(0x03))
    assert(enc(2) == Seq(0x04))
    assert(enc(-64) == Seq(0x7f))
    assert(enc(64) == Seq(0x80, 0x01))
    assert(enc(1000) == Seq(0xd0, 0x0f)) // zigzag(1000)=2000=0xfd0
    assert(enc(Long.MaxValue) ==
      Seq(0xfe, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01))
    assert(enc(Long.MinValue) ==
      Seq(0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01))
    // and every round trip inverts
    Seq(0L, 1L, -1L, 63L, -64L, 64L, -65L, 1000L, -123456789L,
      Long.MaxValue, Long.MinValue).foreach { v =>
      val w = new AvroBinary.Writer(); w.writeLong(v)
      assert(new AvroBinary.Reader(w.result()).readLong() == v)
    }
  }

  test("CustomerEvent datum bytes match the hand-computed wire layout") {
    val bytes = CustomerEventAvro.encode(row(
      "ab", "n", "e@x.io", 1000L, "US", "basic", -1L, 1,
      java.lang.Boolean.TRUE, null))
    val expected = Seq(
      0x04, 'a', 'b',                     // id: len 2 + bytes
      0x02, 'n',                          // name
      0x0c, 'e', '@', 'x', '.', 'i', 'o', // email: len 6 + bytes
      0xd0, 0x0f,                         // signup_ts 1000 → zigzag varint
      0x04, 'U', 'S',                     // country
      0x02,                               // plan enum index 1 (basic)
      0x01,                               // event_ts -1 → zigzag 1
      0x02,                               // version 1
      0x02, 0x01,                         // union branch 1, boolean true
      0x00                                // union branch 0 (null)
    ).map(_.toInt & 0xff)
    assert(bytes.map(_ & 0xff).toSeq == expected)
  }

  test("decode of a hand-built datum recovers the fields") {
    // built by hand (NOT via the encoder): id "x", name "y", email "z",
    // signup_ts 2, country "DE", plan enterprise (3), event_ts 0,
    // version 2, marketing null, segment "standard"
    val datum = (Seq(0x02, 'x'.toInt, 0x02, 'y'.toInt, 0x02, 'z'.toInt,
      0x04, 0x04, 'D'.toInt, 'E'.toInt, 0x06, 0x00, 0x04, 0x00, 0x02,
      0x10) ++ "standard".getBytes("UTF-8").map(_.toInt))
      .map(_.toByte).toArray
    val r = CustomerEventAvro.decode(datum)
    assert(r.getUTF8String(0).toString == "x")
    assert(r.getUTF8String(1).toString == "y")
    assert(r.getUTF8String(2).toString == "z")
    assert(r.getLong(3) == 2L)
    assert(r.getUTF8String(4).toString == "DE")
    assert(r.getUTF8String(5).toString == "enterprise")
    assert(r.getLong(6) == 0L)
    assert(r.getInt(7) == 2)
    assert(r.isNullAt(8))
    assert(r.getUTF8String(9).toString == "standard")
  }

  test("corrupt datums decode to null rows, never exceptions (poison pill)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val good = CustomerEventAvro.encode(row(
      "a", "b", "c@x.io", 7L, "US", "free", 8L, 1, null, null))
    val corrupt: Seq[Array[Byte]] = Seq(
      Array[Byte](),                      // empty buffer
      good.take(3),                       // truncated mid-string
      good :+ 0x7f.toByte,                // trailing garbage
      Array.fill[Byte](16)(0x6e.toByte))  // enum index way out of range
    // JVM level: null, not an exception
    corrupt.foreach(b => assert(CustomerEventAvro.decodeOrNull(b) == null))
    // Spark level: the batch survives; only corrupt rows are null
    val rows = (corrupt :+ good).toDF("value")
      .select(graft.functions.GraftFunctions.avroDecodeCe(col("value"))
        .as("ev"))
      .collect()
    assert(rows.take(corrupt.length).forall(_.isNullAt(0)))
    assert(rows.last.getStruct(0).getString(0) == "a")
  }

  test("decode rejects trailing bytes") {
    val good = CustomerEventAvro.encode(row(
      "a", "b", "c", 0L, "US", "free", 0L, 1, null, null))
    intercept[IllegalArgumentException] {
      CustomerEventAvro.decode(good :+ 0x00.toByte)
    }
  }

  test("property: encode∘decode round-trips arbitrary wireable records") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genStr: Gen[String] = Gen.frequency(
      4 -> Gen.asciiPrintableStr,
      // multi-byte UTF-8 exercises the byte-length (not char-count) prefix
      1 -> Gen.stringOf(Gen.frequency(
        3 -> Gen.choose('α', 'ω'), 1 -> Gen.choose('一', '十'))),
      1 -> Gen.const(""))
    val genRec: Gen[(String, String, String, Long, String, String, Long,
        Int, Option[Boolean], Option[String])] = for {
      id <- genStr; name <- genStr; email <- genStr
      signup <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      country <- genStr
      plan <- Gen.oneOf(CustomerEventAvro.PlanSymbols)
      eventTs <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      version <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      opt <- Gen.option(Gen.oneOf(true, false))
      seg <- Gen.option(genStr)
    } yield (id, name, email, signup, country, plan, eventTs, version,
      opt, seg)
    val params = Gen.Parameters.default
    (0 until 300).foreach { i =>
      val (id, name, email, signup, country, plan, eventTs, version,
        opt, seg) = genRec.pureApply(params, Seed(i.toLong))
      val in = row(id, name, email, signup, country, plan, eventTs,
        version,
        opt.map(java.lang.Boolean.valueOf).orNull,
        seg.orNull)
      val out = CustomerEventAvro.decode(CustomerEventAvro.encode(in))
      assert(out.getUTF8String(0).toString == id, s"seed $i")
      assert(out.getUTF8String(1).toString == name)
      assert(out.getUTF8String(2).toString == email)
      assert(out.getLong(3) == signup)
      assert(out.getUTF8String(4).toString == country)
      assert(out.getUTF8String(5).toString == plan)
      assert(out.getLong(6) == eventTs)
      assert(out.getInt(7) == version)
      assert((if (out.isNullAt(8)) None else Some(out.getBoolean(8))) == opt)
      assert((if (out.isNullAt(9)) None
              else Some(out.getUTF8String(9).toString)) == seg)
    }
  }

  test("Spark-side encode∘decode is the identity on wireable events") {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.{avroDecodeCe, avroEncodeCe}
    val ce = CustomerEvents.synth(Tables(spark, Sf0001).events)
      .filter(col("id").isNotNull && col("name").isNotNull
        && col("email").isNotNull && col("country").isNotNull
        && col("plan").isin(CustomerEventAvro.PlanSymbols: _*))
    val fields = Seq("id", "name", "email", "signup_ts", "country", "plan",
      "event_ts", "version", "marketing_opt_in", "customer_segment")
    // canonical surface carries version as BIGINT; the Avro wire wants int
    val wireCols = fields.map(f =>
      if (f == "version") col(f).cast("int").as("version") else col(f))
    val decoded = ce.select(col("event_id"),
      avroDecodeCe(avroEncodeCe(struct(wireCols: _*))).as("ev"))
    val diff = ce.join(decoded, "event_id")
      .filter(fields.map(f => !(col(f) <=> col(s"ev.$f"))).reduce(_ || _))
    assert(ce.count() > 0)
    assert(diff.count() == 0)
  }
}
