package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary Avro decode/encode for the `CustomerEvent` wire record (S4).
  *
  * The reference's declared wire contract is a raw binary Avro datum —
  * no container file, no schema-registry framing — of the fixed 10-field
  * record (reference: kafka/schemas/customer_events.avsc:1-71; the
  * producer serializes with `avro.io.BinaryEncoder` at
  * kafka/producer/produce_events.py:79-89). The schema is closed and
  * tiny, so rather than a generic Avro runtime (no spark-avro jar in
  * this environment) this is a ~100-line schema-specialized codec built
  * from the public Avro 1.11 binary-encoding spec:
  *
  *   - int/long: zigzag then little-endian base-128 varint;
  *   - string:   long(byte length) + UTF-8 bytes;
  *   - boolean:  one byte 0/1;
  *   - enum:     int index into the symbol table;
  *   - union:    long branch index, then the branch value;
  *   - record:   field values concatenated in schema order.
  *
  * Field order (avsc): id s, name s, email s, signup_ts long
  * (timestamp-millis logical → plain long here), country s, plan
  * enum{free,basic,premium,enterprise}, event_ts long, version int,
  * marketing_opt_in union{null,boolean}, customer_segment
  * union{null,string}.
  *
  * Both directions are exposed as codegen'd Catalyst expressions
  * ([[AvroEncodeCustomerEvent]] / [[AvroDecodeCustomerEvent]]) so at
  * scale the decode runs map-side inside whole-stage codegen directly on
  * the Kafka `value` binary column — the `ce_avro_decoded` query pins
  * encode∘decode = id against the DuckDB oracle, and AvroSpec pins the
  * byte layout itself against hand-computed spec values (so the pair
  * can't be self-consistently wrong).
  */
object AvroBinary {

  // ---- primitive writers ----------------------------------------------------

  final class Writer(initial: Int = 64) {
    private var buf = new Array[Byte](initial)
    private var pos = 0

    private def ensure(n: Int): Unit =
      if (pos + n > buf.length) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, pos + n))
      }

    /** zigzag + base-128 varint (spec: "int and long values are written
      * using variable-length zig-zag coding").
      */
    def writeLong(v: Long): Unit = {
      var z = (v << 1) ^ (v >> 63)
      ensure(10)
      while ((z & ~0x7fL) != 0) {
        buf(pos) = ((z & 0x7f) | 0x80).toByte; pos += 1; z >>>= 7
      }
      buf(pos) = z.toByte; pos += 1
    }

    def writeInt(v: Int): Unit = writeLong(v.toLong)

    def writeBoolean(v: Boolean): Unit = {
      ensure(1); buf(pos) = if (v) 1 else 0; pos += 1
    }

    def writeBytes(b: Array[Byte]): Unit = {
      writeLong(b.length.toLong)
      ensure(b.length)
      System.arraycopy(b, 0, buf, pos, b.length)
      pos += b.length
    }

    def writeString(s: UTF8String): Unit = writeBytes(s.getBytes)

    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, pos)
  }

  // ---- primitive readers ----------------------------------------------------

  final class Reader(bytes: Array[Byte]) {
    private var pos = 0

    def readLong(): Long = {
      var b = bytes(pos); pos += 1
      var z = (b & 0x7f).toLong
      var shift = 7
      while ((b & 0x80) != 0) {
        b = bytes(pos); pos += 1
        z |= (b & 0x7f).toLong << shift
        shift += 7
      }
      (z >>> 1) ^ -(z & 1) // un-zigzag
    }

    def readInt(): Int = readLong().toInt

    def readBoolean(): Boolean = { val b = bytes(pos); pos += 1; b != 0 }

    def readString(): UTF8String = {
      val n = readLong().toInt
      val s = UTF8String.fromBytes(bytes, pos, n)
      pos += n
      s
    }

    def exhausted: Boolean = pos == bytes.length
  }
}

/** Schema-specialized encode/decode for `CustomerEvent` (static methods
  * so the expressions stay inside whole-stage codegen via `defineCodeGen`
  * static calls, same pattern as [[graft.functions.ShingleUtil]]).
  */
object CustomerEventAvro {

  val PlanSymbols: IndexedSeq[String] =
    IndexedSeq("free", "basic", "premium", "enterprise")

  private val planUtf8 = PlanSymbols.map(UTF8String.fromString)

  /** The decoded (= encoder input) struct shape, avsc field order. */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("email", StringType, nullable = false),
    StructField("signup_ts", LongType, nullable = false),
    StructField("country", StringType, nullable = false),
    StructField("plan", StringType, nullable = false),
    StructField("event_ts", LongType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("marketing_opt_in", BooleanType, nullable = true),
    StructField("customer_segment", StringType, nullable = true)))

  /** Serialize one event struct to a raw binary Avro datum. Non-nullable
    * schema fields must be non-null and `plan` must be one of the enum
    * symbols — same precondition the reference producer's DatumWriter
    * enforces.
    */
  def encode(row: InternalRow): Array[Byte] = {
    val w = new AvroBinary.Writer()
    w.writeString(row.getUTF8String(0))            // id
    w.writeString(row.getUTF8String(1))            // name
    w.writeString(row.getUTF8String(2))            // email
    w.writeLong(row.getLong(3))                    // signup_ts
    w.writeString(row.getUTF8String(4))            // country
    val plan = row.getUTF8String(5).toString       // plan: enum index
    val planIdx = PlanSymbols.indexOf(plan)
    require(planIdx >= 0, s"not an avro enum symbol: $plan")
    w.writeInt(planIdx)
    w.writeLong(row.getLong(6))                    // event_ts
    w.writeInt(row.getInt(7))                      // version
    if (row.isNullAt(8)) w.writeLong(0L)           // union branch: null
    else { w.writeLong(1L); w.writeBoolean(row.getBoolean(8)) }
    if (row.isNullAt(9)) w.writeLong(0L)
    else { w.writeLong(1L); w.writeString(row.getUTF8String(9)) }
    w.result()
  }

  /** [[decode]] that returns null on ANY malformed datum (truncated
    * buffer, bad enum index, trailing bytes) instead of throwing — the
    * streaming contract: unparseable payloads yield null columns, same
    * as the JSON path's `from_json` (EventPipeline.parse), so one
    * corrupt Kafka message can never fail a micro-batch.
    */
  def decodeOrNull(bytes: Array[Byte]): InternalRow =
    try decode(bytes) catch { case scala.util.control.NonFatal(_) => null }

  /** Decode one raw binary Avro datum; rejects trailing garbage. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val r = new AvroBinary.Reader(bytes)
    val out = new GenericInternalRow(10)
    out.update(0, r.readString())
    out.update(1, r.readString())
    out.update(2, r.readString())
    out.update(3, r.readLong())
    out.update(4, r.readString())
    out.update(5, planUtf8(r.readInt()))
    out.update(6, r.readLong())
    out.update(7, r.readInt())
    if (r.readLong() == 0L) out.setNullAt(8) else out.update(8, r.readBoolean())
    if (r.readLong() == 0L) out.setNullAt(9) else out.update(9, r.readString())
    require(r.exhausted, "trailing bytes after CustomerEvent datum")
    out
  }
}

/** `avro_encode_ce(struct)` → binary: serialize a CustomerEvent struct
  * (shape = [[CustomerEventAvro.schema]], by position) to its wire datum.
  */
case class AvroEncodeCustomerEvent(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType
        if s.fields.map(_.dataType).sameElements(
          CustomerEventAvro.schema.fields.map(_.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"avro_encode_ce requires the CustomerEvent struct, got $t")
  }

  override def dataType: DataType = BinaryType

  override def prettyName: String = "avro_encode_ce"

  override def nullSafeEval(input: Any): Any =
    CustomerEventAvro.encode(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.sources.CustomerEventAvro.encode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): AvroEncodeCustomerEvent = copy(child = newChild)
}

/** `avro_decode_ce(binary)` → CustomerEvent struct: parse one wire
  * datum. Malformed datums decode to a NULL struct (never an exception)
  * — the same poison-pill contract as the JSON path's `from_json`.
  */
case class AvroDecodeCustomerEvent(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"avro_decode_ce requires binary input, got $t")
  }

  override def dataType: DataType = CustomerEventAvro.schema

  override def nullable: Boolean = true

  override def prettyName: String = "avro_decode_ce"

  override def nullSafeEval(input: Any): Any =
    CustomerEventAvro.decodeOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.sources.CustomerEventAvro.decodeOrNull($c);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): AvroDecodeCustomerEvent = copy(child = newChild)
}
