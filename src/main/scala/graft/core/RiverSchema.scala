package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._

/** The seven river field types (reference: cpp/src/schema.h:29-37) and
  * their Spark mappings (SURVEY.md §1.2).
  */
// Serializable: schemas ride inside DSv2 InputPartitions/WriterFactories
// to executor tasks; a non-serializable superclass fails deserialization
// for the FixedWidthBytes/VariableWidthBytes case classes ("no valid
// constructor") even though case classes themselves are Serializable.
sealed abstract class RiverType(val wireName: String, val fixedSize: Option[Int])
  extends Serializable {
  def sparkType: DataType
}
object RiverType {
  case object Double64 extends RiverType("DOUBLE", Some(8)) {
    val sparkType = DoubleType
  }
  case object Float32 extends RiverType("FLOAT", Some(4)) {
    val sparkType = FloatType
  }
  case object Int16 extends RiverType("INT16", Some(2)) {
    val sparkType = ShortType
  }
  case object Int32 extends RiverType("INT32", Some(4)) {
    val sparkType = IntegerType
  }
  case object Int64 extends RiverType("INT64", Some(8)) {
    val sparkType = LongType
  }
  final case class FixedWidthBytes(size: Int) extends RiverType("FIXED_WIDTH_BYTES", Some(size)) {
    val sparkType = BinaryType
  }
  /** Max size is declared; per-sample actual sizes travel with the data.
    * Must be the only field in its schema (cpp/src/schema.h:19-23).
    */
  final case class VariableWidthBytes(maxSize: Int) extends RiverType("VARIABLE_WIDTH_BYTES", None) {
    val sparkType = BinaryType
  }
}

/** name + type, reference cpp/src/schema.h:24-43. */
final case class RiverField(name: String, tpe: RiverType)

/** A stream's immutable schema. One schema per stream for its lifetime
  * (cpp/src/schema.h:45-48). JSON wire format byte-compatible with the
  * reference (`{"field_definitions":[{name,size,type}]}`,
  * cpp/src/schema.cpp:12-48).
  */
final case class RiverSchema(fields: Seq[RiverField]) {
  require(fields.nonEmpty, "schema needs at least one field")
  require(
    !hasVariableWidth || fields.size == 1,
    "a VARIABLE_WIDTH_BYTES field must be the only field in the schema")

  def hasVariableWidth: Boolean =
    fields.exists(_.tpe.isInstanceOf[RiverType.VariableWidthBytes])

  /** Packed byte size of one sample (sum of field sizes); for a
    * variable-width schema this is the declared max.
    */
  def sampleSize: Int = fields.map {
    case RiverField(_, RiverType.VariableWidthBytes(max)) => max
    case RiverField(_, t)                                 => t.fixedSize.get
  }.sum

  /** Spark-facing shape of the raw stream (no derived columns). All
    * fields non-nullable: river has no nulls (ingester.cpp:729-731).
    */
  def toStructType: StructType =
    StructType(fields.map(f => StructField(f.name, f.tpe.sparkType, nullable = false)))

  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val fs = fields.map { f =>
      val size = f.tpe match {
        case RiverType.VariableWidthBytes(max) => max
        case t                                 => t.fixedSize.get
      }
      s"""{"name":"${esc(f.name)}","size":$size,"type":"${f.tpe.wireName}"}"""
    }
    s"""{"field_definitions":[${fs.mkString(",")}]}"""
  }
}

object RiverSchema {

  /** Parse the reference wire format. Tolerates `size` as int or string
    * (reference schema.cpp:57-61). Minimal JSON scanning — the format is
    * flat and we avoid external deps. Known limit: a field NAME
    * containing a literal brace would mis-split the object scan; names
    * with quotes, backslashes, control chars, and unicode round-trip
    * (property-checked in RiverSchemaSpec).
    */
  def fromJson(json: String): RiverSchema = {
    val fieldRe =
      """\{\s*"name"\s*:\s*"((?:[^"\\]|\\.)*)"\s*,\s*"size"\s*:\s*"?(\d+)"?\s*,\s*"type"\s*:\s*"(\w+)"\s*\}""".r
    // also tolerate key order variations by a second pass per object
    val objRe = """\{[^{}]*\}""".r
    val kvName = """"name"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val kvSize = """"size"\s*:\s*"?(\d+)"?""".r
    val kvType = """"type"\s*:\s*"(\w+)"""".r
    val inner = json.indexOf('[')
    val end = json.lastIndexOf(']')
    require(inner >= 0 && end > inner, s"malformed schema json: $json")
    val body = json.substring(inner + 1, end)
    val fields = objRe.findAllIn(body).map { obj =>
      val name = unescape(kvName.findFirstMatchIn(obj)
        .getOrElse(sys.error(s"field missing name: $obj")).group(1))
      val size = kvSize.findFirstMatchIn(obj)
        .getOrElse(sys.error(s"field missing size: $obj")).group(1).toInt
      val tpe = kvType.findFirstMatchIn(obj)
        .getOrElse(sys.error(s"field missing type: $obj")).group(1) match {
        case "DOUBLE"               => RiverType.Double64
        case "FLOAT"                => RiverType.Float32
        case "INT16"                => RiverType.Int16
        case "INT32"                => RiverType.Int32
        case "INT64"                => RiverType.Int64
        case "FIXED_WIDTH_BYTES"    => RiverType.FixedWidthBytes(size)
        case "VARIABLE_WIDTH_BYTES" => RiverType.VariableWidthBytes(size)
        case t                      => sys.error(s"invalid river type: $t")
      }
      RiverField(name, tpe)
    }.toSeq
    val _ = fieldRe // documented canonical shape
    RiverSchema(fields)
  }

  /** Inverse of toJson's esc: one left-to-right scan decoding \", \\
    * and \uXXXX (sequential String.replace mis-decodes adjacent
    * escapes, and never handled \u at all).
    */
  private def unescape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case '"'  => sb.append('"'); i += 2
        case '\\' => sb.append('\\'); i += 2
        // JSON short escapes: the reference serializes schemas with a
        // standard JSON library that emits \b \f \n \r \t (and may emit
        // \/) for control characters in field names — decode them all,
        // not just this repo's own toJson subset.
        case '/'  => sb.append('/'); i += 2
        case 'b'  => sb.append('\b'); i += 2
        case 'f'  => sb.append('\f'); i += 2
        case 'n'  => sb.append('\n'); i += 2
        case 'r'  => sb.append('\r'); i += 2
        case 't'  => sb.append('\t'); i += 2
        case 'u' if i + 6 <= s.length =>
          sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
          i += 6
        case _ => sb.append(c); i += 1
      }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Inverse of [[RiverSchema.toStructType]] for the supported scalars. */
  def fromStructType(st: StructType): RiverSchema =
    RiverSchema(st.fields.toSeq.map { f =>
      val t = f.dataType match {
        case DoubleType  => RiverType.Double64
        case FloatType   => RiverType.Float32
        case ShortType   => RiverType.Int16
        case IntegerType => RiverType.Int32
        case LongType    => RiverType.Int64
        // Event-time columns: river has no timestamp type — the reference
        // itself stores time as plain int64 (the derived `timestamp_ms`
        // column, cpp/ingester/src/ingester.cpp:318-326). Map Spark
        // timestamps to INT64 epoch NANOS at create; the connector's
        // writer converts Spark's internal micros on the way in, so a
        // round-trip reads back as the engine's nanos-long contract.
        case TimestampType | TimestampNTZType => RiverType.Int64
        case BinaryType  => sys.error(
          s"binary field ${f.name}: choose FixedWidthBytes(n) or VariableWidthBytes(n) explicitly")
        case dt => sys.error(s"unsupported river type for field ${f.name}: $dt")
      }
      RiverField(f.name, t)
    })
}

/** Pack/unpack between JVM values and the packed little-endian C-struct
  * sample bytes (reference: row buffers are reinterpret-cast structs,
  * cpp/src/writer.h:144-150, cpp/src/reader.cpp:226-232).
  */
final class RowCodec(schema: RiverSchema) {
  private val size = schema.sampleSize

  /** Pack one sample (one value per field, in schema order). */
  def pack(values: Seq[Any]): Array[Byte] = {
    require(values.length == schema.fields.length,
      s"expected ${schema.fields.length} values, got ${values.length}")
    schema.fields.head.tpe match {
      case RiverType.VariableWidthBytes(max) =>
        val b = values.head.asInstanceOf[Array[Byte]]
        require(b.length <= max, s"variable-width sample ${b.length} > max $max")
        b.clone()
      case _ =>
        val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
        schema.fields.zip(values).foreach {
          case (RiverField(_, RiverType.Double64), v) => buf.putDouble(v.asInstanceOf[Double])
          case (RiverField(_, RiverType.Float32), v)  => buf.putFloat(v.asInstanceOf[Float])
          case (RiverField(_, RiverType.Int16), v)    => buf.putShort(v.asInstanceOf[Short])
          case (RiverField(_, RiverType.Int32), v)    => buf.putInt(v.asInstanceOf[Int])
          case (RiverField(_, RiverType.Int64), v)    => buf.putLong(v.asInstanceOf[Long])
          case (RiverField(n, RiverType.FixedWidthBytes(sz)), v) =>
            val b = v.asInstanceOf[Array[Byte]]
            require(b.length == sz, s"field $n: expected $sz bytes, got ${b.length}")
            buf.put(b)
          case (RiverField(n, t), _) => sys.error(s"field $n: unexpected type $t")
        }
        buf.array()
    }
  }

  // per-field extractors resolved once (a per-row match over the field
  // list showed up at multi-M-samples/s read rates)
  private val extractors: Array[ByteBuffer => Any] = schema.fields.map {
    case RiverField(_, RiverType.Double64) => (b: ByteBuffer) => b.getDouble()
    case RiverField(_, RiverType.Float32)  => (b: ByteBuffer) => b.getFloat()
    case RiverField(_, RiverType.Int16)    => (b: ByteBuffer) => b.getShort()
    case RiverField(_, RiverType.Int32)    => (b: ByteBuffer) => b.getInt()
    case RiverField(_, RiverType.Int64)    => (b: ByteBuffer) => b.getLong()
    case RiverField(_, RiverType.FixedWidthBytes(sz)) => (b: ByteBuffer) =>
      { val a = new Array[Byte](sz); b.get(a); a }
    case RiverField(_, RiverType.VariableWidthBytes(_)) =>
      (b: ByteBuffer) => sys.error("variable-width handled separately")
  }.toArray

  /** Unpack one sample to one value per field, in schema order. */
  def unpack(bytes: Array[Byte]): Seq[Any] =
    schema.fields.head.tpe match {
      case RiverType.VariableWidthBytes(_) => Seq(bytes)
      case _ =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Any](extractors.length)
        var i = 0
        while (i < extractors.length) { out(i) = extractors(i)(buf); i += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
}
