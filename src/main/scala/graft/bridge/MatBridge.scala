package graft.bridge

import java.nio.file.Path

import scala.collection.mutable.ArrayBuffer

import graft.core.{RiverField, RiverSchema, RiverType, StreamStore}
import org.apache.spark.sql.DataFrame

/** River <-> MATLAB data bridge (reference B2). The reference ships MEX
  * wrappers (`matlab/StreamWriter.m:1-60`, `StreamReader.m:1-80`) that
  * bind a live server connection into a MATLAB session; this bridge
  * re-expresses the same two user stories — "get my stream into MATLAB"
  * and "write MATLAB data as a stream" — through the Level 5 MAT-file
  * interchange format ([[MatFile]]), which MATLAB's built-in
  * `load`/`save` handle with no toolchain.
  *
  * Memory model: a .mat variable is a whole in-RAM array on the MATLAB
  * side by construction, so the driver-side materialization here is
  * inherent to the destination, not a scalability bug — this is the
  * small-results/last-mile bridge. Bulk analytics stay in Spark;
  * `maxRows` caps are mandatory arguments on the DataFrame path.
  */
object MatBridge {

  /** Make `raw` a valid MATLAB identifier (letter start, word chars,
    * namelengthmax 63), deduped against `taken`. */
  def sanitizeName(raw: String, taken: Set[String] = Set.empty): String = {
    val cleaned = raw.map(c =>
      if (c.isLetterOrDigit && c < 128 || c == '_') c else '_')
    val led =
      if (cleaned.isEmpty || !cleaned.head.isLetter || cleaned.head >= 128)
        "x" + cleaned
      else cleaned
    val base = led.take(63)
    if (!taken(base)) base
    else Iterator.from(2).map(i => (base.take(63 - (i.toString.length + 1)) +
      "_" + i)).find(!taken(_)).get
  }

  /** Export a river stream to `path` as one N x 1 column vector per
    * field (MATLAB-sanitized names) plus an int64 `sample_idx` vector.
    * Reads to EOF (the writer must have stopped) or `maxRows`,
    * whichever first; returns the row count written. Byte-typed fields
    * have no numeric-matrix representation and are rejected loudly. */
  def exportStream(store: StreamStore, stream: String, path: Path,
      maxRows: Int = Int.MaxValue, timeoutMs: Long = 60000): Long = {
    val schema = store.metadata(stream).schema
    schema.fields.foreach { f =>
      require(f.tpe.isInstanceOf[RiverType.Double64.type] ||
        f.tpe.isInstanceOf[RiverType.Float32.type] ||
        f.tpe.isInstanceOf[RiverType.Int16.type] ||
        f.tpe.isInstanceOf[RiverType.Int32.type] ||
        f.tpe.isInstanceOf[RiverType.Int64.type],
        s"mat bridge: field '${f.name}' has type ${f.tpe}; only numeric " +
          "fields have a MAT numeric-matrix representation")
    }
    val r = store.openReader(stream)
    val idx = new ArrayBuffer[Long]
    val cols = schema.fields.map(_ => new ArrayBuffer[Any]).toArray
    val deadline = System.currentTimeMillis() + timeoutMs
    var done = false
    while (!done && idx.length < maxRows) {
      // a live (never-stopped) stream would otherwise poll forever: the
      // deadline turns the scaladoc precondition into a loud failure
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"mat bridge: stream '$stream' produced no EOF within " +
            s"$timeoutMs ms — is its writer stopped?")
      r.read(math.min(8192, maxRows - idx.length), 2000) match {
        case None => done = true // EOF
        case Some(rows) =>
          rows.foreach { case (_, i, values) =>
            idx += i
            var c = 0
            while (c < cols.length) { cols(c) += values(c); c += 1 }
          }
          if (rows.isEmpty && !r.good()) done = true
      }
    }
    val n = idx.length
    var taken = Set("sample_idx")
    val fieldVars = schema.fields.zipWithIndex.map { case (f, c) =>
      val name = sanitizeName(f.name, taken)
      taken += name
      val data = f.tpe match {
        case RiverType.Double64 =>
          MatFile.Doubles(cols(c).map(_.asInstanceOf[Double]).toArray)
        case RiverType.Float32 =>
          MatFile.Singles(cols(c).map(_.asInstanceOf[Float]).toArray)
        case RiverType.Int16 =>
          MatFile.Int16s(cols(c).map(_.asInstanceOf[Short]).toArray)
        case RiverType.Int32 =>
          MatFile.Int32s(cols(c).map(_.asInstanceOf[Int]).toArray)
        case RiverType.Int64 =>
          MatFile.Int64s(cols(c).map(_.asInstanceOf[Long]).toArray)
        case t => sys.error(s"unreachable: $t gated above")
      }
      MatFile.MatVar(name, n, 1, data)
    }
    MatFile.write(path,
      MatFile.MatVar("sample_idx", n, 1, MatFile.Int64s(idx.toArray)) +:
        fieldVars)
    n.toLong
  }

  /** Create river stream `streamName` from the numeric matrices in a
    * .mat file: every variable (except `sample_idx`, which
    * [[exportStream]] adds) contributes its columns as fields — an
    * N x 1 vector becomes one field named after the variable, an N x C
    * matrix becomes fields `name_1..name_C`. All variables must agree
    * on N. Returns the rows written; the stream is created and
    * finalized here. */
  def importStream(store: StreamStore, streamName: String,
      path: Path): Long = {
    val vars = MatFile.read(path).filterNot(_.name == "sample_idx")
    require(vars.nonEmpty, s"mat bridge: no numeric variables in $path")
    val n = vars.head.rows
    vars.foreach(v => require(v.rows == n,
      s"mat bridge: variable '${v.name}' has ${v.rows} rows, expected $n"))
    val fields = vars.flatMap { v =>
      val tpe = v.data match {
        case _: MatFile.Doubles => RiverType.Double64
        case _: MatFile.Singles => RiverType.Float32
        case _: MatFile.Int16s => RiverType.Int16
        case _: MatFile.Int32s => RiverType.Int32
        case _: MatFile.Int64s => RiverType.Int64
      }
      if (v.cols == 1) Seq(RiverField(v.name, tpe))
      else (1 to v.cols).map(c => RiverField(s"${v.name}_$c", tpe))
    }
    // the N x C suffix expansion can collide with a literally-named
    // variable (matrix 'a' -> a_1 vs a vector named a_1); a duplicate
    // field would silently shadow on every name-keyed read downstream
    val dup = fields.groupBy(_.name).collect { case (n, fs) if fs.size > 1 => n }
    require(dup.isEmpty,
      s"mat bridge: expanded field names collide: ${dup.mkString(", ")} — " +
        "rename the .mat variables")
    val w = store.createStream(streamName, RiverSchema(fields))
    // column-major source: value (row i, col c) of var v sits at c*n + i
    def cell(v: MatFile.MatVar, i: Int, c: Int): Any = v.data match {
      case MatFile.Doubles(a) => a(c * v.rows + i)
      case MatFile.Singles(a) => a(c * v.rows + i)
      case MatFile.Int16s(a) => a(c * v.rows + i)
      case MatFile.Int32s(a) => a(c * v.rows + i)
      case MatFile.Int64s(a) => a(c * v.rows + i)
    }
    var i = 0
    val batch = new ArrayBuffer[Seq[Any]](4096)
    while (i < n) {
      batch.clear()
      val end = math.min(i + 4096, n)
      while (i < end) {
        batch += vars.flatMap(v => (0 until v.cols).map(c => cell(v, i, c)))
        i += 1
      }
      w.write(batch.toSeq)
    }
    w.stop()
    n.toLong
  }

  /** Export a DataFrame's NUMERIC columns (byte/short/int/long/float/
    * double; others have no plain-matrix representation and are listed
    * back untouched) to `path`, `maxRows` capped, one column vector per
    * column. Returns (exported names, skipped names). NULL handling:
    * float/double nulls become NaN (MATLAB's missing marker); integer
    * columns have no such sentinel, so a null integer value is rejected
    * loudly — cast to double (null -> NaN) or fill before exporting.
    * Driver-side collect by design — see the object scaladoc. */
  def exportDataFrame(df: DataFrame, path: Path,
      maxRows: Int): (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields
    val numeric = fields.filter(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
          DoubleType => true
      case _ => false
    })
    val skipped = fields.map(_.name).diff(numeric.map(_.name))
    require(numeric.nonEmpty, "mat bridge: no numeric columns to export")
    val rows = df.select(numeric.map(f =>
      org.apache.spark.sql.functions.col(f.name)).toSeq: _*)
      .limit(maxRows).collect()
    val n = rows.length
    var taken = Set.empty[String]
    val vars = numeric.zipWithIndex.map { case (f, c) =>
      val name = sanitizeName(f.name, taken)
      taken += name
      def noNull(r: org.apache.spark.sql.Row): Unit =
        if (r.isNullAt(c)) throw new IllegalArgumentException(
          s"mat bridge: null in integer column '${f.name}' — integers " +
            "have no MATLAB missing marker; cast to double (null -> NaN) " +
            "or fill before exporting")
      val data = f.dataType match {
        case ByteType =>
          MatFile.Int16s(rows.map { r => noNull(r); r.getByte(c).toShort })
        case ShortType =>
          MatFile.Int16s(rows.map { r => noNull(r); r.getShort(c) })
        case IntegerType =>
          MatFile.Int32s(rows.map { r => noNull(r); r.getInt(c) })
        case LongType =>
          MatFile.Int64s(rows.map { r => noNull(r); r.getLong(c) })
        case FloatType =>
          MatFile.Singles(rows.map(r =>
            if (r.isNullAt(c)) Float.NaN else r.getFloat(c)))
        case DoubleType =>
          MatFile.Doubles(rows.map(r =>
            if (r.isNullAt(c)) Double.NaN else r.getDouble(c)))
        case t => sys.error(s"unreachable: $t filtered above")
      }
      MatFile.MatVar(name, n, 1, data)
    }
    MatFile.write(path, vars.toSeq)
    (vars.map(_.name).toSeq, skipped.toSeq)
  }
}
