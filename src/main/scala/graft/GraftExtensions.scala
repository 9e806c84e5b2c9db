package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.graftnative.DotI64
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

/** Library entry point for SQL users: registers graft's native Catalyst
  * expressions AND table functions with the session registries, so
  * `spark.sql("SELECT dot_i64(a, b) ...")` works the same as the
  * Column-API `graftnative.functions.dot_i64`, and
  * `SELECT * FROM graft_planes(12)` yields the deterministic sign-LSH
  * hyperplane table (k, i, hp) that s03/the AnnOps LSH kernels use —
  * the SQL-surface path to reproducing graft LSH buckets in any query.
  *
  * Together these cover Spark's three custom-function altitudes from
  * SQL text: scalar codegen'd Expression (dot_i64), typed Aggregator
  * UDAF (functions.TopKByAggregator via `udaf`, q42), and a
  * table-valued function (graft_planes).
  *
  * Wire it with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * at session build time (the standard third-party extension mechanism —
  * works on any cluster without code changes to the application).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_i64"),
      // 3-arg constructor: the 5-arg (usage, extended) form is
      // deprecated since 3.0; usage lives in DotI64's scaladoc
      new ExpressionInfo(classOf[DotI64].getName, null, "dot_i64"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"dot_i64 expects 2 arguments, got ${args.length}")
        DotI64(args(0), args(1))
      }))

    // Dedup-pipeline signature kernels as SQL scalar functions: a
    // SQL-only consumer reproduces the engine's shingle/MinHash/SimHash
    // values byte-for-byte without the DataFrame facades. StaticInvoke
    // binds the pure JVM kernel straight into generated code — no
    // ScalaUDF serialization, null-propagating, codegen-friendly.
    val stringArray = ArrayType(StringType, containsNull = false)
    val kernelFns = Seq(
      ("graft_simhash32", "simhash32", "(text)",
        LongType: org.apache.spark.sql.types.DataType,
        Seq[org.apache.spark.sql.types.DataType](StringType)),
      ("graft_shingles", "shingles", "(text, k)", stringArray,
        Seq[org.apache.spark.sql.types.DataType](
          StringType, IntegerType)),
      ("graft_minhash", "minhash", "(text, k, nh)", stringArray,
        Seq[org.apache.spark.sql.types.DataType](
          StringType, IntegerType, IntegerType)))
    kernelFns.foreach { case (sqlName, method, usage, ret, ins) =>
      ext.injectFunction((
        FunctionIdentifier(sqlName),
        new ExpressionInfo(graft.functions.SqlKernels.getClass.getName,
          null, sqlName),
        (args: Seq[Expression]) => {
          require(args.length == ins.length,
            s"$sqlName expects ${ins.length} arguments $usage, " +
              s"got ${args.length}")
          StaticInvoke(graft.functions.SqlKernels.getClass, ret, method,
            args, inputTypes = ins, returnNullable = false)
        }))
    }

    ext.injectTableFunction((
      FunctionIdentifier("graft_planes"),
      // 3-arg constructor (5-arg deprecated): graft_planes(np) yields
      // the deterministic sign-LSH hyperplane table (k, i, hp) — np
      // planes x 64 dims, hp = md5-derived integer in [-2^31, 2^31)
      new ExpressionInfo(
        classOf[GraftExtensions].getName, null, "graft_planes"),
      (args: Seq[Expression]) => {
        require(args.length == 1 && args.head.foldable,
          "graft_planes expects one literal argument: the plane count")
        // range-check BEFORE narrowing: a Long literal like 2^32+1
        // must fail loudly, never wrap to a wrong-sized table
        val npLong = args.head.eval() match {
          case i: Int  => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"graft_planes: integer plane count expected, got $other")
        }
        require(npLong >= 1 && npLong <= 4096,
          s"graft_planes: np out of range: $npLong")
        val np = npLong.toInt
        val md = java.security.MessageDigest.getInstance("MD5")
        val rows = for { k <- 0 until np; i <- 0 until 64 } yield
          InternalRow(k, i, graft.operators.AnnOps.hyperplane(md, k, i))
        LocalRelation(
          Seq(AttributeReference("k", IntegerType, nullable = false)(),
            AttributeReference("i", IntegerType, nullable = false)(),
            AttributeReference("hp", LongType, nullable = false)()),
          rows)
      }))
  }
}
