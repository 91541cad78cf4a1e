package graft.testgen

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic random-frame generator — the differential-fuzz input
  * the reference leans on for its conformance suite
  * (ref: slide_test/utils.py:93-130, `make_rand_df`).
  *
  * Domains mirror the reference exactly (so join hit rates and group
  * counts match its distributions): ints in [0,10), bools uniform,
  * floats in [0,1) (6 decimal digits, see below), strings
  * `"ssssss0".."ssssss9"`, datetimes `2020-01-01 + [0,10) days`, and
  * exactly `nulls` NULL positions per column, sampled without
  * replacement.
  *
  * The same generated rows render two ways: [[df]] (a Spark DataFrame)
  * and [[valuesSql]] (a DuckDB VALUES subquery), so a query over the
  * frame can be oracle-checked by the driver like any table query. The
  * PRNG is `java.util.Random` — its algorithm is fixed by the JDK spec,
  * so a (seed, spec) pair regenerates identical data on any JVM.
  * Floats are drawn on a 10^6 grid: the decimal text and the double are
  * then exactly convertible in both engines, keeping hash-compare safe
  * while staying dense in [0,1).
  */
object RandFrame {

  sealed trait ColType
  case object CInt extends ColType
  case object CBool extends ColType
  case object CFloat extends ColType
  case object CStr extends ColType
  case object CDateTime extends ColType

  /** extension beyond the reference's domains: minute-granularity
    * timestamps (2020-01-01 + [0, 14400) minutes ≈ 10 days) for fuzzing
    * interval arithmetic / truncation / field extraction — whole-day
    * CDateTime values leave every sub-day field trivially zero. Minute
    * (not second) granularity keeps the VALUES rendering exact
    * (LocalTime.toString emits HH:mm, the renderer appends ":00").
    */
  case object CTs extends ColType

  /** extension beyond the reference's domains: numeric-shaped strings
    * for fuzzing the cast matrix (int text, one-decimal float text,
    * scientific notation, 'naN', garbage, empty)
    */
  case object CNumStr extends ColType

  /** one column: name, type, exact NULL count */
  final case class ColSpec(name: String, tpe: ColType, nulls: Int = 0)

  private val epoch = LocalDateTime.of(2020, 1, 1, 0, 0, 0)

  /** column-major generation; one PRNG for the whole frame, columns in
    * declared order — value stream first, then the null mask, matching
    * the reference's per-column (values, null positions) sequencing
    */
  private def cells(size: Int, seed: Long, cols: Seq[ColSpec]): Seq[Array[Any]] =
    cols.map { c =>
      val rnd = new java.util.Random(seed ^ c.name.hashCode.toLong << 17 ^
        (c.tpe.toString.hashCode & 0xffffL))
      val vals: Array[Any] = c.tpe match {
        case CInt      => Array.fill[Any](size)(rnd.nextInt(10).toLong)
        case CBool     => Array.fill[Any](size)(rnd.nextBoolean())
        case CFloat    => Array.fill[Any](size)(rnd.nextInt(1000000) / 1000000.0)
        case CStr      => Array.fill[Any](size)(s"ssssss${rnd.nextInt(10)}")
        case CDateTime => Array.fill[Any](size)(epoch.plusDays(rnd.nextInt(10)))
        case CTs       => Array.fill[Any](size)(epoch.plusMinutes(rnd.nextInt(14400)))
        case CNumStr => Array.fill[Any](size)(rnd.nextInt(6) match {
          case 0 => (rnd.nextInt(201) - 100).toString            // "37", "-99"
          case 1 => // one-decimal float text, e.g. "-2.7"
            val d = rnd.nextInt(1001) - 500
            s"${d / 10}.${math.abs(d % 10)}"
          case 2 => "naN"
          case 3 => "x" + rnd.nextInt(10)                        // garbage
          case 4 => s"${rnd.nextInt(9) + 1}e${rnd.nextInt(3)}"   // "2e2"
          case _ => ""
        })
      }
      require(c.nulls <= size, s"${c.name}: nulls > size")
      // Fisher-Yates prefix = sample without replacement
      val idx = Array.range(0, size)
      var i = 0
      while (i < c.nulls) {
        val j = i + rnd.nextInt(size - i)
        val t = idx(i); idx(i) = idx(j); idx(j) = t
        vals(idx(i)) = null
        i += 1
      }
      vals
    }

  private def sparkType(t: ColType): DataType = t match {
    case CInt      => LongType
    case CBool     => BooleanType
    case CFloat    => DoubleType
    case CStr      => StringType
    case CDateTime => TimestampNTZType
    case CTs       => TimestampNTZType
    case CNumStr   => StringType
  }

  private def duckType(t: ColType): String = t match {
    case CInt      => "BIGINT"
    case CBool     => "BOOLEAN"
    case CFloat    => "DOUBLE"
    case CStr      => "VARCHAR"
    case CDateTime => "TIMESTAMP"
    case CTs       => "TIMESTAMP"
    case CNumStr   => "VARCHAR"
  }

  def df(spark: SparkSession, size: Int, seed: Long, cols: ColSpec*): DataFrame = {
    val data = cells(size, seed, cols)
    val rows = (0 until size).map(r => Row.fromSeq(cols.indices.map(c => data(c)(r))))
    val schema = StructType(cols.map(c => StructField(c.name, sparkType(c.tpe))))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  /** the identical rows as a parenthesized DuckDB subquery:
    * `(SELECT CAST(...) AS name, ... FROM (VALUES ...) _v(...))`
    */
  def valuesSql(size: Int, seed: Long, cols: ColSpec*): String = {
    val data = cells(size, seed, cols)
    def cell(c: Int, r: Int): String = data(c)(r) match {
      case null => "NULL"
      case v: Long => v.toString
      case v: Boolean => if (v) "TRUE" else "FALSE"
      // exact: values sit on the 10^-6 grid, text below is the exact
      // decimal both engines parse to the same double
      case v: Double => BigDecimal(math.rint(v * 1000000).toLong, 6).bigDecimal.toPlainString
      case v: String => "'" + v.replace("'", "''") + "'"
      case v: LocalDateTime =>
        "TIMESTAMP '" + v.toLocalDate + " " + v.toLocalTime + ":00'"
    }
    val rows = (0 until size)
      .map(r => cols.indices.map(c => cell(c, r)).mkString("(", ", ", ")"))
      .mkString(", ")
    val casts = cols.zipWithIndex
      .map { case (c, i) => s"CAST(_c$i AS ${duckType(c.tpe)}) AS ${c.name}" }
      .mkString(", ")
    val names = cols.indices.map(i => s"_c$i").mkString(", ")
    s"(SELECT $casts FROM (VALUES $rows) AS _v($names))"
  }
}
