package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

/** BigQuery-dialect function names missing from Spark SQL, registered as
  * FunctionRegistry aliases that expand to native Catalyst expressions —
  * zero runtime cost, fully inside whole-stage codegen (never UDFs).
  *
  * Covers the BigQuery functions exercised by the reference's tests
  * (reference: adaptors/clojure/test/bq_runner/olap_test.clj:
  * REGEXP_CONTAINS; plus SAFE_DIVIDE / FORMAT_DATE / PARSE_DATE from the
  * BigQuery surface the YachtSQL engine emulates). Spark already ships
  * DATE_FROM_UNIX_DATE, TIMESTAMP_MICROS, DATE_ADD, EXTRACT, and
  * PERCENTILE_CONT ... WITHIN GROUP natively.
  */
object BQCompat {

  /** BigQuery strftime-style pattern → java.time pattern. */
  def formatPattern(bq: String): String = {
    val map = Seq(
      "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
      "%H" -> "HH", "%M" -> "mm", "%S" -> "ss", "%%" -> "%")
    map.foldLeft(bq) { case (s, (k, v)) => s.replace(k, v) }
  }

  private def lit(s: String): Expression = Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s), org.apache.spark.sql.types.StringType)

  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry

    def register(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "internal")

    register("regexp_contains", { case Seq(s, r) => RLike(s, r) })

    register("safe_divide", { case Seq(a, b) =>
      val div = Divide(Cast(a, org.apache.spark.sql.types.DoubleType), Cast(b, org.apache.spark.sql.types.DoubleType))
      If(EqualTo(Cast(b, org.apache.spark.sql.types.DoubleType), Literal(0.0)), Literal.create(null, org.apache.spark.sql.types.DoubleType), div)
    })

    // FORMAT_DATE('%Y-%m-%d', d) — pattern must be a literal.
    register("format_date", {
      case Seq(Literal(fmt, _), d) =>
        DateFormatClass(Cast(d, org.apache.spark.sql.types.TimestampType), lit(formatPattern(fmt.toString)))
    })

    // PARSE_DATE('%Y-%m-%d', s)
    register("parse_date", {
      case Seq(Literal(fmt, _), s) =>
        new ParseToDate(s, lit(formatPattern(fmt.toString)))
    })

    // BigQuery signature DATE_ADD(date, INTERVAL n unit) — Spark's builtin
    // only takes integer days. Rewrite the interval form to binary
    // arithmetic and let the analyzer's date/interval coercion resolve it;
    // plain integer second arguments keep the builtin behavior.
    def isInterval(e: Expression): Boolean = e match {
      case Literal(_, t) => t.isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType] ||
        t.isInstanceOf[org.apache.spark.sql.types.YearMonthIntervalType] ||
        t == org.apache.spark.sql.types.CalendarIntervalType
      case _ => false
    }
    register("date_add", {
      case Seq(d, i) if isInterval(i) => Add(d, i)
      case Seq(d, n) => DateAdd(d, n)
    })
    register("date_sub", {
      case Seq(d, i) if isInterval(i) => Subtract(d, i)
      case Seq(d, n) => DateSub(d, n)
    })

    // FARM_FINGERPRINT stand-in: deterministic 64-bit hash. NOT the same
    // hash family as BigQuery's farmhash — same contract (stable Long).
    register("farm_fingerprint", { case Seq(s) => new XxHash64(Seq(s)) })
  }
}
