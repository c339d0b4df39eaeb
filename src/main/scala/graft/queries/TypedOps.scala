package graft.queries

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed Dataset API over the same tables: case-class rows, compile-time
  * checked transformations, and a typed `Aggregator` — the API tier a
  * library consumer uses when schema errors should be compile errors.
  * Encoders keep rows in Tungsten binary form (no Kryo/Java
  * serialization), and Catalyst still optimizes the typed plan (typed
  * filters become deserialize-once predicates; the Aggregator becomes an
  * ObjectHashAggregate with partial aggregation).
  */
object TypedOps {

  final case class LineItem(
      l_orderkey: Long, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_returnflag: String)

  final case class FlagRevenue(l_returnflag: String, revenue: Double, n: Long)

  /** Typed projection of the lineitem table. */
  def lineitems(s: SparkSession, dir: String): Dataset[LineItem] = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag")
      .as[LineItem]
  }

  /** Typed discounted-revenue aggregator (mergeable: partial aggregation
    * runs map-side exactly like a SQL SUM).
    */
  val revenueAgg: Aggregator[LineItem, (Double, Long), (Double, Long)] =
    new Aggregator[LineItem, (Double, Long), (Double, Long)] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: LineItem): (Double, Long) =
        (b._1 + a.l_extendedprice * (1.0 - a.l_discount), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)): (Double, Long) = r
      def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong)
      def outputEncoder = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong)
    }

  /** Discounted revenue + row count per return flag, fully typed. */
  def revenueByFlag(s: SparkSession, dir: String): Dataset[FlagRevenue] = {
    import s.implicits._
    lineitems(s, dir)
      .filter(li => li.l_quantity > 0)
      .groupByKey(_.l_returnflag)
      .agg(revenueAgg.toColumn)
      .map { case (flag, (rev, n)) =>
        // HALF_UP to match SQL ROUND semantics exactly (rint is half-even).
        FlagRevenue(flag,
          BigDecimal(rev).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, n)
      }
  }
}
