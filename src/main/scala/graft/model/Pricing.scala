package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Functions._

/** Headline scan+aggregate benchmark query (TPC-H Q1 shape) — the
  * volume-bearing aggregation pattern the engine must sustain at 100 TB:
  * one parquet scan with a pushed timestamp predicate, map-side partial
  * aggregation into 6 groups, no join, one tiny shuffle.
  *
  * Money math is exact: 2-decimal columns are integerized per row
  * ([[graft.functions.Functions.cents]]) and combined in bigint
  * (`disc = P*(100-D)` in e-4 units, `charge = P*(100-D)*(100+T)` in e-6
  * units), so results are bit-identical across partitionings and engines.
  */
object Pricing {
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-06-01 00:00:00")))
      .withColumn("p", cents(col("l_extendedprice")))
      .withColumn("dd", cents(col("l_discount")))
      .withColumn("t", cents(col("l_tax")))
      .withColumn("q", cents(col("l_quantity")))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("q")).as("sum_qty_cents"),
        sum(col("p")).as("sum_base_cents"),
        sum(col("p") * (lit(100) - col("dd"))).as("sum_disc_e4"),
        sum(col("p") * (lit(100) - col("dd")) * (lit(100) + col("t")))
          .as("sum_charge_e6"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty_cents") / col("count_order") / 100.0)
      .withColumn("avg_price", col("sum_base_cents") / col("count_order") / 100.0)
      .orderBy("l_returnflag", "l_linestatus")
  }
}
