package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Functions._

/** The reference's dbt staging + fact models over earthquake-shaped
  * frames (dbt_files/models/core/stg_earthquake.sql,
  * fact_earthquake_data.sql): U1 union of historical ∪ monthly, W1
  * dedup-by-rank on (place, event_datetime), P17 type standardization,
  * P18 surrogate key, then the P14-P16 fact derivations.
  */
object Staging {

  /** stg_earthquake (full-refresh path): union, keyed dedup, casts,
    * surrogate key (stg_earthquake.sql:19-44). */
  def stgEarthquake(historical: DataFrame, monthly: DataFrame): DataFrame = {
    val unioned = historical.unionByName(monthly)
    val w = Window.partitionBy("place", "event_datetime")
      .orderBy("event_datetime") // reference tiebreak: arbitrary survivor
    unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .select(
        surrogateKey(col("place"), col("event_datetime")).as("event_id"),
        col("place"),
        col("event_datetime").cast("timestamp").as("event_datetime"),
        col("magnitude").cast("double").as("magnitude"),
        col("latitude").cast("double").as("latitude"),
        col("longitude").cast("double").as("longitude"),
        col("depth").cast("double").as("depth"),
        col("country"), col("region"), col("alert"),
        col("tsunami"), col("type"))
  }

  /** stg incremental path (T2): only rows above the target's
    * high-watermark (stg_earthquake.sql:9-16); late data silently
    * dropped — the full-refresh union path catches it instead. */
  def stgIncremental(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val wm = existing.agg(max(col("event_datetime")).as("wm"))
    // null watermark = empty target: everything is new (a bare `> wm`
    // comparison would be null for every row and silently drop the
    // whole first load)
    incoming.join(broadcast(wm),
        col("wm").isNull || col("event_datetime") > col("wm"), "inner")
      .drop("wm")
  }

  /** fact_earthquake_data (fact_earthquake_data.sql:7-22): severity CASE,
    * year, decade on top of staging. */
  def factEarthquake(stg: DataFrame): DataFrame =
    stg
      .withColumn("severity", severity(col("magnitude")))
      .withColumn("event_year", year(col("event_datetime")))
      .withColumn("event_decade", getDecade(col("event_datetime")))

  /** yearly_earthquake_stats (yearly_earthquake_stats.sql:8-16) on the
    * earthquake fact. */
  def yearlyEarthquakeStats(fact: DataFrame): DataFrame =
    fact
      .filter(col("magnitude") > 3 && col("country").isNotNull)
      .groupBy("event_year")
      .agg(
        count(lit(1)).as("event_frequency"),
        avg(col("magnitude")).as("avg_magnitude"),
        avg(col("depth")).as("avg_depth"))
      .orderBy("event_year")
}
