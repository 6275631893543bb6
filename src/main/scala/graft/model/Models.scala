package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** dbt-style model registry: materializes the reference's model DAG as
  * SQL temp views so a SQL user can query the same surface the
  * reference's dbt project exposes (`dbt_files/models/core/`,
  * `models/analytics/`) — `SELECT * FROM yearly_stats` etc.
  *
  * Materialization tiers map per SURVEY.md §4: dbt `view` → lazy temp
  * view (Catalyst inlines it per query), dbt `table` → optional eager
  * cache, dbt `incremental` → the Staging.stgIncremental path.
  */
object Models {

  /** Register the base tables + derived models for `sfDir` and return
    * the model names. */
  def registerViews(s: SparkSession, d: String): Seq[String] = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables.t(s, d, t).createOrReplaceTempView(t))
    // events normalized (ns→µs handled in Tables.events)
    Tables.events(s, d).createOrReplaceTempView("events_norm")

    val models: Seq[(String, DataFrame)] = Seq(
      "fact_orders" -> Fact.factDerive(s, d),
      "stats_by_nation_region_decade" -> Analytics.statsByNationRegionDecade(s, d),
      "yearly_stats" -> Analytics.yearlyStats(s, d),
      "decade_stats" -> Analytics.decadeStats(s, d),
      "max_by_nation" -> Analytics.maxByNation(s, d),
      "severity_by_nation" -> Analytics.severityByNation(s, d),
      "type_stats" -> Analytics.typeStats(s, d),
      "conditional_ratio" -> Analytics.conditionalRatio(s, d),
      "pricing_summary" -> Pricing.pricingSummary(s, d))
    models.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    models.map(_._1)
  }
}
