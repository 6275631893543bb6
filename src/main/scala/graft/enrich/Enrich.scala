package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geo.Geo

/** The reference's enrichment stage (pipeline/add_region.py:18-63,
  * add_region_chunks.py) as one composed transform:
  *   J1 spatial join → P10 null-subset → J2 regex fallback →
  *   J3 region lookup → P11 coalesce-fill → P12 drop helpers.
  *
  * The reference runs this in 100k-row pandas chunks purely because it is
  * single-node (SURVEY.md §2.1 S6); here the same logic is one
  * shuffle-free pass over arbitrarily many partitions — the chunking
  * disappears by construction.
  */
object Enrich {

  /** Attach (country, region): polygon containment first, whole-word
    * place-name match as fallback for points no polygon claims —
    * exactly the reference's fill-rate-raising fallback
    * (add_region.py:50-61). `countryList` preserves lookup order
    * (shapefile order + the appended Alaska special case). */
  def addCountryRegion(
      events: DataFrame,
      world: DataFrame,
      countryList: Seq[(String, String)],
      lonCol: String, latCol: String, placeCol: String): DataFrame = {
    val spatial = Geo.spatialJoin(events, world, lonCol, latCol)
    val (inferredCountry, inferredRegion) =
      Geo.firstMatchLookup(col(placeCol), countryList)
    spatial
      .withColumn("country",
        coalesce(col("country"), inferredCountry))
      .withColumn("region",
        coalesce(col("region"), inferredRegion))
  }
}
