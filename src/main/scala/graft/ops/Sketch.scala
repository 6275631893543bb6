package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Functions.md5Hash60
import graft.ops.TextStats.shingles

/** Deterministic HyperLogLog distinct-count sketch — the mergeable
  * approx-distinct primitive a 100-TB pipeline uses where exact
  * count-distinct would shuffle the full value set (distinct URLs,
  * shingles, n-grams per slice). Register state is m = 2^p integers
  * per group: constant, mergeable by register-wise max across
  * partitions, days, or corpora — the property OpsSpec pins.
  *
  * Everything is engineered for cross-engine determinism (the same
  * rules as the rest of the repo — see Functions scaladoc):
  *
  *   - the hashed value is the shared 60-bit md5 primitive, so DuckDB
  *     replays register and rho assignment bit-for-bit;
  *   - rho (leading-zero rank) is derived from `length(bin(x))` — an
  *     integer path in both engines, no log2 anywhere;
  *   - the harmonic sum is kept as an EXACT scaled integer:
  *     Σ 2^(W+1-rho_j) over all m registers (empty register → 2^(W+1))
  *     fits a long at m·2^52 ≤ 2^61, so summation order cannot change
  *     it — the one double division (alpha·m²·2^(W+1) / S) happens at
  *     the very end over identical operands.
  *
  * The raw estimator is emitted without the small-range linear-counting
  * correction (that branch needs ln(), whose last-ulp behavior differs
  * by libm); `v_empty` rides along so a caller — or the spec — can
  * apply any correction policy downstream. Cites the estimator of
  * Flajolet et al. (HyperLogLog, AofA 2007) as popularized in public
  * warehouse engines.
  */
object Sketch {

  /** 2^9 = 512 registers: ±~4.6% standard error — sketch state is half
    * a KB per group regardless of cardinality. */
  val HllP = 9
  val HllM: Int = 1 << HllP
  val HllHashBits = 60
  /** Value-part width W: hash bits left after the register index. */
  val HllValueBits: Int = HllHashBits - HllP // 51
  val HllSeed = 21
  /** Bias correction for m ≥ 128 (the standard constant). */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)
  /** The whole numerator alpha·m²·2^(W+1) folded into ONE double
    * literal, embedded in both engines via round-tripping toString —
    * the final estimate is a single division by the exact integer S. */
  val HllNumerator: Double = HllAlpha * HllM * HllM * math.pow(2, HllValueBits + 1)

  /** Per-(group, register) max-rho state over exploded shingles — THE
    * sketch: constant-size per group, mergeable across any partition of
    * the input by register-wise max (spec-pinned). */
  def shingleRegisters(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), explode(shingles(col("text"), 3)).as("sh"))
      .withColumn("h", md5Hash60(col("sh"), HllSeed))
      .withColumn("reg", col("h").bitwiseAND(lit((HllM - 1).toLong)))
      .withColumn("rem", shiftright(col("h"), HllP))
      // rho = W + 1 - bitlen(rem); bitlen via bin() string length with
      // the zero case pinned explicitly (bin(0) = "0" has length 1)
      .withColumn("rho",
        when(col("rem") === 0, lit(HllValueBits + 1))
          .otherwise(lit(HllValueBits + 1) - length(bin(col("rem")))))
      .groupBy("lang", "reg").agg(max(col("rho")).as("mx"))

  /** Estimate from register state: exact scaled harmonic sum, one final
    * division (see class doc). */
  def estimateFromRegisters(regs: DataFrame): DataFrame =
    regs.groupBy("lang").agg(
      count(lit(1)).as("n_regs"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HllValueBits + 1} - mx)"))
        .as("s_present"))
      .withColumn("v_empty", lit(HllM.toLong) - col("n_regs"))
      .withColumn("s_scaled",
        col("s_present") +
          col("v_empty") * lit(1L << (HllValueBits + 1)))
      .withColumn("est_raw", lit(HllNumerator) / col("s_scaled"))
      .select("lang", "v_empty", "s_scaled", "est_raw")

  /** hll1 — per-language distinct 3-gram shingle estimate beside the
    * exact count (the validation pairing; production keeps only the
    * sketch side). Register aggregation is one narrow shuffle of at
    * most m rows per group after map-side partial max. */
  def hllLangDistinct(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val sketch = estimateFromRegisters(shingleRegisters(docs))
    val exact = docs
      .select(col("lang"), explode(shingles(col("text"), 3)).as("sh"))
      .groupBy("lang")
      .agg(countDistinct(col("sh")).as("n_exact"))
    exact.join(sketch, "lang")
      .select("lang", "n_exact", "v_empty", "s_scaled", "est_raw")
      .orderBy("lang")
  }

  /** DuckDB replay: same shingles, same md5-60 hash, same register/rho
    * integer path, same exact scaled harmonic sum, same single final
    * division. */
  val hllLangDistinctOracle: String = {
    val w = HllValueBits + 1
    s"""WITH w AS (
       |  SELECT lang, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
       |sh AS (
       |  SELECT lang, unnest(CASE WHEN len(ws) >= 3 THEN list_transform(
       |      generate_series(1, len(ws) - 2),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
       |    ELSE [] END) AS sh
       |  FROM w),
       |h AS (
       |  SELECT lang, sh,
       |    ('0x' || substr(md5('$HllSeed' || ':' || sh), 1, 15))::BIGINT AS h
       |  FROM sh),
       |r AS (
       |  SELECT lang, h & ${HllM - 1} AS reg, h >> $HllP AS rem FROM h),
       |rho AS (
       |  SELECT lang, reg,
       |    CASE WHEN rem = 0 THEN $w ELSE $w - length(bin(rem)) END AS rho
       |  FROM r),
       |regs AS (
       |  SELECT lang, reg, max(rho) AS mx FROM rho GROUP BY lang, reg),
       |sk AS (
       |  SELECT lang, count(*) AS n_regs,
       |    CAST(sum(CAST(1 AS BIGINT) << ($w - mx)) AS BIGINT) AS s_present
       |  FROM regs GROUP BY lang),
       |ex AS (
       |  SELECT lang, count(DISTINCT sh) AS n_exact FROM sh GROUP BY lang)
       |SELECT ex.lang, ex.n_exact,
       |  $HllM - sk.n_regs AS v_empty,
       |  sk.s_present + ($HllM - sk.n_regs) * (CAST(1 AS BIGINT) << $w)
       |    AS s_scaled,
       |  $HllNumerator / (sk.s_present +
       |    ($HllM - sk.n_regs) * (CAST(1 AS BIGINT) << $w)) AS est_raw
       |FROM ex JOIN sk USING (lang)
       |ORDER BY ex.lang""".stripMargin
  }
}
