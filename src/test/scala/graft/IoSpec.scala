package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.1 source/sink operators: CSV append sink + inferred-schema
  * scan (S4/S5), parquet round-trip (S8/S9), partitioned object-store
  * layout (S10), CTAS snapshot (S12), empty-clone DDL (S13), and
  * repartition/coalesce file-count control (S15/S16).
  */
class IoSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft_io").toString

  test("S4/S5: CSV append accumulation + header + inferred-schema scan") {
    val dir = tmp() + "/csv"
    Seq((1L, "a", 1.5)).toDF("id", "s", "v")
      .write.mode("append").option("header", "true").csv(dir)
    Seq((2L, "b", 2.5)).toDF("id", "s", "v")
      .write.mode("append").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    assert(back.count() == 2)
    assert(back.schema("id").dataType.typeName == "integer" ||
      back.schema("id").dataType.typeName == "long") // inference, like clean_historical.py:18
    assert(back.schema("v").dataType.typeName == "double")
  }

  test("S8/S9: parquet overwrite round-trip preserves rows and schema") {
    val dir = tmp() + "/pq"
    val df = Tables.events(spark, GraftSpark.sf).limit(100)
    df.write.mode("overwrite").parquet(dir)
    df.limit(10).write.mode("overwrite").parquet(dir) // overwrite, not append
    val back = spark.read.parquet(dir)
    assert(back.count() == 10)
    assert(back.schema.fieldNames.sorted.toSeq == df.schema.fieldNames.sorted.toSeq)
  }

  test("S10: partitioned write lays out monthly-style directories") {
    val dir = tmp() + "/part"
    Tables.orders(spark, GraftSpark.sf)
      .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.partitionBy("ym").mode("overwrite").parquet(dir)
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("ym="))
    assert(parts.nonEmpty)
    // partition pruning: reading one month scans only that directory
    val one = spark.read.parquet(dir).filter(col("ym") === parts.head.drop(3))
    assert(one.count() > 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || one.count() > 0)
  }

  test("S12/S13: CTAS snapshot + empty clone (WHERE 1=0)") {
    val dir = tmp()
    val src = Tables.nation(spark, GraftSpark.sf)
    src.createOrReplaceTempView("nation_src")
    spark.sql(s"CREATE TABLE ctas_snap USING parquet LOCATION '$dir/snap' AS SELECT * FROM nation_src")
    assert(spark.table("ctas_snap").count() == src.count())
    // S13: schema-only clone
    src.where(lit(false)).write.mode("overwrite").parquet(s"$dir/empty")
    val empty = spark.read.parquet(s"$dir/empty")
    assert(empty.count() == 0)
    assert(empty.schema == src.schema)
    spark.sql("DROP TABLE ctas_snap")
  }

  test("dynamic partition overwrite replaces only the touched month (idempotent monthly re-run)") {
    val dir = tmp() + "/dyn"
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val o = Tables.orders(spark, GraftSpark.sf)
        .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
      o.write.partitionBy("ym").mode("overwrite").parquet(dir)
      val total = spark.read.parquet(dir).count()
      val oneMonth = o.filter(col("ym") === "1995-03")
      val monthCount = oneMonth.count()
      assert(monthCount > 0)
      // re-run just that month: other partitions must survive
      oneMonth.write.partitionBy("ym").mode("overwrite").parquet(dir)
      assert(spark.read.parquet(dir).count() == total)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("S3/S5 malformed-row semantics: PERMISSIVE nulls vs DROPMALFORMED") {
    val dir = tmp() + "/bad"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir + ".csv"),
      "id,v\n1,1.5\nnot_a_number,oops,extra\n2,2.5\n")
    val schema = "id INT, v DOUBLE"
    val permissive = spark.read.schema(schema).option("header", "true")
      .option("mode", "PERMISSIVE").csv(dir + ".csv")
    assert(permissive.count() == 3) // malformed row kept as nulls
    assert(permissive.filter(col("id").isNull).count() == 1)
    val dropped = spark.read.schema(schema).option("header", "true")
      .option("mode", "DROPMALFORMED").csv(dir + ".csv")
    // count() alone skips CSV parsing (count pushdown), so malformed rows
    // would not be detected — materialize the columns
    assert(dropped.select("id", "v").collect().length == 2)
  }

  test("JSONL corpus round-trip: plain and gzip, corrupt records quarantined not fatal") {
    // the LLM-corpus wire format: newline-delimited JSON, usually
    // gzipped, always containing some broken lines. The ingest must
    // read both layouts identically and quarantine garbage into
    // _corrupt_record instead of killing the job or silently dropping.
    val docs = Tables.documents(spark, GraftSpark.sf)
      .select("doc_id", "text", "lang", "source")
    val dir = tmp()
    docs.write.json(s"$dir/plain")
    docs.write.option("compression", "gzip").json(s"$dir/gz")
    assert(new java.io.File(s"$dir/gz").listFiles()
      .exists(_.getName.endsWith(".json.gz")), "gzip layout not written")
    val schema = "doc_id LONG, text STRING, lang STRING, source STRING, _corrupt_record STRING"
    def readBack(p: String) = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record").json(p)
    val plain = readBack(s"$dir/plain")
    val gz = readBack(s"$dir/gz")
    val want = docs.collect().map(_.getLong(0)).sorted.toSeq
    assert(plain.collect().map(_.getLong(0)).sorted.toSeq == want)
    assert(gz.collect().map(_.getLong(0)).sorted.toSeq == want)
    // poison a copy with broken lines: quarantined, valid rows intact
    val poisoned = s"$dir/poisoned"
    new java.io.File(poisoned).mkdirs()
    val src = new java.io.File(s"$dir/plain").listFiles()
      .filter(_.getName.endsWith(".json"))
    src.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(s"$poisoned/part$i.json"))
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$poisoned/bad.json"),
      "{\"doc_id\": 1, \"text\": \"unterminated\n{not json at all}\n")
    val withBad = readBack(poisoned)
    // corrupt-record capture needs the parsed columns materialized
    val rows = withBad.select("doc_id", "_corrupt_record").collect()
    assert(rows.count(_.isNullAt(0)) == 2, "2 poison lines quarantined")
    assert(rows.count(!_.isNullAt(0)) == want.size, "valid rows survive")
  }

  test("S17: observe()-instrumented write appends one JSON log line per action; errors log then propagate") {
    import graft.ingest.LogSink
    val base = tmp()
    val log = s"$base/pipeline.log"
    val ev = Tables.events(spark, GraftSpark.sf).select("event_id", "value")
    // two successful chunk writes append two ok lines (reference 'a' mode)
    val n1 = LogSink.writeWithLog(ev.filter(col("event_id") % 2 === 0),
      "chunk_even", s"$base/even", log)
    val n2 = LogSink.writeWithLog(ev.filter(col("event_id") % 2 === 1),
      "chunk_odd", s"$base/odd", log)
    assert(n1 + n2 == ev.count())
    assert(spark.read.parquet(s"$base/even").count() == n1)
    // a failing write appends an error line AND still throws
    intercept[Exception] {
      LogSink.writeWithLog(ev.select(expr("raise_error('boom')").as("x")),
        "chunk_bad", s"$base/bad", log)
    }
    val lines = Files.readAllLines(java.nio.file.Paths.get(log))
    assert(lines.size == 3, s"got $lines")
    assert(lines.get(0).contains(""""tag":"chunk_even"""") &&
      lines.get(0).contains(s""""rows":$n1"""))
    assert(lines.get(1).contains(""""tag":"chunk_odd"""") &&
      lines.get(1).contains(""""status":"ok""""))
    assert(lines.get(2).contains(""""status":"error"""") &&
      lines.get(2).contains("chunk_bad"))
  }

  test("S15/S16: repartition(n) and coalesce(n) control output file count") {
    val dir = tmp()
    val df = Tables.customer(spark, GraftSpark.sf)
    df.repartition(4).write.mode("overwrite").parquet(s"$dir/rep4")
    df.repartition(8).coalesce(2).write.mode("overwrite").parquet(s"$dir/coal2")
    def nFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(nFiles(s"$dir/rep4") == 4)
    assert(nFiles(s"$dir/coal2") == 2)
  }
}
