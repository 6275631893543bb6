package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** S17 — the reference's success/error log sink: each extraction
  * window / region chunk appends a progress or error line to a text
  * log (`pipeline/extract_historical.py:30-40,79-80,115-116`,
  * `pipeline/add_region_chunks.py:87-88`).
  *
  * Spark-native analogue: an [[Observation]]-instrumented write.
  * Row/value metrics are accumulated ON THE EXECUTORS during the write
  * action itself — at 100 TB a count-then-write would read the input
  * twice — and the driver appends ONE JSON line per completed action
  * (the reference's `open(file, 'a')` semantics). Errors append a
  * line too, then propagate: logging must never swallow a failure.
  */
object LogSink {

  private def append(logPath: String, line: String): Unit =
    Files.write(Paths.get(logPath),
      (line + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  private def esc(s: String): String =
    graft.functions.Functions.jsonEscape(s)

  /** Structured event line (tag/status/detail) to the same append-only
    * sink [[writeWithLog]] uses — for ingest-side tolerated-row events
    * that must survive a cluster run (a stderr println does not: it
    * scrolls past in a driver log nobody tails, and vanishes entirely
    * on an executor). */
  def event(logPath: String, tag: String, status: String,
      detail: String): Unit =
    append(logPath, s"""{"tag":"${esc(tag)}","status":"${esc(status)}",""" +
      s""""detail":"${esc(detail)}"}""")

  /** Parquet write with a per-action metrics log line. Returns the
    * observed row count. */
  def writeWithLog(df: DataFrame, tag: String, outPath: String,
      logPath: String): Long = {
    val obs = Observation()
    try {
      df.observe(obs, count(lit(1)).as("rows"))
        .write.mode("overwrite").parquet(outPath)
      val rows = obs.get("rows").asInstanceOf[Long]
      append(logPath,
        s"""{"tag":"${esc(tag)}","status":"ok","rows":$rows,"out":"${esc(outPath)}"}""")
      rows
    } catch {
      case e: Throwable =>
        // the log append can itself fail (directory gone, disk full) —
        // it must never mask the original write failure
        try append(logPath,
          s"""{"tag":"${esc(tag)}","status":"error","error":"${esc(
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")}"}""")
        catch { case logErr: Throwable => e.addSuppressed(logErr) }
        throw e
    }
  }
}
