package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native dBASE (.dbf) attribute-table reader — the attribute half of
  * the ESRI shapefile the reference loads with geopandas
  * (reference pipeline/add_region.py:23 reads
  * ne_10m_admin_0_countries; geometry lives in the absent .shp, the
  * 168 per-country attribute columns live HERE). Format per the public
  * dBASE III/IV spec: 32-byte header (LE record count / header size /
  * record size), 32-byte field descriptors to the 0x0D terminator,
  * then fixed-width records with a 1-byte deletion flag.
  *
  * Scale posture: a .dbf is a DIMENSION file by construction (the fact
  * side of a spatial pipeline is never shipped as dBASE), so it parses
  * on the driver — exactly where a broadcast dim originates — and
  * becomes an ordinary DataFrame; at warehouse scale the one-time
  * conversion lands in parquet (S8) and every downstream read is
  * columnar. Type map: C → string (trimmed, charset from the sidecar
  * .cpg when present, Latin-1 default per spec), N/F with decimals=0 →
  * long, else double, L → boolean, D → yyyy-MM-dd string; blanks →
  * null; deleted records (flag 0x2A) skipped.
  */
object Dbf {

  case class Field(name: String, typ: Char, len: Int, dec: Int)

  /** Parse the .dbf at `path` into a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val charset = sidecarCharset(path)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xFFFF
    val recordSize = bb.getShort(10) & 0xFFFF

    val fields = Iterator.from(0)
      .map(i => 32 + i * 32)
      .takeWhile(off => off < headerSize && bytes(off) != 0x0D)
      .map { off =>
        val nameEnd = (off until off + 11).find(bytes(_) == 0).getOrElse(off + 11)
        Field(new String(bytes, off, nameEnd - off, StandardCharsets.US_ASCII),
          bytes(off + 11).toChar, bytes(off + 16) & 0xFF, bytes(off + 17) & 0xFF)
      }.toVector

    val schema = StructType(fields.map { f =>
      val dt = f.typ match {
        case 'N' | 'F' => if (f.dec == 0) LongType else DoubleType
        case 'L' => BooleanType
        case _ => StringType // C, D, M and anything exotic stay text
      }
      StructField(f.name, dt, nullable = true)
    })

    val rows = (0 until nRec).iterator.flatMap { r =>
      val base = headerSize + r.toLong * recordSize
      if (base + recordSize > bytes.length || bytes(base.toInt) == '*') None
      else {
        var off = base.toInt + 1 // skip deletion flag
        val vals = fields.map { f =>
          val raw = new String(bytes, off, f.len, charset).trim
          off += f.len
          f.typ match {
            case 'N' | 'F' =>
              if (raw.isEmpty || raw == "*") null
              else if (f.dec == 0) java.lang.Long.valueOf(raw)
              else java.lang.Double.valueOf(raw)
            case 'L' => raw.toUpperCase match {
              case "T" | "Y" => java.lang.Boolean.TRUE
              case "F" | "N" => java.lang.Boolean.FALSE
              case _ => null
            }
            case 'D' =>
              if (raw.length == 8)
                s"${raw.substring(0, 4)}-${raw.substring(4, 6)}-${raw.substring(6, 8)}"
              else if (raw.isEmpty) null else raw
            case _ => if (raw.isEmpty) null else raw
          }
        }
        Some(Row.fromSeq(vals))
      }
    }.toSeq

    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Charset from the shapefile's .cpg sidecar (NE ships "UTF-8");
    * dBASE's own default is Latin-1. */
  private def sidecarCharset(dbfPath: String): java.nio.charset.Charset = {
    val cpg = Paths.get(dbfPath.replaceAll("\\.dbf$", ".cpg"))
    if (Files.exists(cpg)) {
      val name = new String(Files.readAllBytes(cpg),
        StandardCharsets.US_ASCII).trim
      try java.nio.charset.Charset.forName(name)
      catch { case _: Exception => StandardCharsets.ISO_8859_1 }
    } else StandardCharsets.ISO_8859_1
  }

  /** The reference's projection of the world dim
    * (add_region.py:26 keeps NAME, REGION_UN + geometry): country name
    * and UN region from the attribute table. */
  def worldAttributes(spark: SparkSession, path: String): DataFrame = {
    val df = read(spark, path)
    df.select(df("NAME").as("country"), df("REGION_UN").as("region"))
  }
}
