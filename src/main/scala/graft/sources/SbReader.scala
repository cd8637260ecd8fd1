package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SeaBASS (`.sb`) ingestion — the reference's A1 operator (SURVEY
  * §2-A: UPSTREAM `ocdb/core/seabass/sb_file_reader.py ::
  * SbFileReader`), re-expressed Spark-first.
  *
  * A SeaBASS file is a self-describing measurement file:
  * {{{
  * /begin_header
  * /investigators=Jane_Doe
  * /fields=date,time,lat,lon,depth,chl
  * /units=yyyymmdd,hh:mm:ss,degrees,degrees,m,mg/m^3
  * /delimiter=comma            (comma | space | tab)
  * /missing=-999
  * /north_latitude=41.000[DEG] ... bbox + start/end date headers
  * /end_header
  * 20240101,00:12:30,40.5,-70.2,5,0.42
  * }}}
  *
  * Spark mapping: each file is one row of `wholetext` input; parsing is
  * a per-partition map (embarrassingly parallel over files — at 100 TB
  * this is a directory of millions of `.sb` files and the parse runs
  * where the bytes land, no shuffle). Output is the long/narrow layout
  * from SURVEY §2.2: one row per (file, record_no, field, value) plus a
  * file-level metadata frame, ready to pivot wide or store as Parquet.
  */
object SbReader {

  /** Parsed representation of one `.sb` file. */
  case class SbFile(
    path: String,
    metadata: Map[String, String],
    fields: Seq[String],
    records: Seq[Seq[Option[Double]]],
    rawRecords: Seq[Seq[String]])

  /** Parse one file's text. Header keys are lowercased without the
    * leading slash; `[DEG]`-style unit suffixes are stripped from
    * numeric header values at query time, not here (metadata stays
    * verbatim like the reference's).
    */
  def parseFile(path: String, text: String): SbFile = {
    val lines = text.split("\r?\n").iterator.filter(_.nonEmpty)
    val meta = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var inHeader = false
    var headerDone = false
    val data = scala.collection.mutable.ArrayBuffer.empty[String]
    lines.foreach { line =>
      val l = line.trim
      if (l.equalsIgnoreCase("/begin_header")) inHeader = true
      else if (l.equalsIgnoreCase("/end_header")) { inHeader = false; headerDone = true }
      else if (inHeader && l.startsWith("/")) {
        val eq = l.indexOf('=')
        if (eq > 0) meta += l.substring(1, eq).trim.toLowerCase -> l.substring(eq + 1).trim
      } else if (inHeader && l.startsWith("!")) () // header comments
      else if (headerDone && l.nonEmpty) data += l
    }
    val fields = meta.getOrElse("fields", "").split(",").map(_.trim.toLowerCase).toSeq
    val delim = meta.getOrElse("delimiter", "comma").toLowerCase match {
      case "comma" => ","
      case "tab" => "\t"
      case _ => "\\s+"
    }
    val missing = meta.get("missing")
    val raw = data.map(_.trim.split(delim).map(_.trim).toSeq).toSeq
    val parsed = raw.map(_.map { cell =>
      if (missing.contains(cell)) None
      else try Some(cell.toDouble) catch { case _: NumberFormatException => None }
    })
    SbFile(path, meta.toMap, fields, parsed, raw)
  }

  /** Read a glob of `.sb` files into the long/narrow measurement frame:
    * (file_path, record_no, field, value_str, value_num). Dynamic
    * schema-on-read exactly like the reference: every file may declare
    * different `/fields=`.
    */
  def readLong(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (path, text) =>
        val f = parseFile(path, text)
        f.rawRecords.iterator.zipWithIndex.flatMap { case (rec, recNo) =>
          f.fields.iterator.zip(rec.iterator).zip(f.records(recNo).iterator).map {
            case ((field, rawCell), num) => (path, recNo.toLong, field, rawCell, num)
          }
        }
      })
      .toDF("path", "record_no", "field", "value_str", "value_num")
  }

  /** File-level metadata frame: (path, key, value) — the searchable
    * header surface (investigators, cruise, bbox, dates, ...).
    */
  def readMetadata(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (path, text) =>
        parseFile(path, text).metadata.iterator.map { case (k, v) => (path, k, v) }
      })
      .toDF("path", "key", "value")
  }

  /** Wide per-file records frame for one field list: records of files
    * declaring exactly these fields, one column per field (double,
    * missing → null). The reference returns this shape per dataset;
    * here it is one DataFrame per homogeneous field-list group.
    */
  def readWide(spark: SparkSession, pathGlob: String, fields: Seq[String]): DataFrame = {
    val sch = StructType(
      StructField("path", StringType) +: StructField("record_no", LongType) +:
        fields.map(f => StructField(f, DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(sch)
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (path, text) =>
          val f = parseFile(path, text)
          if (f.fields == fields)
            f.records.iterator.zipWithIndex.map { case (rec, i) =>
              Row.fromSeq(path +: i.toLong +: rec.map(_.map(Double.box).orNull))
            }
          else Iterator.empty
        }
      }(enc)
  }
}
