package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSource V2 connector — the library's "write your
  * own source" exhibit (SURVEY §2 sources tier). Generates the
  * deterministic sequence table
  *
  *   id   : 0 until `rows`         (option, default 1000)
  *   val1 : (id * 7) % 100
  *   tag  : chr('a' + id % 3)
  *
  * split into `parts` (option, default 4) contiguous id-range input
  * partitions — the connector contract a real external system (a REST
  * cursor API, a keyed store, a tiled raster) would implement the same
  * way. Implements BOTH pushdown mixins:
  *
  *  - SupportsPushDownRequiredColumns — the reader materializes ONLY
  *    the pruned schema (a projection pushed into generation, exactly
  *    like a columnar store reading fewer pages);
  *  - SupportsPushDownFilters — id-range predicates (>, >=, <, <=, =)
  *    NARROW each partition's generation range, so a filtered scan
  *    generates |match| rows, not |table| rows. Non-id filters are
  *    returned as residuals for Spark to evaluate (never silently
  *    claimed); pushed id-range filters need no residual re-check
  *    because range narrowing is exact.
  *
  * Used via `spark.read.format(classOf[GraftSeqProvider].getName)` —
  * plain class-name lookup, no service registry needed.
  */
class GraftSeqProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSeqProvider.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSeqTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("parts", "4").toInt)
}

object GraftSeqProvider {
  val fullSchema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("val1", LongType, nullable = false)
    .add("tag", StringType, nullable = false)
}

private class GraftSeqTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = GraftSeqProvider.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSeqScanBuilder(rows, parts)
}

private class GraftSeqScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = GraftSeqProvider.fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    handled.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = handled
    residual // range narrowing is exact: nothing pushed needs re-evaluation
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftSeqScan(lo, math.max(lo, hi), parts, required)
}

private class GraftSeqScan(lo: Long, hi: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSeqScan[lo=$lo, hi=$hi, cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, parts)
    val span = math.max(0L, hi - lo)
    (0 until n).map { i =>
      val a = lo + span * i / n
      val b = lo + span * (i + 1) / n
      GraftSeqRange(a, b, required.fieldNames)
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val r = p.asInstanceOf[GraftSeqRange]
        new PartitionReader[InternalRow] {
          private var cur = r.lo - 1
          override def next(): Boolean = { cur += 1; cur < r.hi }
          override def get(): InternalRow = {
            val vals: Array[Any] = r.cols.map {
              case "id" => cur
              case "val1" => (cur * 7) % 100
              case "tag" => UTF8String.fromString(('a' + (cur % 3).toInt).toChar.toString)
            }
            new GenericInternalRow(vals)
          }
          override def close(): Unit = ()
        }
      }
    }
}

private case class GraftSeqRange(lo: Long, hi: Long, cols: Array[String])
  extends InputPartition
