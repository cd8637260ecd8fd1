package graft

import org.apache.spark.sql.functions._

/** Wave-27 properties the DuckDB oracle can't express. */
class Extras127Spec extends SparkSpec {

  test("store_branch_diff: diff buckets partition both branch heads") {
    val r = queries.Extras127.storeBranchDiff(spark, sf).head()
    val (nDev, nExp) = (r.getLong(0), r.getLong(1))
    val (onlyDev, onlyExp, changed, same) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(onlyExp == 0L)
    assert(nDev == onlyDev + changed + same)
    assert(nExp == onlyExp + changed + same)
    assert(changed > 0, "the bumped-price keys must register as changed")
  }

  test("scan_parquet_decimal_logical: the staged file really carries DECIMAL(14,2)") {
    val df = queries.Extras127.scanParquetDecimalLogical(spark, sf)
    assert(df.columns.contains("sum_exact"))
    // exactness: the string sum re-parses to the exact decimal of the source
    val got = df.collect().map(r => r.getString(2)).toSeq
    got.foreach(sm => assert(BigDecimal(sm).scale == 2, s"scale lost in $sm"))
  }

  test("graph_attribute_assortativity: r in [-1, 1] and near 0 for nation-blind edges") {
    val r = queries.Extras127.graphAttributeAssortativity(spark, sf).head()
    assert(r.getLong(0) > 1)
    assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    // suppliers are assigned to nations independent of co-purchase, so
    // mixing should be close to random
    assert(math.abs(r.getDouble(2)) < 0.2, s"unexpectedly assortative: ${r.getDouble(2)}")
  }

  test("time_fiscal_calendar_rollup: fiscal mapping correct, item mass conserved") {
    val rows = queries.Extras127.timeFiscalCalendarRollup(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 4)
    }
    // spot-check the mapping rule: July belongs to Q1 of the NEXT fiscal year
    val julyCheck = Tables.lineitem(spark, sf)
      .select(year(col("l_shipdate")).as("y"), month(col("l_shipdate")).as("m"))
      .filter(col("m") === 7).head()
    val fyOfJuly = julyCheck.getInt(0) + 1
    assert(rows.exists(r => r.getLong(0) == fyOfJuly && r.getLong(1) == 1L))
  }
}
