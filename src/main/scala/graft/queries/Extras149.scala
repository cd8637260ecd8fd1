package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Wave 49 (C600–C603): on-balance volume, Siegel–Tukey dispersion
  * test, ABC/XYZ inventory classification, Calinski–Harabasz index.
  */
object Extras149 {

  /** C600 win_obv_accumulation — On-Balance Volume over daily bars:
    * close from the struct-max over the deterministic (orderkey,
    * linenumber) order, volume = Σ integer quantity, signed by the
    * close-vs-previous-close direction, OBV = running prefix sum —
    * exact longs end to end. The window runs over the BOUNDED daily
    * frame (calendar cardinality, same class as the candlestick row),
    * never the raw corpus.
    */
  def winObvAccumulation(s: SparkSession, d: String): DataFrame = {
    val bars = lineitem(s, d)
      .select(date_trunc("day", col("l_shipdate")).as("day"),
        col("l_orderkey"), col("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("p"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
      .groupBy("day")
      .agg(max(struct(col("l_orderkey"), col("l_linenumber"), col("p"))).as("lo"),
        sum(col("q")).cast("long").as("vol"))
      .selectExpr("day", "lo.p AS c", "vol")
    val w = Window.orderBy("day")
    val wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    bars
      .withColumn("pc", lag(col("c"), 1).over(w))
      .withColumn("sv", expr(
        """CASE WHEN pc IS NULL THEN 0L
          |     WHEN c > pc THEN vol
          |     WHEN c < pc THEN -vol ELSE 0L END""".stripMargin))
      .withColumn("obv", sum(col("sv")).over(wp))
      .filter(col("pc").isNotNull)
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(expr("CASE WHEN c > pc THEN 1L ELSE 0L END")).cast("long").as("n_up"),
        sum(expr("CASE WHEN c < pc THEN 1L ELSE 0L END")).cast("long").as("n_down"),
        max(col("obv")).cast("long").as("max_obv"),
        min(col("obv")).cast("long").as("min_obv"),
        max(struct(col("day"), col("obv"))).as("last"))
      .selectExpr("n_days", "n_up", "n_down", "max_obv", "min_obv",
        "last.obv AS final_obv")
  }
  val winObvAccumulationSql: String =
    """WITH px AS (
      |  SELECT date_trunc('day', l_shipdate) AS day, l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p,
      |    CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem),
      |bars AS (
      |  SELECT day,
      |    (max(struct_pack(k := l_orderkey, ln := l_linenumber, p := p))).p AS c,
      |    CAST(sum(q) AS BIGINT) AS vol
      |  FROM px GROUP BY day),
      |lagged AS (
      |  SELECT day, c, vol, lag(c, 1) OVER (ORDER BY day) AS pc
      |  FROM bars),
      |sv AS (
      |  SELECT day, c, pc,
      |    CASE WHEN pc IS NULL THEN 0
      |         WHEN c > pc THEN vol
      |         WHEN c < pc THEN -vol ELSE 0 END AS sv
      |  FROM lagged),
      |obv AS (
      |  SELECT day, c, pc,
      |    sum(sv) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS obv
      |  FROM sv)
      |SELECT CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(CASE WHEN c > pc THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
      |  CAST(sum(CASE WHEN c < pc THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
      |  CAST(max(obv) AS BIGINT) AS max_obv,
      |  CAST(min(obv) AS BIGINT) AS min_obv,
      |  CAST((max(struct_pack(d := day, o := obv))).o AS BIGINT) AS final_obv
      |FROM obv WHERE pc IS NOT NULL""".stripMargin

  /** C601 stat_siegel_tukey — the rank-based two-sample DISPERSION
    * test (does 'A' spread wider than 'R'?): positions in the global
    * total order (cents, orderkey, linenumber) come from GlobalRank's
    * two-pass range-partitioned row number — NEVER a single-task
    * window — then Siegel–Tukey's alternating extreme ranks follow in
    * CLOSED FORM from the position alone (low end: 1,4,5,8,9…; high
    * end: 2,3,6,7…; spec replays the definitional construction). With
    * n odd the middle observation is discarded (the textbook rule —
    * the remaining ranks are exactly 1..n−1), and ties take the
    * deterministic total order in both engines in place of mid-ranks.
    * Wilcoxon rank-sum machinery on the ST ranks gives the z.
    */
  def statSiegelTukey(s: SparkSession, d: String): DataFrame = {
    val v = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag").as("g"), col("l_orderkey"), col("l_linenumber"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("c"))
    val ranked = graft.plans.GlobalRank.withGlobalRowNumberAndTotal(
      v, "p", "n",
      Seq(col("c").asc, col("l_orderkey").asc, col("l_linenumber").asc))
    ranked
      .filter(not(col("n") % 2 === 1 && col("p") * 2 === col("n") + 1))
      .withColumn("st", expr(
        """CASE WHEN p * 2 <= n + 1 THEN
          |  CASE WHEN p = 1 THEN 1L WHEN p % 2 = 0 THEN 2 * p ELSE 2 * p - 1 END
          |ELSE
          |  CASE WHEN (n + 1 - p) % 2 = 1 THEN 2 * (n + 1 - p)
          |       ELSE 2 * (n + 1 - p) - 1 END
          |END""".stripMargin))
      .agg(count(lit(1)).cast("long").as("m"),
        sum(expr("CASE WHEN g = 'A' THEN 1L ELSE 0L END")).cast("long").as("n_a"),
        sum(expr("CASE WHEN g = 'A' THEN st ELSE 0L END")).cast("long").as("w_a"))
      .selectExpr("m", "n_a", "w_a",
        """round((CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (m + 1) / 2)
          |  / sqrt(CAST(n_a AS DOUBLE) * (m - n_a) * (m + 1) / 12), 4)
          |  AS z_stat""".stripMargin,
        """abs((CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (m + 1) / 2)
          |  / sqrt(CAST(n_a AS DOUBLE) * (m - n_a) * (m + 1) / 12)) > 1.96
          |  AS reject_equal_spread""".stripMargin)
  }
  val statSiegelTukeySql: String =
    """WITH v AS (
      |  SELECT l_returnflag AS g, l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      |ranked AS (
      |  SELECT g,
      |    row_number() OVER (ORDER BY c, l_orderkey, l_linenumber) AS p,
      |    count(*) OVER () AS n
      |  FROM v),
      |st AS (
      |  SELECT g,
      |    CASE WHEN p * 2 <= n + 1 THEN
      |      CASE WHEN p = 1 THEN 1 WHEN p % 2 = 0 THEN 2 * p ELSE 2 * p - 1 END
      |    ELSE
      |      CASE WHEN (n + 1 - p) % 2 = 1 THEN 2 * (n + 1 - p)
      |           ELSE 2 * (n + 1 - p) - 1 END
      |    END AS st
      |  FROM ranked
      |  WHERE NOT (n % 2 = 1 AND p * 2 = n + 1)),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN g = 'A' THEN st ELSE 0 END) AS BIGINT) AS w_a
      |  FROM st)
      |SELECT m, n_a, w_a,
      |  round((CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (m + 1) / 2)
      |    / sqrt(CAST(n_a AS DOUBLE) * (m - n_a) * (m + 1) / 12), 4) AS z_stat,
      |  abs((CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (m + 1) / 2)
      |    / sqrt(CAST(n_a AS DOUBLE) * (m - n_a) * (m + 1) / 12)) > 1.96
      |    AS reject_equal_spread
      |FROM agg""".stripMargin

  /** C602 analytics_abc_xyz — the inventory-planning classification
    * matrix: ABC from each part's cumulative revenue share in the
    * descending total order (GlobalRank's exclusive prefix sum — the
    * 100 TB-safe form of SUM OVER ORDER BY; A while before<70%, B
    * while <90%, cross-multiplied in exact cents), XYZ from the
    * monthly-demand coefficient of variation (X: CV≤0.5, Y: CV≤1.0,
    * cross-multiplied as 4(nΣq²−S²)≤S² / (nΣq²−S²)≤S² on exact
    * integer quantities over OBSERVED months). One final division per
    * matrix cell for the revenue share.
    */
  def analyticsAbcXyz(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_partkey"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"),
      expr("CAST(l_quantity AS BIGINT)").as("q"),
      date_trunc("month", col("l_shipdate")).as("mon"))
    val rev = li.groupBy("l_partkey").agg(sum(col("cents")).cast("long").as("rc"))
    val ranked = graft.plans.GlobalRank.withExclusivePrefixSum(
      rev, "before", col("rc"), Seq(col("rc").desc, col("l_partkey").asc))
    val tot = rev.agg(sum(col("rc")).cast("long").as("t"))
    val abc = ranked.crossJoin(broadcast(tot))
      .selectExpr("l_partkey", "rc", "t",
        """CASE WHEN before * 10 < t * 7 THEN 'A'
          |     WHEN before * 10 < t * 9 THEN 'B'
          |     ELSE 'C' END AS abc_class""".stripMargin)
    val xyz = li.groupBy("l_partkey", "mon")
      .agg(sum(col("q")).cast("long").as("mq"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).cast("long").as("nm"),
        sum(col("mq")).cast("long").as("sq"),
        sum(expr("mq * mq")).cast("long").as("qq"))
      .selectExpr("l_partkey",
        """CASE WHEN 4 * (nm * qq - sq * sq) <= sq * sq THEN 'X'
          |     WHEN nm * qq - sq * sq <= sq * sq THEN 'Y'
          |     ELSE 'Z' END AS xyz_class""".stripMargin)
    abc.join(xyz, "l_partkey")
      .groupBy("abc_class", "xyz_class")
      .agg(count(lit(1)).cast("long").as("n_parts"),
        round(sum(col("rc")).cast("double") / max(col("t")).cast("double"), 6)
          .as("rev_share"))
      .orderBy("abc_class", "xyz_class")
  }
  val analyticsAbcXyzSql: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |    CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    date_trunc('month', l_shipdate) AS mon
      |  FROM lineitem),
      |rev AS (
      |  SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS rc
      |  FROM li GROUP BY 1),
      |ranked AS (
      |  SELECT l_partkey, rc,
      |    coalesce(sum(rc) OVER (ORDER BY rc DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      |  FROM rev),
      |tot AS (SELECT CAST(sum(rc) AS BIGINT) AS t FROM rev),
      |abc AS (
      |  SELECT l_partkey, rc, t,
      |    CASE WHEN before * 10 < t * 7 THEN 'A'
      |         WHEN before * 10 < t * 9 THEN 'B'
      |         ELSE 'C' END AS abc_class
      |  FROM ranked, tot),
      |mq AS (
      |  SELECT l_partkey, mon, CAST(sum(q) AS BIGINT) AS mq
      |  FROM li GROUP BY 1, 2),
      |xyz AS (
      |  SELECT l_partkey,
      |    CASE WHEN 4 * (count(*) * sum(mq * mq) - sum(mq) * sum(mq))
      |           <= sum(mq) * sum(mq) THEN 'X'
      |         WHEN count(*) * sum(mq * mq) - sum(mq) * sum(mq)
      |           <= sum(mq) * sum(mq) THEN 'Y'
      |         ELSE 'Z' END AS xyz_class
      |  FROM mq GROUP BY 1)
      |SELECT abc_class, xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
      |  round(CAST(sum(rc) AS DOUBLE) / CAST(max(t) AS DOUBLE), 6) AS rev_share
      |FROM abc JOIN xyz USING (l_partkey)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** C603 embed_calinski_harabasz — the variance-ratio cluster
    * validity index over the labeled embeddings (the "are these
    * clusters real" companion to C574's purity): per-(label,dim)
    * n/Σf/Σf² on 1e-9 fixed-point components (exact DECIMAL sums, one
    * corpus pass, k·d reduce state), within-SS per cell as the single
    * division (n·Σf²−S²)/n over the BOUNDED k·64 frame, total-SS the
    * same per dim, B = T − W (Huygens), CH = (B/(k−1))/(W/(n−k)).
    * The 1e18 fixed-point scaling cancels in both reported ratios.
    */
  def embedCalinskiHarabasz(s: SparkSession, d: String): DataFrame = {
    val comp = embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e9 + 0.5) AS BIGINT)").as("f"))
    val g = comp.groupBy("label", "pos")
      .agg(count(lit(1)).cast("long").as("nj"),
        sum(col("f")).cast("decimal(38,0)").as("sf"),
        sum(expr("CAST(f AS DECIMAL(38,0)) * f")).cast("decimal(38,0)").as("qf"))
    val wTot = g.selectExpr(
        "CAST(CAST(nj AS DECIMAL(38,0)) * qf - sf * sf AS DOUBLE) / nj AS wc")
      .agg(sum(col("wc")).as("w"))
    val tTot = g.groupBy("pos")
      .agg(sum(col("nj")).cast("long").as("n"),
        sum(col("sf")).cast("decimal(38,0)").as("sd"),
        sum(col("qf")).cast("decimal(38,0)").as("qd"))
      .selectExpr(
        "CAST(CAST(n AS DECIMAL(38,0)) * qd - sd * sd AS DOUBLE) / n AS tc")
      .agg(sum(col("tc")).as("t"))
    val counts = embeddings(s, d)
      .agg(count(lit(1)).cast("long").as("n_vectors"),
        countDistinct(col("label")).cast("long").as("k"))
    counts.crossJoin(broadcast(wTot)).crossJoin(broadcast(tTot))
      .selectExpr("n_vectors", "k",
        """round(((t - w) / (k - 1)) / (w / (n_vectors - k)), 6)
          |  AS ch_index""".stripMargin,
        "round(w / t, 6) AS within_ratio")
  }
  val embedCalinskiHarabaszSql: String =
    """WITH comp AS (
      |  SELECT e.label, i.i AS pos,
      |    CAST(floor(CAST(e.embedding[i.i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS f
      |  FROM embeddings e, (SELECT unnest(generate_series(1, 64)) AS i) i),
      |g AS (
      |  SELECT label, pos, CAST(count(*) AS BIGINT) AS nj,
      |    CAST(sum(f) AS DECIMAL(38,0)) AS sf,
      |    CAST(sum(CAST(f AS DECIMAL(38,0)) * f) AS DECIMAL(38,0)) AS qf
      |  FROM comp GROUP BY 1, 2),
      |w AS (
      |  SELECT sum(CAST(CAST(nj AS DECIMAL(38,0)) * qf - sf * sf AS DOUBLE) / nj)
      |    AS w
      |  FROM g),
      |t AS (
      |  SELECT sum(tc) AS t FROM (
      |    SELECT CAST(CAST(sum(nj) AS DECIMAL(38,0)) * sum(qf)
      |        - sum(sf) * sum(sf) AS DOUBLE) / sum(nj) AS tc
      |    FROM g GROUP BY pos)),
      |counts AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
      |    CAST(count(DISTINCT label) AS BIGINT) AS k
      |  FROM embeddings)
      |SELECT n_vectors, k,
      |  round(((t - w) / (k - 1)) / (w / (n_vectors - k)), 6) AS ch_index,
      |  round(w / t, 6) AS within_ratio
      |FROM counts, w, t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_obv_accumulation" -> (winObvAccumulation _),
    "stat_siegel_tukey" -> (statSiegelTukey _),
    "analytics_abc_xyz" -> (analyticsAbcXyz _),
    "embed_calinski_harabasz" -> (embedCalinskiHarabasz _),
  )

  val oracle: Map[String, String] = Map(
    "win_obv_accumulation" -> winObvAccumulationSql,
    "stat_siegel_tukey" -> statSiegelTukeySql,
    "analytics_abc_xyz" -> analyticsAbcXyzSql,
    "embed_calinski_harabasz" -> embedCalinskiHarabaszSql,
  )
}
