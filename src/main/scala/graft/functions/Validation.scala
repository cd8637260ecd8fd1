package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven validation rule engine — the reference's A15 operator
  * (SURVEY §2-A: UPSTREAM `ocdb/core/val/validator.py` +
  * `ocdb/res/validation_config.json`), re-expressed Spark-first.
  *
  * The reference walks each parsed file row-by-row in Python applying
  * required/range/compare rules and emitting OK/WARNING/ERROR issues.
  * Here the whole rule battery compiles to ONE aggregation pass: each
  * rule becomes a `sum(when(violation, 1))` column, so validating a
  * 100 TB ingest batch is a single scan with map-side partial
  * aggregation — no per-row driver loop, no second pass per rule.
  */
object Validation {

  sealed trait Severity { def name: String }
  case object Warning extends Severity { val name = "WARNING" }
  case object Error extends Severity { val name = "ERROR" }

  /** One validation rule: `name` for the report, `severity`, and the
    * violation predicate over the frame's columns.
    */
  sealed trait Rule {
    def name: String
    def severity: Severity
    /** Column expression that is true on VIOLATING rows. */
    def violation: Column
  }

  /** Field must be present (non-null). */
  final case class Required(field: String, severity: Severity = Error) extends Rule {
    val name = s"required:$field"
    def violation: Column = col(field).isNull
  }

  /** Numeric field must lie in [lo, hi] when present. */
  final case class NumericRange(field: String, lo: Double, hi: Double,
      severity: Severity = Warning) extends Rule {
    val name = s"range:$field[$lo,$hi]"
    def violation: Column = col(field).isNotNull && !col(field).between(lo, hi)
  }

  /** Two fields must satisfy `a <= b` when both present (the
    * reference's compare rule, e.g. min_depth <= max_depth).
    */
  final case class LessOrEqual(a: String, b: String,
      severity: Severity = Error) extends Rule {
    val name = s"compare:$a<=$b"
    def violation: Column = col(a).isNotNull && col(b).isNotNull && col(a) > col(b)
  }

  /** String field must match a regex when present. */
  final case class Matches(field: String, pattern: String,
      severity: Severity = Warning) extends Rule {
    val name = s"matches:$field~$pattern"
    def violation: Column = col(field).isNotNull && !col(field).rlike(pattern)
  }

  /** Run the battery in one pass. Returns one row per rule:
    * (rule, severity, n_violations, n_rows) plus an overall status
    * column per the reference's OK / WARNING / ERROR rollup.
    */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val aggs = rules.map(r =>
      sum(when(r.violation, 1L).otherwise(0L)).as(s"v_${r.name}")) :+
      count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perRule = rules.map { r =>
      struct(lit(r.name).as("rule"), lit(r.severity.name).as("severity"),
        col(s"`v_${r.name}`").as("n_violations"), col("n_rows"))
    }
    one.select(explode(array(perRule: _*)).as("r"))
      .select(col("r.rule"), col("r.severity"), col("r.n_violations"), col("r.n_rows"))
      .withColumn("status",
        when(col("n_violations") === 0, "OK")
          .when(col("severity") === "ERROR", "ERROR")
          .otherwise("WARNING"))
  }

  /** Overall submission status: ERROR if any error rule fires, else
    * WARNING if any warning fires, else OK (reference rollup).
    */
  def overallStatus(report: DataFrame): String = {
    val rows = report.select("status").distinct().collect().map(_.getString(0)).toSet
    if (rows.contains("ERROR")) "ERROR"
    else if (rows.contains("WARNING")) "WARNING"
    else "OK"
  }
}
