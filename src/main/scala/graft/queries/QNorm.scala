package graft.queries

/** Acklam's rational-polynomial inverse normal CDF as a SQL fragment —
  * IDENTICAL arithmetic text in Spark SQL and DuckDB SQL, so both
  * engines evaluate bit-identical doubles (|rel err| < 1.15e-9, far
  * below the ·10⁶ quantization every consumer applies). Shared by the
  * Filliben PPCC row and the r12 normal-scores battery (van der
  * Waerden / Klotz / Fligner–Killeen / Dunn critical values).
  */
object QNorm {
  def sql(p: String): String = {
    val ql = s"sqrt(-2 * ln($p))"
    val qu = s"sqrt(-2 * ln(1 - ($p)))"
    val r = s"(($p) - 0.5) * (($p) - 0.5)"
    val q = s"(($p) - 0.5)"
    s"""CASE
      |WHEN ($p) < 0.02425 THEN
      |  (((((-7.784894002430293e-03 * $ql - 3.223964580411365e-01) * $ql
      |     - 2.400758277161838e+00) * $ql - 2.549732539343734e+00) * $ql
      |     + 4.374664141464968e+00) * $ql + 2.938163982698783e+00)
      |  / ((((7.784695709041462e-03 * $ql + 3.224671290700398e-01) * $ql
      |     + 2.445134137142996e+00) * $ql + 3.754408661907416e+00) * $ql + 1)
      |WHEN ($p) > 1 - 0.02425 THEN
      |  -((((((-7.784894002430293e-03 * $qu - 3.223964580411365e-01) * $qu
      |     - 2.400758277161838e+00) * $qu - 2.549732539343734e+00) * $qu
      |     + 4.374664141464968e+00) * $qu + 2.938163982698783e+00)
      |  / ((((7.784695709041462e-03 * $qu + 3.224671290700398e-01) * $qu
      |     + 2.445134137142996e+00) * $qu + 3.754408661907416e+00) * $qu + 1))
      |ELSE
      |  (((((-3.969683028665376e+01 * $r + 2.209460984245205e+02) * $r
      |     - 2.759285104469687e+02) * $r + 1.383577518672690e+02) * $r
      |     - 3.066479806614716e+01) * $r + 2.506628277459239e+00) * $q
      |  / (((((-5.447609879822406e+01 * $r + 1.615858368580409e+02) * $r
      |     - 1.556989798598866e+02) * $r + 6.680131188771972e+01) * $r
      |     - 1.328068155288572e+01) * $r + 1)
      |END""".stripMargin
  }
}
