package graft

/** The Gibbs bound is the tripwire that caught this row's original
  * normalization bug (fixed-vocab smoothing on a 31-token corpus drove
  * KL negative): every per-language KL must be ≥ 0, and the row must
  * cover every language.
  */
class Extras113Spec extends SparkSpec {

  test("text_lang_token_kl: one row per language, KL >= 0 (Gibbs)") {
    val rows = queries.Extras113.textLangTokenKl(spark, sf).collect()
    val langs = Tables.documents(spark, sf)
      .select("lang").distinct().count()
    assert(rows.length == langs, s"${rows.length} rows for $langs languages")
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: no tokens")
      assert(r.getDouble(2) >= 0.0,
        s"${r.getString(0)}: KL=${r.getDouble(2)} violates the Gibbs " +
          "bound — the distributions are no longer normalized over a " +
          "common support")
    }
  }
}
