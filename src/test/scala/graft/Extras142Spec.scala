package graft

import org.apache.spark.sql.functions._

/** Wave-42 properties: brute-force replays + structural identities. */
class Extras142Spec extends SparkSpec {

  test("multimodal_shot_boundaries: brute-force frame arithmetic on the raw bytes") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val got = queries.Extras142.multimodalShotBoundaries(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    docs.foreach { case (id, blob) =>
      val nF = (blob.length + 15) / 16
      val sums = Array.fill(nF)(0L)
      blob.zipWithIndex.foreach { case (b, i) => sums(i / 16) += (b & 0xff) }
      val total = sums.sum
      val deltas = sums.sliding(2).collect { case Array(a, b) => math.abs(b - a) }.toSeq
      val cuts = deltas.count(_ * nF > 2 * total)
      val expect = (nF.toLong, if (nF > 0) cuts + 1L else 0L,
        if (deltas.nonEmpty) deltas.max else 0L)
      assert(got(id) == expect, s"doc $id: ${got(id)} vs $expect")
    }
  }

  test("set_except_all_sym: surviving multiplicity = |countA - countB| on the larger side") {
    val byPri = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority AS pri", "o_orderkey % 2 AS m").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues { xs =>
        (xs.count(_._2 == 0L).toLong, xs.count(_._2 == 1L).toLong)
      }.toMap
    val got = queries.Extras142.setExceptAllSym(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    byPri.foreach { case (pri, (ca, cb)) =>
      if (ca > cb) assert(got(("a_minus_b", pri)) == ca - cb)
      if (cb > ca) assert(got(("b_minus_a", pri)) == cb - ca)
      if (ca > cb) assert(!got.contains(("b_minus_a", pri)))
      if (cb > ca) assert(!got.contains(("a_minus_b", pri)))
    }
    assert(got.nonEmpty)
  }

  test("embed_cluster_purity: purity from the fitted assignments; bounds and census") {
    val rows = queries.Extras142.embedClusterPurity(spark, sf).collect()
    assert(rows.nonEmpty)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nVecs, "cluster census != corpus")
    val purity = rows.head.getDouble(4)
    assert(rows.forall(r => math.abs(r.getDouble(4) - purity) < 1e-12))
    // purity = Σ majority_n / N by definition
    assert(math.abs(purity - rows.map(_.getLong(3)).sum.toDouble / nVecs) < 1e-5)
    // majority really is the max: majority_n >= n_vecs / #labels is weak;
    // assert majority_n <= n_vecs and >= ceil(n_vecs / 10) (10 labels)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      assert(purity >= 1.0 / 10 && purity <= 1.0)
    }
  }

  test("dim_junk_encode: surrogate keys dense over the combo grid; roundtrip loses nothing") {
    val rows = queries.Extras142.dimJunkEncode(spark, sf).collect()
    val nCombos = Tables.orders(spark, sf)
      .select("o_orderstatus", "o_orderpriority").distinct().count()
    assert(rows.length == nCombos)
    assert(rows.map(_.getLong(0)).toSeq == (1L to nCombos).toSeq,
      "surrogate keys must be dense 1..n in combo order")
    assert(rows.map(_.getLong(3)).sum == Tables.orders(spark, sf).count(),
      "fact rows lost in the junk-dimension roundtrip")
    // keys ordered by the natural combo order
    val combos = rows.map(r => (r.getString(1), r.getString(2)))
    assert(combos.sorted.toSeq == combos.toSeq)
  }
}
