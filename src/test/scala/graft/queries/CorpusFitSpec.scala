package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Semantic properties of the Heaps/NDCG/fertility/Simpson entries
  * beyond the hash oracle: metric bounds that must hold on ANY corpus,
  * so a formula regression fails here even if both engines drift
  * together. */
class CorpusFitSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("corpus_heaps_fit: growth exponent lands in (0, 1] — vocabulary " +
      "never shrinks and never outgrows the corpus linearly") {
    val r = SparkEntry.catalog("corpus_heaps_fit").query(spark, sf)
      .collect().head
    val beta = r.getAs[Long]("beta_ppm")
    assert(beta > 0 && beta <= 1000000L, s"beta_ppm=$beta out of (0, 1e6]")
    assert(r.getAs[Long]("n_points") == 8L)
  }

  test("sim_ndcg_eval: ndcg in [0, 1], dcg <= idcg, and the ideal DCG " +
      "matches the closed form over ranks 1..10") {
    val r = SparkEntry.catalog("sim_ndcg_eval").query(spark, sf)
      .collect().head
    val (dcg, idcg) = (r.getAs[Long]("dcg_nano"), r.getAs[Long]("idcg_nano"))
    assert(dcg >= 0 && dcg <= idcg, s"dcg=$dcg idcg=$idcg")
    assert(r.getAs[Long]("ndcg_ppm") == 1000000L * dcg / idcg)
    val closed = (1 to 10).map(i =>
      (11L - i) * math.round(1e9 * 0.6931471805599453 / math.log(i + 1.0))).sum
    assert(idcg == closed, s"idcg=$idcg closed-form=$closed")
  }

  test("vocab_fertility_by_lang: every language's fertility >= 1 token " +
      "per word and the lang rollup conserves the corpus word count") {
    val rows = SparkEntry.catalog("vocab_fertility_by_lang").query(spark, sf)
      .collect()
    for (r <- rows) {
      assert(r.getAs[Long]("tokens_per_word_ppm") >= 1000000L,
        s"${r.getAs[String]("lang")}: a word encodes to >= 1 BPE token")
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_chars") >= r.getAs[Long]("n_tokens"),
        "merged symbols never exceed their character mass")
    }
    val perDoc = SparkEntry.catalog("vocab_bpe_apply").query(spark, sf)
      .collect().map(_.getAs[Long]("n_words")).sum
    assert(rows.map(_.getAs[Long]("n_words")).sum == perDoc,
      "lang rollup and per-doc encode must count the same words")
  }

  test("corpus_simpson_diversity: 1 <= eff_types <= n_distinct " +
      "(Hill-number bounds) on every source") {
    for (r <- SparkEntry.catalog("corpus_simpson_diversity")
        .query(spark, sf).collect()) {
      val eff = r.getAs[Long]("eff_types")
      assert(eff >= 1 && eff <= r.getAs[Long]("n_distinct"),
        s"${r.getAs[String]("source")}: eff_types=$eff outside " +
          s"[1, ${r.getAs[Long]("n_distinct")}]")
    }
  }
}
