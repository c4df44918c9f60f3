package graft

import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkTestBase {

  test("q13 minhash-LSH finds the same near-dup pairs as exact q12 jaccard") {
    // LSH with 4 bands of 4 rows has >99% recall at jaccard >= 0.5;
    // on the planted near-dups both must agree exactly.
    val exact = SparkEntry.queries("q12_ngram_jaccard_pairs")(spark, sfSmall)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q13_minhash_lsh_pairs")(spark, sfSmall)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty, "testdata should contain planted near-duplicates")
  }

  test("q11 exact dedup collapses the planted duplicate copies") {
    val df = SparkEntry.queries("q11_exact_dedup")(spark, sfSmall)
    assert(df.filter(col("n_copies") =!= 2).count() === 0)
  }

  test("q14 simhash of near-duplicate docs differs in few bits") {
    val sim = SparkEntry.queries("q14_simhash")(spark, sfSmall)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("q12_ngram_jaccard_pairs")(spark, sfSmall)
      .filter(col("jaccard_ppm") > 900000)
      .select("id_a", "id_b").collect()
    pairs.foreach { r =>
      val d = java.lang.Long.bitCount(sim(r.getLong(0)) ^ sim(r.getLong(1)))
      assert(d <= 12, s"near-dup pair ${r.getLong(0)},${r.getLong(1)} hamming=$d")
    }
  }

  test("q19 cosine top-k is symmetric-sane: neighbor != query, k per query") {
    val df = SparkEntry.queries("q19_cosine_topk")(spark, sfSmall)
    assert(df.filter(col("neighbor_id") === col("query_id")).count() === 0)
    val counts = df.groupBy("query_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).forall(_ <= 5))
  }

  test("q49 clusters: both ends of every near-dup pair share a cluster id <= both ids") {
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry.queries("q13_minhash_lsh_pairs")(spark, sfSmoke)
      .select(col("id_a"), col("id_b"))
    val cl = SparkEntry.queries("q49_neardup_clusters")(spark, sfSmoke)
    val joined = pairs
      .join(cl.select(col("doc_id").as("id_a"), col("cluster_id").as("ca")), "id_a")
      .join(cl.select(col("doc_id").as("id_b"), col("cluster_id").as("cb")), "id_b")
    assert(joined.filter(col("ca") =!= col("cb")).count() === 0)
    assert(cl.filter(col("cluster_id") > col("doc_id")).count() === 0)
  }

  test("q18 fingerprint is stable across repeated runs") {
    val a = SparkEntry.queries("q18_fingerprint")(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SparkEntry.queries("q18_fingerprint")(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
