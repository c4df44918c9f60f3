package graft

import java.nio.file.Files

/** q276 winnowing against an independent brute-force reimplementation,
  * plus the two properties that make winnowing WINNOWING (Schleimer et
  * al.): every w-window of the k-gram hash stream contributes at least
  * one selected fingerprint (coverage), and any two documents sharing
  * an exact run of >= w+k-1 tokens share a selected fingerprint value
  * (the match guarantee a plagiarism index relies on). */
class WinnowSpec extends SparkTestBase {

  private val K = 3
  private val W = 4

  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Brute winnowing: every w-window keeps its min hash, rightmost on
    * ties; returns the distinct (pos, fp) selection set. */
  private def brute(text: String): Set[(Long, Long)] = {
    val ts = text.toLowerCase.split("\\s+")
    val ng = ts.length - (K - 1)
    if (ng < W) Set.empty
    else {
      val fps = (1 to ng).map(p => p.toLong -> hash60(ts.slice(p - 1, p + K - 1).mkString(" ")))
      (1 to ng - (W - 1)).flatMap { w0 =>
        val win = fps.slice(w0 - 1, w0 - 1 + W)
        val mn = win.map(_._2).min
        Some(win.filter(_._2 == mn).map(_._1).max -> mn)
      }.toSet
    }
  }

  // deterministic corpus: 30 docs over a small vocab (hash collisions
  // in window minima are common — exactly the tie cases worth testing)
  // + a planted pair sharing one exact 6-token run in different
  // surroundings
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private def docText(i: Int): String =
    (0 until 20 + i % 7).map(j => vocab((i * 31 + j * j * 17 + j) % vocab.size))
      .mkString(" ")
  private val shared = "omega kappa lambda sigma tau phi" // 6 tokens
  private val docs: Seq[(Long, String)] =
    (0 until 30).map(i => i.toLong -> docText(i)) ++
      Seq(100L -> s"${docText(3)} $shared ${docText(8)}",
        101L -> s"${docText(11)} $shared")

  private lazy val got: Map[Long, Set[(Long, Long)]] = {
    val tmp = Files.createTempDirectory("winnow").toString
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    SparkEntry.queries("q276_winnowing")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(t => (t._2, t._3)).toSet }
  }

  test("winnowing equals the brute-force selection doc-for-doc") {
    for ((id, text) <- docs) {
      val exp = brute(text)
      assert(got.getOrElse(id, Set.empty) === exp, s"doc $id selection differs")
    }
  }

  test("coverage: every w-window of every doc holds a selected position") {
    for ((id, text) <- docs) {
      val ng = text.split("\\s+").length - (K - 1)
      val pos = got.getOrElse(id, Set.empty).map(_._1)
      for (w0 <- 1 to ng - (W - 1))
        assert(pos.exists(p => p >= w0 && p <= w0 + (W - 1)),
          s"doc $id window at $w0 has no selected fingerprint")
    }
  }

  test("match guarantee: the planted 6-token run shares a fingerprint value") {
    val a = got(100L).map(_._2)
    val b = got(101L).map(_._2)
    assert((a intersect b).nonEmpty,
      "docs sharing a w+k-1 run must share a selected fingerprint")
    // and unrelated docs with disjoint vocab share nothing with the run
    val sharedFps = (a intersect b)
    assert(!got(0L).map(_._2).exists(sharedFps),
      "vocab-disjoint doc must not share the planted run's fingerprints")
  }
}
