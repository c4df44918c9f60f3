package graft

/** q293 against a brute-force quadratic Levenshtein over the same
  * derived dirty-key vocabulary — proves the deletion-neighborhood
  * candidate generation COMPLETE at t=1 (the prefix-lemma-style
  * guarantee the operator rests on): every key pair within edit
  * distance 1 must surface, none beyond. */
class SymSpellSpec extends SparkTestBase {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q293 equals brute quadratic levenshtein over the derived keys") {
    val keys = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        val b = r.getString(1).toLowerCase.split("\\s+")(0)
        if (b.length < 4 || id % 3 == 0) b
        else {
          val p = (id % b.length).toInt
          if (id % 3 == 1) b.substring(0, p) + b.substring(p + 1)
          else b.substring(0, p) + "x" + b.substring(p + 1)
        }
      }.toSet.toSeq.sorted
    val expected = (for {
      i <- keys.indices; j <- i + 1 until keys.size
      d = lev(keys(i), keys(j)) if d <= 1
    } yield (keys(i), keys(j), d.toLong)).toSet
    val got = SparkEntry.queries("q293_symspell_join")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === expected)
    // non-triviality: the planted mutations must yield real dist-1
    // pairs AND identical-key collapses must not appear (a < b)
    assert(expected.exists(_._3 == 1L))
    assert(expected.forall(p => p._1 < p._2))
  }
}
