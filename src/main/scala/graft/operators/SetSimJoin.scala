package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join by global-frequency prefix filtering
  * (the AllPairs/PPJoin family) — the DETERMINISTIC scale path beside
  * the probabilistic MinHash banding: every output pair is exact, and
  * completeness is a theorem, not a collision probability.
  *
  * Why it scales: two sets with Jaccard >= t = thresholdBp/10000 must
  * share a token inside their rare-first PREFIXES — for a set of size
  * n the prefix is its first `n - ceil(t*n) + 1` tokens under the
  * global (document-frequency ASC, token ASC) order (the AllPairs
  * prefix lemma: were all >= ceil(t*n) intersection tokens outside the
  * prefix, the suffix of length ceil(t*n) - 1 could not hold them).
  * Ordering rare tokens first makes prefix collisions scarce, so the
  * candidate equi-join on the prefix token emits a sliver of the n²
  * pair space; the exact verify is linear in candidates. Shuffles:
  * one token-frequency aggregate, one per-set re-sort aggregate, one
  * candidate equi-join, two id-keyed verify joins — never an all-pairs
  * product, never a global sort.
  *
  * A candidate pair additionally passes the length filter
  * `t*|x| <= |y| && t*|y| <= |x|` (an inter <= min-size, union >=
  * max-size consequence), in exact integer arithmetic.
  */
object SetSimJoin {

  /** All unordered pairs of `sets` rows whose Jaccard similarity is
    * >= thresholdBp/10000 (inclusive), exactly. `sets` holds one row
    * per `idCol` with `setCol: array<string>` (deduplicated here).
    * Rows with EMPTY sets never pair (Jaccard undefined). Output:
    * (id_a, id_b, inter, uni) with id_a < id_b, sizes as longs.
    *
    * The plan reads `sets` three times (prefix build + both verify
    * sides) — at scale pass a STORED/persisted set table, not an
    * expensive unmaterialized derivation; the operator deliberately
    * does not checkpoint a corpus-sized input itself. */
  def jaccardSelfJoin(sets: DataFrame, idCol: String, setCol: String,
      thresholdBp: Int): DataFrame = {
    require(thresholdBp > 0 && thresholdBp <= 10000,
      s"thresholdBp must be in (0, 10000], got $thresholdBp")
    val t = thresholdBp.toLong
    val base = sets.select(col(idCol).as("__id"),
        array_distinct(col(setCol)).as("__set"))
      .withColumn("__n", size(col("__set")).cast("long"))
    val toks = base.select(col("__id"), col("__n"),
      explode(col("__set")).as("__t"))
    val dfreq = toks.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    // rare-first canonical order rebuilt per set; prefix length
    // p = n - ceil(t*n) + 1 in exact integers
    val pref = toks.join(dfreq, "__t")
      .groupBy(col("__id"), col("__n"))
      .agg(sort_array(collect_list(struct(col("__df"), col("__t")))).as("__ord"))
      // ceil(t*n) = floor((t*n + 9999)/10000); Column./ is DOUBLE
      // division in Spark, so the floor must be explicit — truncating
      // the combined expression instead silently shortens the prefix
      // and loses pairs (caught by SetSimJoinSpec)
      .withColumn("__p",
        (col("__n") - floor((lit(t) * col("__n") + 9999L) / 10000L) + 1L).cast("int"))
      .select(col("__id"), col("__n"),
        explode(expr("slice(transform(__ord, x -> x.__t), 1, __p)")).as("__t"))
    val a = pref.select(col("__t"), col("__id").as("id_a"), col("__n").as("__na"))
    val b = pref.select(col("__t"), col("__id").as("id_b"), col("__n").as("__nb"))
    val cand = a.join(b, Seq("__t"))
      .filter(col("id_a") < col("id_b") &&
        lit(t) * col("__na") <= lit(10000L) * col("__nb") &&
        lit(t) * col("__nb") <= lit(10000L) * col("__na"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(base.select(col("__id").as("id_a"), col("__set").as("__sa")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__set").as("__sb")), "id_b")
      .withColumn("inter", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("uni",
        size(array_union(col("__sa"), col("__sb"))).cast("long"))
      .filter(col("inter") * 10000L >= lit(t) * col("uni"))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }
}
