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

  /** Exact set-CONTAINMENT join: every (id_small, id_big) pair with
    * set(small) ⊆ set(big), small and big drawn from `left` and
    * `right` set tables (one row per id, `setCol: array<string>`,
    * deduplicated here; ids shared across sides never self-pair).
    *
    * This is the t→1 limit of the prefix lemma, where the prefix
    * collapses to a single token: a superset of r must contain ALL of
    * r's tokens — in particular r's globally RAREST one — so the
    * candidate join probes only that token's posting list (the PRETTI/
    * PIEJoin token-ordering idea). Two further sound prunes cut the
    * probe before the exact verify:
    *   - length filter |big| >= |small|;
    *   - POSITIONAL filter: with both sides sorted under the same
    *     global (df ASC, token ASC) order, r's first token must sit at
    *     position <= |s| − |r| + 1 in s (all of r's remaining |r|−1
    *     tokens order strictly after it, so they need that much room).
    * The exact verify (array_except = ∅) touches candidates only —
    * never an all-pairs product. Shuffles: one global df aggregate
    * over BOTH sides (the order must be shared), one re-sort aggregate
    * per side, the posting equi-join, two id-keyed verify joins.
    *
    * Scale note: the candidate volume is Σ_small df(rarest token) —
    * a small side whose rarest token is still a corpus-hot term is the
    * skew case; the positional filter bounds it by the hot postings'
    * tail, and a real deployment would widen the block to the k
    * rarest tokens intersected. Empty small sets (trivially contained
    * everywhere) are rejected — callers filter them deliberately. */
  def containmentJoin(left: DataFrame, right: DataFrame,
      idCol: String, setCol: String): DataFrame = {
    def norm(d: DataFrame): DataFrame =
      d.select(col(idCol).as("__id"), array_distinct(col(setCol)).as("__set"))
        .withColumn("__n", size(col("__set")).cast("long"))
        .filter(col("__n") >= 1L)
    val l = norm(left)
    val r = norm(right)
    // one SHARED global order: df over the union of both sides
    val dfreq = l.select(explode(col("__set")).as("__t"))
      .unionAll(r.select(explode(col("__set")).as("__t")))
      .groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    def ordered(d: DataFrame): DataFrame =
      d.select(col("__id"), col("__n"), explode(col("__set")).as("__t"))
        .join(dfreq, "__t")
        .groupBy(col("__id"), col("__n"))
        .agg(expr("transform(sort_array(collect_list(struct(__df, __t))), x -> x.__t)")
          .as("__ord"))
    val probe = ordered(l).select(col("__id").as("id_small"),
      col("__n").as("__ns"), col("__ord").getItem(0).as("__t"))
    val postings = ordered(r).select(col("__id").as("id_big"),
      col("__n").as("__nb"), posexplode(col("__ord")).as(Seq("__pos", "__t")))
    val cand = probe.join(postings, Seq("__t"))
      .filter(col("id_small") =!= col("id_big") &&
        col("__nb") >= col("__ns") &&
        // __pos is 0-based: r's first token at 0-based p leaves
        // nb−1−p later slots for r's other ns−1 tokens → p <= nb−ns
        col("__pos").cast("long") <= col("__nb") - col("__ns"))
      .select(col("id_small"), col("id_big"))
    cand
      .join(l.select(col("__id").as("id_small"), col("__set").as("__ss")), "id_small")
      .join(r.select(col("__id").as("id_big"), col("__set").as("__sb")), "id_big")
      .filter(size(array_except(col("__ss"), col("__sb"))) === 0)
      .select(col("id_small"), col("id_big"))
  }
}
