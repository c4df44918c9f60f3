package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed 2-D Pareto skyline (maximal rows under coordinate-wise
  * dominance) — the data-selection frontier a training pipeline asks
  * for: "keep every document no other document beats on BOTH length
  * and lexical diversity".
  *
  * `e` DOMINATES `d` iff `e.a >= d.a && e.b >= d.b` with at least one
  * strict; the skyline is every row nothing dominates. The naive
  * shapes are a quadratic NOT-EXISTS self-join or a global sort-sweep
  * (one partition holds the whole corpus). This plan prunes first,
  * EXACTLY, with one bounded collect:
  *
  *  1. fixed-width bucket on `a` (range from a single min/max row);
  *  2. per-bucket `max(b)` — ≤ `buckets` rows on the driver — and a
  *     suffix max over strictly-higher buckets gives each bucket a
  *     dominance threshold `thr`: a row with `b <= thr` is PROVABLY
  *     dominated (the witness sits in a strictly higher `a`-bucket, so
  *     its `a` is strictly larger, and its `b` is the suffix max
  *     `>= b`). The filter is a broadcast join against the ≤ `buckets`
  *     row threshold table — survivors hug the frontier.
  *  3. exact finish among survivors, PER BUCKET: a survivor's
  *     dominator can only live in its own bucket — a strictly-higher
  *     bucket's rows all have `b <= thr < b_s` (can't dominate), a
  *     strictly-lower bucket's rows all have `a < a_s` — and any
  *     same-bucket dominator has `b >= b_s > thr`, so it is itself a
  *     survivor. The finish is therefore an EQUI-join on the bucket
  *     with the dominance predicate as residual: cost is the sum of
  *     per-bucket survivor-count squares, never |survivors|² — no
  *     nested loop over the whole frontier.
  *
  *  Exactness of the restriction to survivors: if a dominator of `d`
  *  was pruned, its pruning witness sits in a strictly higher bucket
  *  and dominates `d` too; witness-chasing strictly increases the
  *  bucket, so it reaches an UNPRUNED dominator — no skyline row is
  *  lost and no dominated row survives.
  *
  * Fail-loud caps: `survivorCap` bounds the total survivor set and
  * `bucketCap` bounds any single bucket's survivors (the per-bucket
  * join is quadratic within a bucket) — on a degenerate distribution
  * (all `a` equal) pruning cannot help and the operator refuses
  * rather than silently melting.
  */
object Skyline {

  /** Skyline of `items` maximizing (`aCol`, `bCol`), both numeric and
    * non-null. Output keeps the input schema. */
  def skyline2D(items: DataFrame, aCol: String, bCol: String,
      buckets: Int = 256, survivorCap: Long = 2000000L,
      bucketCap: Long = 100000L): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val r = items.agg(min(col(aCol)).cast("double"),
      max(col(aCol)).cast("double")).head()
    if (r.isNullAt(0)) return items // empty input
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val width = math.max((hi - lo) / buckets, java.lang.Double.MIN_NORMAL)
    val bucketOf = least(floor((col(aCol).cast("double") - lit(lo)) / lit(width)),
      lit(buckets - 1)).cast("int")
    val withB = items.withColumn("__sb", bucketOf)
    // step 2: per-bucket max(b) -> suffix max over higher buckets
    val perBucket = withB.groupBy(col("__sb"))
      .agg(max(col(bCol)).cast("double").as("mb"))
      .as[(Int, Double)].collect().toMap
    val thr = new Array[Double](buckets)
    var running = Double.NegativeInfinity
    var i = buckets - 1
    while (i >= 0) {
      thr(i) = running // max b over buckets STRICTLY above i
      running = math.max(running, perBucket.getOrElse(i, Double.NegativeInfinity))
      i -= 1
    }
    val thrDf = broadcast(thr.toSeq.zipWithIndex
      .map { case (t, b) => (b, t) }.toDF("__sb", "__thr"))
    val survivors = withB.join(thrDf, "__sb")
      .filter(col(bCol).cast("double") > col("__thr"))
      .drop("__thr")
      .localCheckpoint() // survivors feed the caps and both join sides
    val byBucket = survivors.groupBy(col("__sb"))
      .agg(count(lit(1)).as("n")).as[(Int, Long)].collect()
    val n = byBucket.map(_._2).sum
    require(n <= survivorCap,
      s"skyline survivor set $n exceeds cap $survivorCap — the `$aCol` " +
        "distribution is too degenerate for bucket pruning; raise `buckets` or the cap")
    val hottest = if (byBucket.isEmpty) 0L else byBucket.map(_._2).max
    require(hottest <= bucketCap,
      s"skyline bucket holds $hottest survivors (> $bucketCap) — the finish " +
        s"is quadratic per bucket; raise `buckets` to split the `$aCol` range finer")
    val e = survivors.select(col("__sb").as("__esb"),
      col(aCol).as("__ea"), col(bCol).as("__eb"))
    survivors.join(e,
      col("__esb") === col("__sb") &&
        col("__ea") >= col(aCol) && col("__eb") >= col(bCol) &&
        (col("__ea") > col(aCol) || col("__eb") > col(bCol)),
      "left_anti")
      .drop("__sb")
  }
}
