package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters with bounded state — the
  * hot-key/hot-term detector a web-scale pipeline runs before salting
  * decisions, vocabulary pruning, or boilerplate hunting.
  *
  * Two passes, neither of which shuffles the full vocabulary:
  *  1. a Misra-Gries summary per partition (m counters, O(m) memory
  *     regardless of partition size) emits a candidate set;
  *  2. an exact recount restricted to the broadcast candidate union,
  *     filtered against the global total.
  *
  * Soundness (why the result is EXACT, not approximate): an item with
  * global count > N/(m+1) must exceed N_p/(m+1) in at least one
  * partition p (pigeonhole), and Misra-Gries with m counters never
  * evicts an item whose partition count exceeds N_p/(m+1) — so every
  * item passing the `count * phiDen > N` filter (with phiDen <= m+1)
  * is in the candidate union, and the recount gives its true count.
  * False candidates are removed by the exact filter. Never an
  * all-vocabulary groupBy: the recount shuffles <= m * partitions keys.
  */
object HeavyHitters {

  /** Items of `keyCol` whose count exceeds total/phiDen. The output
    * key column keeps the INPUT's type (the Misra-Gries sketch runs on
    * a string rendering internally, but candidates re-join the typed
    * column, so long keys come back long). Null keys are excluded
    * entirely — from the total as well as the candidates — matching
    * SQL join semantics where a null key can never be a hitter.
    * Requires m + 1 >= phiDen for the soundness argument above. */
  def topFraction(items: DataFrame, keyCol: String, phiDen: Int,
      m: Int = 200): DataFrame = {
    require(m + 1 >= phiDen, s"need m+1 >= phiDen for exactness (m=$m, phiDen=$phiDen)")
    val spark = items.sparkSession
    import spark.implicits._
    val keys = items.select(col(keyCol)).filter(col(keyCol).isNotNull)
    val cands = keys.select(col(keyCol).cast("string"))
      .as[String].mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          if (counts.contains(t)) counts(t) += 1
          else if (counts.size < m) counts(t) = 1L
          else {
            // decrement-all, drop zeros; the new item is absorbed by the
            // decrement (classic Misra-Gries step)
            val dead = List.newBuilder[String]
            counts.keysIterator.foreach { k =>
              val v = counts(k) - 1
              if (v == 0) dead += k else counts(k) = v
            }
            dead.result().foreach(counts.remove)
          }
        }
        counts.keysIterator
      }.toDF("__cand").distinct()
    val total = keys.groupBy().agg(count(lit(1)).as("__total"))
    // candidate semi-join compares on the same string rendering the
    // sketch saw, but the grouped output column is the raw typed key
    keys.join(broadcast(cands),
        col(keyCol).cast("string") === col("__cand"), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * phiDen > col("__total"))
      .drop("__total")
  }
}
