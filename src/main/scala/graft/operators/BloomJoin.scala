package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.functions._
import graft.functions.{BloomBuildAgg, BloomMightContain}

/** Exact semi-join with a Bloom runtime prefilter on the probe side —
  * for the regime where the build side is too large to broadcast (so
  * the join must shuffle BOTH sides) yet much more selective than the
  * probe. One extra pass over the build side produces a fixed-size
  * bitset; the probe then drops non-matching rows BEFORE its shuffle,
  * so the exchange carries ~|matches| (+ the false-positive trickle)
  * instead of the corpus. The trailing exact join removes false
  * positives — output is bit-identical to the plain semi-join.
  */
object BloomJoin {

  /** Bloom membership predicate for `key` against the build side's
    * `key` values (two Spark jobs: build-aggregate, then the caller's
    * action). Exposed for composing into arbitrary plans.
    *
    * Both sides feed the filter through `xxhash64(key)` — NOT a
    * `cast("long")` — so the prefilter stays sound for ANY key type:
    * a string key cast to long is null, which would silently drop
    * probe rows the exact semi-join matches. The hash is type-tagged
    * per Spark's hash semantics and identical on both sides, so no
    * true match is ever filtered (only the usual false-positive
    * trickle passes, removed by the trailing exact join). Null keys
    * never match a semi-join, so the predicate rejects them outright
    * rather than letting them hash to the seed. */
  def probePredicate(build: DataFrame, key: String,
      numBits: Int = 1 << 22, numHashes: Int = 4): Column = {
    val bytes = build
      .select(GraftSqlShim.column(
        BloomBuildAgg(GraftSqlShim.expression(xxhash64(col(key))),
          numBits, numHashes).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    col(key).isNotNull && GraftSqlShim.column(BloomMightContain(bytes, numHashes,
      GraftSqlShim.expression(xxhash64(col(key)))))
  }

  /** `probe LEFT SEMI JOIN build USING (key)`, bloom-prefiltered. */
  def semiJoin(probe: DataFrame, build: DataFrame, key: String,
      numBits: Int = 1 << 22, numHashes: Int = 4): DataFrame =
    probe.filter(probePredicate(build, key, numBits, numHashes))
      .join(build.select(key), Seq(key), "left_semi")
}
