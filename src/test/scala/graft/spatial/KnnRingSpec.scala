package graft.spatial

import graft.SparkTestBase
import graft.synth.SynthUniverse
import org.apache.spark.sql.functions._

/** The ring-expansion kNN (the 100 TB path) must return exactly the
  * same nearest neighbor as the brute-force broadcast baseline. */
class KnnRingSpec extends SparkTestBase {

  test("nearestByRings == knnBroadcast(k=1) on sf0.001") {
    val pts = SynthUniverse.points(spark, sfSmoke)
    val polys = SpatialJoin.polygons(
      SynthUniverse.wayMembers(spark, sfSmoke), SynthUniverse.nodes(spark, sfSmoke))
    val cents = polys.select(col("way_id"),
      ((array_min(col("xs")) + array_max(col("xs"))) / 2.0).as("cx"),
      ((array_min(col("ys")) + array_max(col("ys"))) / 2.0).as("cy"))

    val brute = SpatialJoin.knnBroadcast(pts, cents, 1)
      .select(col("doc_id"), col("entity"), col("way_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    val rings = SpatialJoin.nearestByRings(pts, cents, res = 6)
      .select(col("doc_id"), col("entity"), col("way_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(rings.keySet === brute.keySet)
    val diff = rings.collect { case (k, v) if brute(k) != v => (k, v, brute(k)) }
    assert(diff.isEmpty, s"ring kNN disagrees on ${diff.take(5)}")
  }

  test("knnByRings(k=3) == knnBroadcast(k=3) on sf0.001, sparse layer") {
    val pts = SynthUniverse.points(spark, sfSmoke)
    val polys = SpatialJoin.polygons(
      SynthUniverse.wayMembers(spark, sfSmoke), SynthUniverse.nodes(spark, sfSmoke))
    // every 40th polygon — the q31 layer shape: sparse enough that ring
    // expansion needs several rounds AND the brute fallback serves a
    // straggler tail, covering both paths
    val cents = polys.filter(col("way_id") % 40 === 0).select(col("way_id"),
      ((array_min(col("xs")) + array_max(col("xs"))) / 2.0).as("cx"),
      ((array_min(col("ys")) + array_max(col("ys"))) / 2.0).as("cy"))

    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("entity"), col("rank"), col("way_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap

    val brute = key(SpatialJoin.knnBroadcast(pts, cents, 3))
    val rings = key(SpatialJoin.knnByRings(pts, cents, res = 5, k = 3))
    assert(rings.keySet === brute.keySet)
    val diff = rings.collect { case (k, v) if brute(k) != v => (k, v, brute(k)) }
    assert(diff.isEmpty, s"k=3 ring kNN disagrees on ${diff.take(5)}")
  }

  test("over-limit layer never collects: coarser-res + shuffled fallback still exact") {
    // force the driver-safety gate: with the broadcast limit below the
    // layer size, knnByRings must route stragglers through coarser-res
    // rings and the distributed shuffled fallback instead of
    // collecting/broadcasting the layer — and still match brute force
    val pts = SynthUniverse.points(spark, sfSmoke)
    val polys = SpatialJoin.polygons(
      SynthUniverse.wayMembers(spark, sfSmoke), SynthUniverse.nodes(spark, sfSmoke))
    val cents = polys.filter(col("way_id") % 40 === 0).select(col("way_id"),
      ((array_min(col("xs")) + array_max(col("xs"))) / 2.0).as("cx"),
      ((array_min(col("ys")) + array_max(col("ys"))) / 2.0).as("cy"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("entity"), col("rank"), col("way_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    val brute = key(SpatialJoin.knnBroadcast(pts, cents, 3))
    spark.conf.set("spark.graft.knnBroadcastLimit", "1")
    try {
      val gated = key(SpatialJoin.knnByRings(pts, cents, res = 5, k = 3))
      assert(gated === brute)
    } finally spark.conf.unset("spark.graft.knnBroadcastLimit")
  }

  test("knnByRings == knnBroadcast across random clustered layouts and k") {
    import spark.implicits._
    // deterministic LCG layouts; half the layer packed into one corner
    // so the start-ring estimate is WRONG for the dense region and the
    // sparse tail exercises extra rounds + the brute fallback
    for (seed <- Seq(7L, 99L); k <- Seq(1, 4)) {
      var x = seed
      def next(): Double = {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 11).toDouble / (1L << 53).toDouble
      }
      val pts = Seq.tabulate(300)(i =>
        (i.toLong, "e", next() * 320 - 160, next() * 150 - 75))
        .toDF("doc_id", "entity", "lon", "lat")
      val cents = Seq.tabulate(60)(i =>
        if (i % 2 == 0) (i.toLong, next() * 320 - 160, next() * 150 - 75)
        else (i.toLong, next() * 20 - 160, next() * 10 - 75))
        .toDF("way_id", "cx", "cy")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), col("rank"), col("way_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val brute = key(SpatialJoin.knnBroadcast(pts, cents, k))
      val rings = key(SpatialJoin.knnByRings(pts, cents, res = 5, k = k))
      assert(rings === brute, s"seed=$seed k=$k")
    }
  }
}
