package graft

import org.apache.spark.sql.functions._
import graft.queries.Tables

/** q177/q179/q180 against independent brute-force reimplementations —
  * the oracle proves DuckDB parity; these prove the SEMANTICS (the
  * grid prefilter loses no neighbor pair, the alternating-star
  * clustering equals union-find, the Page/Lindley window identity
  * equals the sequential CUSUM fold, the tagged single-pass Hausdorff
  * fold equals the double loop). */
class NewOpsPropSpec extends SparkTestBase {

  test("q179 grid-DBSCAN equals brute-force O(n^2) DBSCAN at sf0.001") {
    val got = SparkEntry.queries("q179_dbscan")(spark, sfSmoke)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

    // same closed-form point cloud, recomputed independently
    val P = 3037000493L
    val n = 1000L
    val m = math.ceil(math.sqrt(n.toDouble)).toLong * 100L
    val pts = (0L until n).map(i =>
      i -> (((i * i % P + i * 2654435761L) % P % m,
        (i * i % P * 2 + i * 2246822519L) % P % m)))
    val coord = pts.toMap
    def d2(a: Long, b: Long): Long = {
      val (ax, ay) = coord(a); val (bx, by) = coord(b)
      (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
    }
    val ids = pts.map(_._1)
    val nbrs = ids.map(i =>
      i -> ids.filter(j => j != i && d2(i, j) <= 10000L)).toMap
    val core = ids.filter(i => nbrs(i).size >= 3).toSet
    // union-find over core-core eps-edges
    val par = scala.collection.mutable.Map(core.toSeq.map(i => i -> i): _*)
    def find(a: Long): Long = { var x = a; while (par(x) != x) x = par(x); x }
    for (i <- core; j <- nbrs(i) if core(j)) {
      val (ri, rj) = (find(i), find(j)); if (ri != rj) par(ri) = rj
    }
    val label = core.groupBy(find).flatMap { case (_, comp) =>
      val lbl = comp.min; comp.map(_ -> lbl)
    }
    val expected = ids.map { i =>
      if (core(i)) i -> (("core", label(i)))
      else {
        val coreNb = nbrs(i).filter(core)
        if (coreNb.nonEmpty) i -> (("border", coreNb.map(label).min))
        else i -> (("noise", -1L))
      }
    }.toMap
    assert(got.size === expected.size)
    assert(got === expected)
    // structure sanity: all three roles occur at this sf
    assert(Set("core", "border", "noise").subsetOf(
      expected.values.map(_._1).toSet))
  }

  test("q180 window identity equals the sequential CUSUM fold") {
    val got = SparkEntry.queries("q180_cusum")(spark, sfSmoke)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // take vb from the SAME bp rounding Spark applies, fold in Scala
    val rows = Tables.events(spark, sfSmoke)
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsu"),
        col("event_id"), Tables.bp(col("value")).as("vb"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val ordered = es.sortBy(e => (e._2, e._3))
      var su = 0L; var sd = 0L
      var nUp = 0L; var nDn = 0L; var mUp = 0L; var mDn = 0L
      for ((_, _, _, vb) <- ordered) {
        su = math.max(0L, su + (vb - 550000L))
        sd = math.max(0L, sd + (450000L - vb))
        if (su >= 2000000L) nUp += 1
        if (sd >= 2000000L) nDn += 1
        mUp = math.max(mUp, su); mDn = math.max(mDn, sd)
      }
      u -> ((nUp, nDn, mUp, mDn))
    }
    assert(got === expected)
    assert(expected.values.map(_._1).sum > 0, "no up-alarms fired")
    assert(expected.values.map(_._2).sum > 0, "no down-alarms fired")
  }

  test("q177 tagged single-pass Hausdorff equals the double loop at sf0.01") {
    val got = SparkEntry.queries("q177_hausdorff")(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty, "no candidate pairs at sf0.01")

    val ev = Tables.events(spark, sfSmall)
      .select(col("user_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pos = ev.map { case (u, e) =>
      (u, (e * 17 % 320000 - 160000, e * 23 % 150000 - 75000))
    }.distinct.groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2) }
    val xs = graft.geo.CellIndex.XShift
    val rs = graft.geo.CellIndex.ResShift
    val tiles = pos.map { case (u, ps) =>
      u -> ps.map { case (x, y) =>
        (5L << rs) | (((x + 180000) * 32 / 360000) << xs) |
          ((y + 90000) * 32 / 180000)
      }.toSet
    }
    val users = tiles.keys.toSeq.sorted
    val pairs = for {
      a <- users; b <- users if a < b
      if (tiles(a) intersect tiles(b)).size >= 30
    } yield (a, b)
    val expected = pairs.map { case (a, b) =>
      def h(from: Iterable[(Long, Long)], to: Iterable[(Long, Long)]): Long =
        from.map { case (x1, y1) =>
          to.map { case (x2, y2) =>
            (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
          }.min
        }.max
      val ab = h(pos(a), pos(b)); val ba = h(pos(b), pos(a))
      (a, b) -> ((ab, ba, math.max(ab, ba)))
    }.toMap
    assert(got === expected)
  }
}
