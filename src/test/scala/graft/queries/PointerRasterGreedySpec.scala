package graft

import scala.collection.mutable

/** q286 / q288 / q292 against independent brute-force Scala
  * reimplementations on the sfSmoke tables — the oracle proves DuckDB
  * parity; these prove the SEMANTICS: pointer DOUBLING equals eight
  * iterated single steps, the scatter gradient equals the direct
  * four-neighbor stencil, and the distributed greedy equals the
  * sequential set-cover greedy. */
class PointerRasterGreedySpec extends SparkTestBase {

  private lazy val eventIds: Array[Long] =
    spark.read.parquet(s"$sfSmoke/events.parquet")
      .select("event_id").collect().map(_.getLong(0))

  private lazy val cells: Map[(Long, Long), Long] = {
    val m = mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    eventIds.foreach { id =>
      m((id * 17 % 320000) / 4000 -> (id * 23 % 150000) / 4000) += 1L
    }
    m.toMap
  }

  private def d8(c: (Long, Long)): (Long, Long) = {
    val (cx, cy) = c
    val cands = for {
      dx <- -1L to 1L; dy <- -1L to 1L
      if !(dx == 0 && dy == 0)
      n = (cx + dx, cy + dy)
      if cells.contains(n) && cells(n) < cells(c)
    } yield (cells(n), n._1, n._2)
    if (cands.isEmpty) c else { val m = cands.min; (m._2, m._3) }
  }

  test("q286 pointer doubling equals eight iterated single D8 steps") {
    val got = SparkEntry.queries("q286_watershed")(spark, sfSmoke)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)), r.getLong(4)))
      .toMap
    assert(got.size === cells.size)
    for (c <- cells.keys) {
      var p = c
      for (_ <- 1 to 8) p = d8(p)
      val settled = if (d8(p) == p) 1L else 0L
      assert(got(c) === ((p, settled)), s"cell $c basin differs")
    }
    // at least one multi-step basin and one settled sink must exist
    // for the test to mean anything
    assert(cells.keys.exists(c => d8(c) != c))
    assert(got.values.exists(_._2 == 1L))
  }

  test("q288 scatter gradient equals the direct four-neighbor stencil") {
    val got = SparkEntry.queries("q288_gradient_aspect")(spark, sfSmoke)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)), r.getString(5)))
      .toMap
    assert(got.size === cells.size)
    def z(cx: Long, cy: Long): Long = cells.getOrElse((cx, cy), 0L)
    for (((cx, cy), _) <- cells) {
      val gx = z(cx + 1, cy) - z(cx - 1, cy)
      val gy = z(cx, cy + 1) - z(cx, cy - 1)
      val aspect =
        if (gx == 0 && gy == 0) "flat"
        else if (math.abs(gx) > math.abs(gy)) { if (gx > 0) "w" else "e" }
        else if (math.abs(gy) > math.abs(gx)) { if (gy > 0) "s" else "n" }
        else if (gx > 0) { if (gy > 0) "sw" else "nw" }
        else { if (gy > 0) "se" else "ne" }
      assert(got((cx, cy)) === (((gx, gy), aspect)), s"cell ($cx,$cy) differs")
    }
  }

  test("q292 distributed greedy equals the sequential set-cover greedy") {
    val texts = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val gramsOf: Map[Long, Set[String]] = texts.map { case (id, t) =>
      val ts = t.toLowerCase.split("\\s+")
      id -> (if (ts.length < 3) Set.empty[String]
        else (0 to ts.length - 3).map(i => ts.slice(i, i + 3).mkString(" ")).toSet)
    }.toMap
    val covered = mutable.Set.empty[String]
    val expected = (1 to 5).map { k =>
      val (id, gain) = gramsOf
        .map { case (id, g) => id -> (g -- covered).size.toLong }
        .filter(_._2 > 0)
        .minBy { case (id, gain) => (-gain, id) }
      covered ++= gramsOf(id)
      (k.toLong, id, gain, covered.size.toLong)
    }
    val got = SparkEntry.queries("q292_greedy_cover")(spark, sfSmoke)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got === expected)
    // diminishing returns is the algorithm's signature — gains must be
    // non-increasing
    assert(got.map(_._3) === got.map(_._3).sorted.reverse)
  }
}
