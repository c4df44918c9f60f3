package graft

import org.apache.spark.sql.functions._

/** Behavioral checks for the q235-q240 wave beyond their DuckDB
  * oracles: brute-force reimplementations (LISA scatter, ring
  * successor) and the chunk-dedup conservation invariant.
  */
class NewWaveSpec extends SparkTestBase {

  test("q235 LISA agrees with a brute-force neighbor scan and classifies a checkerboard") {
    // independent recompute: collect the occupied-cell table from the
    // same synthetic universe, then classify each cell in plain Scala
    val out = SparkEntry.queries("q235_lisa")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(6))).toMap
    val n = geo.CellIndex.width(9)
    val cells = synth.SynthUniverse.points(spark, sfSmoke)
      .select(
        least(greatest(floor((col("lon") + 180.0) / 360.0 * n), lit(0)), lit(n - 1))
          .cast("long").as("ix"),
        least(greatest(floor((col("lat") + 90.0) / 180.0 * n), lit(0)), lit(n - 1))
          .cast("long").as("iy"))
      .groupBy("ix", "iy").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val nc = cells.size.toLong
    val s = cells.values.sum
    val d = cells.map { case (k, v) => k -> (nc * v - s) }
    assert(out.keySet === d.keySet)
    d.foreach { case ((ix, iy), dv) =>
      val nbrs = Seq((ix + 1, iy), (ix - 1, iy), (ix, iy + 1), (ix, iy - 1))
        .flatMap(d.get)
      val lag = nbrs.sum
      val cls =
        if (dv > 0 && lag > 0) "HH" else if (dv < 0 && lag < 0) "LL"
        else if (dv > 0 && lag < 0) "HL" else if (dv < 0 && lag > 0) "LH"
        else "NS"
      val (gd, gwn, glag, gcls) = out((ix, iy))
      assert(gd === dv && gwn === nbrs.size.toLong && glag === lag && gcls === cls,
        s"cell ($ix,$iy): got ($gd,$gwn,$glag,$gcls) want ($dv,${nbrs.size},$lag,$cls)")
    }
    // the synthetic clusters must make the statistic non-vacuous:
    // hot cores AND cold rims both present
    val classes = out.values.map(_._4).toSet
    assert(classes.contains("HH") && classes.contains("LL"), classes.toString)
    Bench.clearState(spark)
  }

  test("q236 chunk dedup conserves distinct chunks exactly once") {
    val docs = queries.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def chunksOf(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").toSeq.grouped(8).map(_.mkString(" ")).toSeq
    val all = docs.toSeq.flatMap { case (id, t) =>
      chunksOf(t).zipWithIndex.map { case (c, p) => (id, p.toLong, c) }
    }
    val out = SparkEntry.queries("q236_chunk_dedup")(spark, sfSmoke)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // conservation: every distinct chunk survives exactly once
    assert(out.values.map(_._2).sum === all.map(_._3).distinct.size.toLong)
    // winner is the (doc_id, pos)-minimal occurrence; docs reassemble
    // their surviving chunks in order
    val winner = all.groupBy(_._3).map { case (c, occ) =>
      c -> occ.map(o => (o._1, o._2)).min
    }
    docs.foreach { case (id, t) =>
      val cs = chunksOf(t)
      val kept = cs.zipWithIndex
        .filter { case (c, p) => winner(c) == (id, p.toLong) }.map(_._1)
      val (nChunks, k, dropped, newText) = out(id)
      assert(nChunks === cs.size.toLong && k === kept.size.toLong &&
        dropped === (cs.size - kept.size).toLong &&
        newText === kept.mkString(" "), s"doc $id")
    }
    Bench.clearState(spark)
  }

  test("q240 ring successor matches a brute scan; rows move only to the joining node") {
    import queries.RelationalQueries.ShardRing
    def bruteOwner(h: Long, ring: Seq[(Long, Long)]): Long =
      ring.filter(_._1 >= h).sortBy(_._1).headOption
        .getOrElse(ring.minBy(_._1))._2
    (0L until 5000L).foreach { id =>
      val h = (id % ShardRing.M * 2654435761L + 12345L) % ShardRing.M
      val old = bruteOwner(h, ShardRing.oldRing)
      val nw = bruteOwner(h, ShardRing.newRing)
      // consistent-hashing property: a row either keeps its owner or
      // moves to the joining node 4 — never old→other-old
      assert(old == nw || nw == 4L, s"id $id: $old -> $nw")
    }
    val rows = SparkEntry.queries("q240_shard_rebalance")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.filter(r => r._4 == 1L).forall(_._2 == 4L),
      "moved rows must land on the joining node")
    assert(rows.map(_._3).sum === 500L) // every doc assigned exactly once
    // cross-check one bucket against the brute scan
    rows.foreach { case (o, nn, cnt, _) =>
      val want = (0L until 500L).count { id =>
        val h = (id % ShardRing.M * 2654435761L + 12345L) % ShardRing.M
        bruteOwner(h, ShardRing.oldRing) == o && bruteOwner(h, ShardRing.newRing) == nn
      }
      assert(cnt === want.toLong, s"bucket ($o,$nn)")
    }
    Bench.clearState(spark)
  }
}
