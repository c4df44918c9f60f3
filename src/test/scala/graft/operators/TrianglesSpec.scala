package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Degree-oriented triangle counting: correctness against a brute
  * reference on a random graph, agreement with the id-oriented
  * formulation, and the POINT of the operator — bounded wedge fan-out
  * under a planted hub (the power-law shape that makes id orientation
  * quadratic). */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def edgeDf(pairs: Seq[(Long, Long)]) =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")

  /** brute-force reference: all vertex triples over an adjacency set */
  private def bruteTriangles(pairs: Seq[(Long, Long)]): Long = {
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val vs = adj.keys.toSeq.sorted
    vs.combinations(3).count { case Seq(x, y, z) =>
      adj(x)(y) && adj(y)(z) && adj(x)(z)
    }
  }

  test("matches a brute-force count on a deterministic random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300) {
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong; (a, b)
    }.filter(p => p._1 != p._2)
    val got = Triangles.count(edgeDf(pairs)).head().getLong(0)
    assert(got == bruteTriangles(pairs))
  }

  test("planted hub: triangles exact AND wedge rows bounded by low-degree pivots") {
    // hub 0 linked to every leaf 1..200 (degree 200 — "10% of docs"
    // scale shape), ring edges (i, i+1) close one triangle per
    // consecutive leaf pair through the hub.
    val n = 200L
    val spokes = (1L to n).map(i => (0L, i))
    val ring = (1L until n).map(i => (i, i + 1))
    val e = edgeDf(spokes ++ ring)
    val counted = Triangles.count(e).head().getLong(0)
    assert(counted == n - 1) // (0, i, i+1) for i = 1..199

    // fan-out bound: leaves have degree <= 3, so every pivot
    // contributes C(3,2)=3 wedges at most -> <= 3(n+1) total. The hub
    // (highest degree) pivots NOTHING. id orientation would fan
    // C(200,2) = 19900 wedges through vertex 0 alone.
    val w = Triangles.wedges(Triangles.orientByDegree(e)).count()
    assert(w <= 3 * (n + 1), s"wedge fan-out $w exceeds the degree-orientation bound")
    // and the hub never appears as a wedge pivot
    val hubPivots = Triangles.wedges(Triangles.orientByDegree(e))
      .filter(col("u") === 0L).count()
    assert(hubPivots == 0L)
  }

  test("agrees with the id-oriented q107 formulation on the synthetic link graph") {
    val a = graft.SparkEntry.queries("q107_triangles")(spark, sfSmoke).head().getLong(0)
    val b = graft.SparkEntry.queries("q107b_triangles_degree")(spark, sfSmoke).head().getLong(0)
    assert(a == b)
  }

  test("deltaCount multiplicity: triangles with 1, 2 and 3 changed edges count once each") {
    // post adds: (1,3) closing the pre wedge 1-2-3 (ONE added edge in
    // that triangle), (20,22)+(21,22) completing 20-21-22 over the pre
    // edge (20,21) (TWO added edges), and the fully-new 10-11-12
    // (THREE added edges). Naive per-added-edge common-neighbor sums
    // would count them 1+2+3 = 6; the smallest-marked-edge attribution
    // must count 3.
    val pre = Seq((1L, 2L), (2L, 3L), (20L, 21L))
    val post = pre ++ Seq((1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 22L), (21L, 22L))
    val d = Triangles.deltaCount(edgeDf(pre), edgeDf(post)).head()
    assert(d.getAs[Long]("tri_add") == 3L && d.getAs[Long]("tri_del") == 0L)
    // the removal direction is the same attribution on the pre graph
    val d2 = Triangles.deltaCount(edgeDf(post), edgeDf(pre)).head()
    assert(d2.getAs[Long]("tri_add") == 0L && d2.getAs[Long]("tri_del") == 3L)
  }

  test("deltaCount: maintained count equals full recompute under random edge flips") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val preSet = Seq.fill(220) {
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
      }.filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      val flips = Seq.fill(30) {
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
      }.filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      val postSet = (preSet -- flips) ++ (flips -- preSet)
      val d = Triangles.deltaCount(edgeDf(preSet.toSeq), edgeDf(postSet.toSeq)).head()
      val maintained = bruteTriangles(preSet.toSeq) +
        d.getAs[Long]("tri_add") - d.getAs[Long]("tri_del")
      assert(maintained == bruteTriangles(postSet.toSeq), s"trial $trial")
    }
  }
}
