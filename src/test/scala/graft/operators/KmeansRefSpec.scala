package graft.operators

import graft.SparkTestBase
import graft.queries.SimilarityQueries

/** q76 vs an independent plain-Scala Lloyd implementation (same
  * integer-grid contract) — a second oracle beside the DuckDB SQL,
  * exercising quantization rounding, argmin tie-breaks, and the
  * truncated-mean update without any SQL in the loop. */
class KmeansRefSpec extends SparkTestBase {
  import spark.implicits._

  test("2-iteration integer-grid Lloyd matches a sequential reference") {
    val dir = "/root/testdata/sf0.001"
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        id -> v.map(x => math.round((x.toDouble + 1.0) * 1000000))
      }.sortBy(_._1)

    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, Long] =
      vecs.map { case (id, v) =>
        id -> cents.map { case (cid, c) =>
          var d = 0L; var i = 0
          while (i < v.length) { val t = v(i) - c(i); d += t * t; i += 1 }
          (d, cid)
        }.min._2
      }.toMap

    val byId = vecs.toMap
    val c0 = vecs.filter(_._1 < 4).map { case (id, v) => (id, v) }.toSeq
    val a1 = assign(c0)
    val c1 = a1.toSeq.groupBy(_._2).toSeq.map { case (cid, members) =>
      val vs = members.map(m => byId(m._1))
      cid -> Array.tabulate(vs.head.length)(d => vs.map(_(d)).sum / vs.length)
    }
    val want = assign(c1)

    val got = SimilarityQueries.queries("q76_kmeans_assign")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got.values.toSet.size > 1, "degenerate clustering")
  }
}
