package graft

import org.apache.spark.sql.functions._
import graft.queries.{FunctionQueries, OsmQueries, SimilarityQueries}

/** Specs for the widened operator set: IVF ANN (q21), embedding
  * near-dup (q22), relation reconstruction J9 (q23), referenced-node
  * expansion J5 (q24), P5 link-propagating insert filter (q26), and the
  * scalar-function family (q28/q41). The DuckDB oracle gate checks
  * row-level parity; these assert the semantic properties that a
  * value-hash can't express.
  */
class WideOpsSpec extends SparkTestBase {

  test("q21 IVF(nprobe=1) neighbors are a subset of the same-cell universe and ranked by cosine") {
    val df = SimilarityQueries.queries("q21_ivf_ann")(spark, sfSmoke).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    // per query: ranks are 1..k dense and cosine non-increasing
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to byRank.length))
      val cos = byRank.map(_.getAs[Long]("cos_ppb")).toSeq
      assert(cos == cos.sorted.reverse, s"cosine not non-increasing: $cos")
    }
    df.unpersist()
  }

  test("q22 finds exactly the planted near-duplicate pairs") {
    val pairs = SimilarityQueries.queries("q22_embedding_neardup")(spark, sfSmoke)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = queries.Tables.embeddings(spark, sfSmoke)
      .filter(col("vec_id") % 20 === 0).select(col("vec_id"))
      .collect().map(_.getLong(0))
      .map(id => (id, id + 1000000L)).toSet
    assert(pairs == planted,
      s"missing=${planted -- pairs} spurious=${pairs -- planted}")
  }

  test("q23 relation members are reconstructed in pos order") {
    val rows = OsmQueries.queries("q23_rel_reconstruct")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val roles = r.getAs[String]("members").split(";").map(_.split("/")(1))
      // synth relations: pos 0 is the outer ring, the rest inner
      assert(roles.head == "outer" && roles.tail.forall(_ == "inner"),
        s"rel ${r.getAs[Long]("rel_id")} out of order: ${roles.mkString(",")}")
    }
  }

  test("q24 referenced nodes exclude every node id present in the change file") {
    val refd = OsmQueries.queries("q24_referenced_nodes")(spark, sfSmoke)
    val inChange = graft.osm.ChangePipeline
      .dedupLatest(graft.synth.SynthUniverse.changes(spark, sfSmoke))
      .filter(col("kind") === "node").select(col("id"))
    assert(refd.join(inChange, col("node_id") === col("id"), "inner").count() == 0)
  }

  test("q26 keeps the linked geometry triple for every kept hasGeometry parent") {
    val t = OsmQueries.queries("q26_insert_triples")(spark, sfSmoke).cache()
    val parents = t.filter(col("p") === "geo:hasGeometry").select(col("o"))
    val geomSubjects = t.filter(col("p") === "geo:asWKT").select(col("s"))
    assert(parents.exceptAll(geomSubjects).count() == 0,
      "a hasGeometry object has no followed geometry triple")
    assert(t.count() > 0)
    t.unpersist()
  }

  test("q28 scalar round-trips: id extraction inverts uri build; path is 3/3/3 zero-padded") {
    val rows = FunctionQueries.queries("q28_uri_scalars")(spark, sfSmoke).limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("path").matches("\\d{3}/\\d{3}/\\d{3}"))
      assert(r.getAs[String]("url").endsWith(".osc.gz"))
      assert(!r.getAs[String]("xml_enc").exists(c => c == '<' || c == '>' || c == '"'))
    }
  }

  test("q41 histogram bins sum to payload length for pure-bin inputs") {
    import spark.implicits._
    val media = Seq(
      graft.multimodal.MediaRow("u1", "image/png", "0123 !&/pqr~".getBytes("UTF-8")),
      graft.multimodal.MediaRow("u2", "audio/wav", Array[Byte]()))
      .toDS()
    val feats = graft.multimodal.BinaryFeatures.extract(media).collect()
    val f1 = feats.find(_.url == "u1").get
    assert(f1.nBytes == 12 && f1.histogram.sum == 12)
    assert(f1.histogram(2) == 4, "bin2 counts space,!,&,/")  // ' ', '!', '&', '/'
    assert(f1.histogram(7) == 4, "bin7 counts p,q,r,~ (0x70..0x7e)")
    val f2 = feats.find(_.url == "u2").get
    assert(f2.nBytes == 0 && f2.width == 1 && f2.height == 1)
  }
}
