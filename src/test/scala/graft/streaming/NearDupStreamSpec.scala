package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.SparkEntry

/** Streaming SimHash near-dup pairs must equal the batch band-bucket
  * pairing exactly — including after duplicate re-delivery — and the
  * Scala fingerprint replica must agree bit-for-bit with the
  * oracle-proven q14 Spark plan. */
class NearDupStreamSpec extends SparkTestBase {

  test("streamed band-bucket pairs equal batch simhash pairing (RocksDB state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // full parity on the production state backend, not just the
    // in-memory default
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val docs = graft.queries.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text").as[NearDupStream.Doc]
      .collect().sortBy(_.doc_id)
    assert(docs.length >= 40)

    // batch fingerprints from the oracle-proven q14 plan; the Scala
    // replica must reproduce every one bit-for-bit
    val fp = SparkEntry.queries("q14_simhash")(spark, sfSmoke)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { d =>
      assert(NearDupStream.simhash60(d.text) == fp(d.doc_id),
        s"fingerprint replica diverges for doc ${d.doc_id}")
    }

    // expected = batch semantics: band collision prefilter + hamming
    val ids = fp.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      fi = fp(i); fj = fp(j)
      if (0 until 4).exists(b => ((fi >> (15 * b)) & 32767L) == ((fj >> (15 * b)) & 32767L))
      ham = java.lang.Long.bitCount(fi ^ fj).toLong
      if ham <= NearDupStream.MaxHamming
    } yield (i, j, ham)).toSet
    assert(expected.nonEmpty, "degenerate fixture: no near-dup pairs")

    val input = MemoryStream[NearDupStream.Doc]
    val ckpt = Files.createTempDirectory("graft-neardup-ckpt").toString
    val q = NearDupStream.pairs(input.toDS())
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("neardup_pairs")
      .start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // duplicate re-delivery: already-seen docs must emit nothing new
      input.addData(docs.take(10).toSeq)
      q.processAllAvailable()

      val got = spark.table("neardup_pairs").as[NearDupStream.Pair]
        .collect().map(p => (p.id_a, p.id_b, p.hamming)).toSet
      assert(got == expected,
        s"stream ${got.size} pairs vs batch ${expected.size}: " +
          s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    graft.Bench.clearState(spark)
  }
}
