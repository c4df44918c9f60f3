package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming face of SimHash near-dup detection (batch q14
  * fingerprints + q110's band-bucket pairing): each 15-bit band bucket
  * holds the fingerprints it has seen in `GroupState`; a newly arriving
  * document emits a verified pair (hamming <= 8) against every stored
  * occupant of any of its 4 buckets, then joins the bucket.
  *
  * Emission is AT-LEAST-ONCE per pair (two docs can collide in more
  * than one band) — by design: the downstream pair-table sink is an
  * idempotent key-MERGE exactly like every other sink in this engine,
  * so duplicates collapse on write and the stream never pays a second
  * stateful dedup stage. State per bucket is its occupancy (corpus
  * bucket size, the same quantity the batch band join shuffles);
  * hot-bucket state is the streaming twin of the batch plan's hot-band
  * skew and would take the same TTL / size-cap mitigations.
  *
  * The fingerprint arithmetic replicates TextFunctions.hash60 /
  * DedupQueries.simhashOf EXACTLY (md5 hex → 60-bit int; ±1 per bit
  * over distinct whitespace tokens; bit set iff sum > 0), so streamed
  * pairs equal the batch pairs bit-for-bit (NearDupStreamSpec).
  */
object NearDupStream {

  case class Doc(doc_id: Long, text: String)
  case class BandFp(band: Int, bkey: Long, doc_id: Long, simhash: Long)
  case class Pair(id_a: Long, id_b: Long, hamming: Long)

  val MaxHamming = 8L

  /** Scala replica of TextFunctions.hash60: first 15 hex chars of md5
    * as a 60-bit non-negative long. */
  def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString // 16 hex chars >= 15 needed
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Scala replica of DedupQueries.simhashOf on one document
    * (split with limit -1 = Spark's `split` empty-token semantics). */
  def simhash60(text: String): Long = {
    val toks = text.toLowerCase.split("\\s+", -1).distinct
    val sums = new Array[Long](60)
    toks.foreach { t =>
      val h = hash60(t)
      var b = 0
      while (b < 60) {
        sums(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    (0 until 60).foldLeft(0L)((acc, b) => if (sums(b) > 0) acc | (1L << b) else acc)
  }

  def bandsOf(docId: Long, fp: Long): Seq[BandFp] =
    (0 until 4).map(b => BandFp(b, (fp >> (15 * b)) & 32767L, docId, fp))

  /** Stateful band-bucket pairing over a document stream. */
  def pairs(docs: Dataset[Doc]): Dataset[Pair] = {
    import docs.sparkSession.implicits._
    docs.flatMap(d => bandsOf(d.doc_id, simhash60(d.text)))
      .groupByKey(bf => (bf.band, bf.bkey))
      .flatMapGroupsWithState[Seq[(Long, Long)], Pair](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), incoming: Iterator[BandFp],
            state: GroupState[Seq[(Long, Long)]]) =>
          var stored = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[Pair]
          // deterministic order inside a trigger
          incoming.toSeq.sortBy(_.doc_id).foreach { bf =>
            if (!stored.exists(_._1 == bf.doc_id)) {
              stored.foreach { case (id, fp) =>
                val ham = java.lang.Long.bitCount(fp ^ bf.simhash).toLong
                if (ham <= MaxHamming)
                  out += Pair(math.min(id, bf.doc_id), math.max(id, bf.doc_id), ham)
              }
              stored = stored :+ (bf.doc_id, bf.simhash)
            }
          }
          state.update(stored)
          out.result().iterator
      }
  }
}
