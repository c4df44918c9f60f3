package graft.text

import graft.SparkTestBase
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** q74 invariants beyond the oracle: every bin respects the budget
  * (unless a single oversized doc owns it), bin ids are consecutive
  * from 0 per source, and packing is greedy (no doc could have joined
  * the previous bin). */
class SequencePackSpec extends SparkTestBase {
  private val B = 4000L

  test("greedy packing invariants hold on the synthetic corpus") {
    val dir = "/root/testdata/sf0.001"
    val packed = TextQueries.queries("q74_sequence_pack")(spark, dir)
    val chars = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val bins = packed.join(chars, "doc_id")
      .groupBy(col("source"), col("bin"))
      .agg(sum(col("n_chars")).as("total"), count(lit(1)).as("n"))
      .collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      val (total, n) = (r.getLong(2), r.getLong(3))
      assert(total <= B || n == 1L,
        s"bin over budget with $n docs: $r")
    }
    // consecutive bin ids from 0 per source
    val bySource = bins.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    bySource.foreach { case (src, ids) =>
      assert(ids.toSeq === (0L until ids.length).toSeq, s"gap in bins of $src")
    }
    // greedy: bin k+1's first doc would not fit in bin k
    val rows = packed.join(chars, "doc_id")
      .select(col("source"), col("doc_id"), col("bin"), col("n_chars"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { case (_, ds) =>
      val ordered = ds.sortBy(_._2)
      val totals = ordered.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
      ordered.zip(ordered.tail).foreach { case ((_, _, b1, _), (_, _, b2, n2)) =>
        if (b2 == b1 + 1) assert(totals(b1) + n2 > B,
          s"doc of size $n2 should have joined bin $b1 (total ${totals(b1)})")
      }
    }
  }
}
