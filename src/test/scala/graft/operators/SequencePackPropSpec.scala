package graft.operators

import graft.{PropHelpers, SparkTestBase}
import org.scalacheck.Gen

/** SequencePack vs a plain-Scala reference fold on random inputs —
  * covers what the corpus cannot: oversized rows (cost > budget), a
  * NULL group, single-row groups, and costs that land exactly on the
  * budget boundary. */
class SequencePackPropSpec extends SparkTestBase with PropHelpers {
  import spark.implicits._

  private def reference(rows: Seq[(String, Long, Long)], budget: Long): Map[Long, Long] =
    rows.groupBy(_._1).flatMap { case (_, g) =>
      var bin = 0L; var acc = 0L; var first = true
      g.sortBy(_._2).map { case (_, id, n) =>
        if (first) { first = false; acc = n }
        else if (acc + n > budget) { bin += 1; acc = n }
        else acc += n
        id -> bin
      }
    }

  test("packing equals the reference fold on random groups/costs") {
    val genRows = for {
      k <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(k, for {
        g <- Gen.oneOf("a", "bb", "ccc", null: String)
        // boundary-heavy costs: tiny, near-budget, exactly budget, oversized
        n <- Gen.oneOf(Gen.chooseNum(1L, 120L), Gen.oneOf(99L, 100L, 101L, 250L))
      } yield (g, n))
    } yield rows.zipWithIndex.map { case ((g, n), i) => (g, i.toLong, n) }

    var runs = 0
    forAll(genRows, Gen.const(())) { (rows, _) =>
      runs += 1
      if (runs <= 25) { // each case is a Spark job; bound the wall cost
        val budget = 100L
        val got = SequencePack.pack(
            rows.toDF("source", "doc_id", "n_chars"),
            "source", "doc_id", "n_chars", budget)
          .select("doc_id", "bin").as[(Long, Long)].collect().toMap
        assert(got === reference(rows, budget), s"rows=$rows")
      }
    }
  }
}
