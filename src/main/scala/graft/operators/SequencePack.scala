package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy sequence packing (pretraining batch assembly): rows of a
  * group, in `order` order, fill bins of capacity `budget` by `cost`; a
  * row that would overflow starts the next bin, and an oversized row
  * (cost > budget) gets a bin of its own. Output = input columns +
  * `bin` (0-based, consecutive per group).
  *
  * The per-group fold is inherently sequential — no window expresses
  * the running reset — so this is the legitimate mapPartitions case:
  * ONE shuffle co-locates each group, a sort within partitions orders
  * it, and the pass streams with O(1) state. At 100 TB the groups
  * distribute; a single pathological group serializes by the op's own
  * semantics (packing order is the contract).
  */
object SequencePack {
  def pack(df: DataFrame, group: String, order: String, cost: String,
      budget: Long): DataFrame = {
    val out = StructType(df.schema.fields :+ StructField("bin", LongType, nullable = false))
    val gIdx = df.schema.fieldIndex(group)
    val cIdx = df.schema.fieldIndex(cost)
    df.repartition(col(group))
      .sortWithinPartitions(col(group), col(order))
      .mapPartitions { it =>
        // explicit first-row flag, not a null sentinel: a NULL group
        // must still get its reset
        var first = true; var cur: Any = null; var bin = 0L; var acc = 0L
        it.map { r =>
          val g = r.get(gIdx); val n = r.getLong(cIdx)
          if (first || g != cur) { first = false; cur = g; bin = 0L; acc = n }
          else if (acc + n > budget) { bin += 1; acc = n }
          else acc += n
          Row.fromSeq(r.toSeq :+ bin)
        }
      }(Encoders.row(out))
  }
}
