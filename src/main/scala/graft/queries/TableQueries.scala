package graft.queries

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.SnapshotTable

/** Corpus-table maintenance over the snapshot-table layer — the
  * merge-on-read path exercised end-to-end on the `documents` corpus:
  * create → delta commits (upserts + tombstones) → compaction →
  * resolved read, all against real table storage. The oracle recomputes
  * the final state closed-form, proving the chain's
  * latest-commit-wins resolution AND the compaction rewrite exact.
  *
  * Reference analogue: the database state after a sequence of change
  * batches (/root/reference/src/osm/OsmChangeHandler.cpp:442-575) —
  * here over an LLM-corpus table instead of the triple store, the shape
  * a 100 TB training-data pipeline maintains under daily refreshes
  * (per-batch write O(batch), never O(corpus)).
  */
object TableQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_mor_corpus" -> ((s, dir) => {
      val root = "target/q73_store_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      SnapshotTable.deleteRecursively(Paths.get(root))
      // cached: create + each batch's ups/dels all derive from it —
      // without the cache the documents scan re-runs 7x and the benched
      // figure prices input rescans instead of the MOR write path
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), lit(0L).as("rev"), col("n_chars")).cache()
      try {
        val t = SnapshotTable.create(s, root, base,
          keyCols = Seq("doc_id"), numBuckets = 16)
        (1 to 3).foreach { b =>
          val ups = base.filter(col("doc_id") % 5 === b)
            .select(col("doc_id"), lit(b.toLong).as("rev"),
              (col("n_chars") + b).as("n_chars"), lit(false).as("del"))
          val dels = base.filter(col("doc_id") % 17 === b && col("doc_id") % 5 =!= b)
            .select(col("doc_id"), lit(0L).as("rev"),
              lit(null).cast("long").as("n_chars"), lit(true).as("del"))
          // compactEvery=2: batches 1-2 are O(batch) delta commits; batch 3
          // folds the chain into a full bucketed layout (compaction), so
          // one query covers both write paths + the resolved read
          t.mergeIntoDelta(ups.unionByName(dels), Seq("doc_id"),
            deleteMarker = Some("del"), compactEvery = 2)
        }
        t.read().select(col("doc_id"), col("rev"), col("n_chars"))
      } finally base.unpersist()
    }),
    "q79_snapshot_diff" -> ((s, dir) => {
      // CDC read: one batch of inserts/updates/tombstones lands as an
      // O(batch) delta commit, then `changesBetween` diffs the create
      // snapshot against the delta head (resolving the chain) into
      // typed insert/update/delete rows — the feed a downstream
      // incremental consumer (index, embedding refresh) subscribes to.
      val root = "target/q79_store_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      SnapshotTable.deleteRecursively(Paths.get(root))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), lit(0L).as("rev"), col("n_chars")).cache()
      try {
        val t = SnapshotTable.create(s, root, base,
          keyCols = Seq("doc_id"), numBuckets = 16)
        val ins = base.filter(col("doc_id") % 23 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), lit(1L).as("rev"),
            (col("n_chars") + 7).as("n_chars"), lit(false).as("del"))
        val upd = base.filter(col("doc_id") % 5 === 1)
          .select(col("doc_id"), lit(1L).as("rev"),
            (col("n_chars") + 1).as("n_chars"), lit(false).as("del"))
        val dels = base.filter(col("doc_id") % 17 === 1 && col("doc_id") % 5 =!= 1)
          .select(col("doc_id"), lit(0L).as("rev"),
            lit(null).cast("long").as("n_chars"), lit(true).as("del"))
        t.mergeIntoDelta(ins.unionByName(upd).unionByName(dels),
          Seq("doc_id"), deleteMarker = Some("del"))
        t.changesBetween(1L, t.currentSnapshot.get, Seq("doc_id"))
          .select(col("doc_id"), col("change_type"),
            col("payload.rev").as("rev"), col("payload.n_chars").as("n_chars"))
      } finally base.unpersist()
    }),
    "q272_time_travel" -> ((s, dir) => {
      // TIME-TRAVEL read — the history face of the snapshot store
      // (Iceberg's `VERSION AS OF`): after q73's full three-batch MOR
      // run (including the compaction that folds the delta chain at
      // compactEvery=2), `readAt(2)` must still reproduce the state
      // EXACTLY as of batch 1 — older snapshots stay resolvable
      // because commits only add directories and the GC keeps every
      // snapshot the manifest chain references. The oracle is the
      // batch-1-only closed form; the head having moved three commits
      // and one compaction past it is the point of the test.
      val root = "target/q272_store_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      SnapshotTable.deleteRecursively(Paths.get(root))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), lit(0L).as("rev"), col("n_chars")).cache()
      try {
        val t = SnapshotTable.create(s, root, base,
          keyCols = Seq("doc_id"), numBuckets = 16)
        (1 to 3).foreach { b =>
          val ups = base.filter(col("doc_id") % 5 === b)
            .select(col("doc_id"), lit(b.toLong).as("rev"),
              (col("n_chars") + b).as("n_chars"), lit(false).as("del"))
          val dels = base.filter(col("doc_id") % 17 === b && col("doc_id") % 5 =!= b)
            .select(col("doc_id"), lit(0L).as("rev"),
              lit(null).cast("long").as("n_chars"), lit(true).as("del"))
          t.mergeIntoDelta(ups.unionByName(dels), Seq("doc_id"),
            deleteMarker = Some("del"), compactEvery = 2)
        }
        t.readAt(2L).select(col("doc_id"), col("rev"), col("n_chars"))
      } finally base.unpersist()
    }),
  )

  val oracles: Map[String, String] = Map(
    // closed form of the three batches: u = the one upsert batch that
    // touches the doc (doc_id%5 ∈ 1..3), d = the one tombstone batch
    // (doc_id%17 ∈ 1..3, never the same batch as its upsert); the doc
    // survives iff it was never tombstoned or a LATER batch upserted it
    // (latest-commit-wins), with the upsert's payload
    "q73_mor_corpus" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 5 BETWEEN 1 AND 3 THEN doc_id % 5 ELSE 0 END AS u,
        |    CASE WHEN doc_id % 17 BETWEEN 1 AND 3 AND doc_id % 17 <> doc_id % 5
        |         THEN doc_id % 17 ELSE 0 END AS d
        |  FROM documents)
        |SELECT doc_id, CAST(u AS BIGINT) AS rev,
        |  CAST(n_chars + u AS BIGINT) AS n_chars
        |FROM f WHERE d = 0 OR u > d""".stripMargin,
    // closed form of the one batch: every %23 doc spawns an insert
    // under a shifted id, every %5=1 doc updates (rev flips 0->1, so
    // the payload always differs), every %17=1 non-update doc deletes
    "q79_snapshot_diff" ->
      """SELECT doc_id + 1000000 AS doc_id, 'insert' AS change_type,
        |  CAST(1 AS BIGINT) AS rev, CAST(n_chars + 7 AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id % 23 = 0
        |UNION ALL
        |SELECT doc_id, 'update', CAST(1 AS BIGINT), CAST(n_chars + 1 AS BIGINT)
        |FROM documents WHERE doc_id % 5 = 1
        |UNION ALL
        |SELECT doc_id, 'delete', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |FROM documents WHERE doc_id % 17 = 1 AND doc_id % 5 <> 1""".stripMargin,
    // state exactly as of batch 1: the %5=1 upserts applied, the %17=1
    // tombstones gone, everything else at rev 0
    "q272_time_travel" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END AS BIGINT) AS rev,
        |  CAST(CASE WHEN doc_id % 5 = 1 THEN n_chars + 1 ELSE n_chars END
        |    AS BIGINT) AS n_chars
        |FROM documents
        |WHERE NOT (doc_id % 17 = 1 AND doc_id % 5 <> 1)""".stripMargin,
  )
}
