package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.osm.ChangeOp

/** Structured-Streaming face of the replication loop: the W1
  * dedup-to-latest semantics (comparator
  * /root/reference/src/osm/OsmUpdater.cpp:117-134 — newest version
  * wins, delete-status then newest timestamp break ties) kept as
  * PER-KEY STATE over an unbounded change stream instead of a bounded
  * catch-up window.
  *
  * Batch mode replays the whole window through one window function
  * ([[graft.osm.ChangePipeline.dedupLatest]]); here each (kind, id)
  * group holds its current winner in `GroupState` and emits an update
  * row only when a strictly newer op arrives — so the downstream MERGE
  * sees exactly the reference's "only the final version of each object
  * is applied" contract (ST5) per trigger, and state size is bounded
  * by the number of live objects, not the stream length.
  *
  * At scale: state is hash-partitioned by (kind, id) across executors
  * (the same shuffle key the batch window uses); the RocksDB state
  * store is a config knob and watermark-based TTL eviction is the
  * `ttlMs` parameter of [[latestPerKey]] (bound proven by
  * ChangeStreamSpec's state-bound test).
  */
object ChangeStream {

  case class ObjKey(kind: String, id: Long)

  /** The reference comparator strengthened to a TOTAL order: true if
    * `a` should replace `b` (a is strictly newer). Follows
    * object_order_type_id_reverse_version_delete
    * (/root/reference/src/osm/OsmUpdater.cpp:117-134): version DESC,
    * then the DELETED op wins a same-version tie, then ts DESC — with
    * two deliberate deviations for determinism: an invalid/missing ts
    * orders NULLS LAST (the reference treats a same-version pair with
    * either ts invalid as ts-equal), and seq DESC breaks remaining
    * ties (the reference has no seq tie-break). Identical to the batch
    * window in [[graft.osm.ChangePipeline.dedupLatest]], so streamed
    * and batch winners always agree. */
  def newerThan(a: ChangeOp, b: ChangeOp): Boolean =
    if (a.version != b.version) a.version > b.version
    else {
      val ad = a.action == "delete"
      val bd = b.action == "delete"
      if (ad != bd) ad
      else if (a.ts != null && b.ts == null) true  // ts DESC NULLS LAST
      else if (a.ts == null && b.ts != null) false
      else if (a.ts != null && !a.ts.equals(b.ts)) a.ts.after(b.ts)
      else a.seq > b.seq
    }

  /** Stateful dedup-to-latest. Works on both streaming and batch
    * Datasets (batch = one trigger over the whole input).
    *
    * @param ttlMs event-time state TTL: with Some(t), a watermark of
    *        `t` ms rides on `ts` and a key's winner state EVICTS once
    *        the watermark passes its event time + t — so state is
    *        bounded by the keys active inside the TTL horizon, not all
    *        keys ever seen. Eviction is safe exactly when the source
    *        honors the replication contract (seq-ordered files, W5):
    *        an op arriving later than the TTL horizon could otherwise
    *        re-create state and regress the table to an older version.
    *        None (default) keeps state for every live object. */
  def latestPerKey(ops: Dataset[ChangeOp],
      ttlMs: Option[Long] = None): Dataset[ChangeOp] = {
    import ops.sparkSession.implicits._
    val useTtl = ttlMs.isDefined && ops.isStreaming
    val src = if (useTtl) ops.withWatermark("ts", s"${ttlMs.get} milliseconds") else ops
    val timeoutConf =
      if (useTtl) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    src
      .groupByKey(o => ObjKey(o.kind, o.id))
      .flatMapGroupsWithState[ChangeOp, ChangeOp](
        OutputMode.Update, timeoutConf) {
        (_: ObjKey, incoming: Iterator[ChangeOp], state: GroupState[ChangeOp]) =>
          if (useTtl && state.hasTimedOut) {
            state.remove() // watermark passed the key's TTL horizon
            Iterator.empty
          } else {
            // every invocation clears a previously-set timeout — re-arm
            // it whenever state survives this call. A null event time
            // anchors the horizon at the CURRENT watermark (treating it
            // as epoch 0 would clamp to watermark+1 and evict the key
            // on the very next watermark advance, silently voiding the
            // configured TTL).
            def arm(w: ChangeOp): Unit = if (useTtl) {
              val anchor =
                if (w.ts != null) w.ts.getTime else state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(
                math.max(anchor + ttlMs.get, state.getCurrentWatermarkMs() + 1))
            }
            val batchWinner = incoming.reduceOption((a, b) => if (newerThan(b, a)) b else a)
            batchWinner match {
              case Some(w) if !state.exists || newerThan(w, state.get) =>
                state.update(w)
                arm(w)
                Iterator.single(w)
              case _ =>
                if (state.exists) arm(state.get)
                Iterator.empty
            }
          }
      }
  }

  /** File-source replication stream: watch a directory of `.osc[.gz|.bz2]`
    * batches (the reference's lexicographically-ordered change dir,
    * README.md:22-26) and emit winner updates per trigger. The caller
    * attaches the sink (`foreachBatch` → MERGE INTO snapshot tables). */
  def fromChangeDir(spark: SparkSession, dir: String): Dataset[ChangeOp] = {
    import spark.implicits._
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema) // streaming sources require explicit schema
      .option("pathGlobFilter", "*.osc*")
      .option("maxFilesPerTrigger", 1) // W5 ordering: one seq per trigger
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
    latestPerKey(files.flatMap { case (p, b) => graft.osm.OscReader.parseFile(p, b) })
  }
}
