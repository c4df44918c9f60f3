package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.synth.SynthUniverse
import graft.osm.ChangePipeline

/** Scratch leg-profiler for the q70b stored-triples delta (r6). Not
  * part of the driver contract. */
object ProfileQ70b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      graft.Bench.clearState(spark)
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    // warm-up JIT
    graft.SparkEntry.queries("q70b_stored_triples")(spark, sfDir).count()
    for (_ <- 1 to 2) {
      t("stored.count") {
        graft.tables.StoredState.table(spark, sfDir, "base_triples_keyed")(null).count()
      }
      t("kept.count") {
        val stored = graft.tables.StoredState.table(spark, sfDir, "base_triples_keyed")(null)
        val w = ChangePipeline.dedupLatest(SynthUniverse.changesFull(spark, sfDir)).cache()
        val st = ChangePipeline.staleWays(w, SynthUniverse.wayMembers(spark, sfDir))
        val touched = w.filter(col("kind") === "node").select(lit(0).as("okind"), col("id").as("oid"))
          .union(w.filter(col("kind") === "way").select(lit(1), col("id")))
          .union(st.select(lit(1), col("way_id")))
          .union(w.filter(col("kind") === "relation").select(lit(2), col("id")))
          .distinct()
        stored.join(broadcast(touched), Seq("okind", "oid"), "left_anti").count()
      }
      t("winners+stale") {
        val w = ChangePipeline.dedupLatest(SynthUniverse.changesFull(spark, sfDir)).cache()
        ChangePipeline.staleWays(w, SynthUniverse.wayMembers(spark, sfDir)).count()
      }
      t("memberIds") {
        val w = ChangePipeline.dedupLatest(SynthUniverse.changesFull(spark, sfDir)).cache()
        val st = ChangePipeline.staleWays(w, SynthUniverse.wayMembers(spark, sfDir))
        val wayUpsertIds = w.filter(col("kind") === "way" &&
            col("action").isin("create", "modify"))
          .select(col("id").as("way_id"))
          .union(st.select(col("way_id"))).distinct()
        SynthUniverse.wayMembers(spark, sfDir)
          .join(wayUpsertIds, Seq("way_id"), "left_semi")
          .select(col("node_id")).distinct().count()
      }
      t("anti-join literal") {
        val stored = graft.tables.StoredState.table(spark, sfDir, "base_triples_keyed")(null)
        val touched = spark.range(3000).select((col("id") % 3).cast("int").as("okind"),
          (col("id") * 37).as("oid"))
        stored.join(broadcast(touched), Seq("okind", "oid"), "left_anti").count()
      }
      t("scan okind/oid") {
        val stored = graft.tables.StoredState.table(spark, sfDir, "base_triples_keyed")(null)
        stored.select(col("okind"), col("oid")).filter(col("oid") =!= -1L).count()
      }
      t("full q70b") {
        graft.SparkEntry.queries("q70b_stored_triples")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
