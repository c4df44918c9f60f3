package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.osm.ChangePipeline
import graft.queries.Tables
import graft.spatial.SpatialJoin
import graft.synth.SynthUniverse

/** Benchmark main (driver contract): one JSON line with per-query
  * seconds plus the headline end-to-end docs/sec of the full
  * spatial-join + OsmChange-delta pipeline (BASELINE.md protocol).
  *
  * Run at two parallelism levels for the scaling-efficiency evidence:
  * {{{
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8  sbt "runMain graft.Bench"
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt "runMain graft.Bench"
  * }}}
  */
object Bench {

  /** Headline per-operator queries (quadratic all-pairs baselines like
    * q12 are correctness-only and excluded from timing). */
  val headline: Seq[String] = Seq(
    "q01_pricing_agg", "q02_revenue_per_nation", "q03_dedup_latest",
    "q07_ordered_group_concat", "q09_topk_per_group",
    "q11_exact_dedup", "q13_minhash_lsh_pairs", "q14_simhash",
    "q15_langid", "q17_token_count", "q18_fingerprint",
    "q19_cosine_topk", "q29_extract_entities", "q30_pip_join",
    "q30b_pip_join_salted", "q31_knn", "q32_raster_tiles",
    "q34_changes_dedup", "q38_delete_set", "q39_node_triples",
    "q40_nodes_after_merge")

  /** Bench-input scale-up factor: documents replicate ×F with distinct
    * ids (FIXTURES.md: "scaled up by the bench harness") so the e2e
    * job is compute-bound rather than fixed-overhead-bound. */
  val E2eFactor: Int = sys.env.getOrElse("SPARK_GRAFT_E2E_FACTOR", "20").toInt

  /** The full north-rule pipeline as ONE job: extract geo-entities →
    * partitioned+salted PIP join → raster tiles, PLUS change-batch W1
    * dedup → MERGE of the node layer. Returns materialized row count. */
  def e2ePipeline(s: SparkSession, dir: String): Long = {
    val pts0 = SynthUniverse.points(s, dir)
    val pts = pts0
      .crossJoin(s.range(E2eFactor).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        col("entity"),
        // spread replicas geographically: each replica shard covers a
        // different cell neighborhood, so join keys stay balanced
        (col("lon") + (col("rep") % 16 - 8) * 2.37).as("lon"),
        (col("lat") + (col("rep") % 8 - 4) * 1.93).as("lat"))
      .repartition(s.sparkContext.defaultParallelism)
    val polys = SpatialJoin.polygons(
      SynthUniverse.wayMembers(s, dir), SynthUniverse.nodes(s, dir))
    val pip = SpatialJoin.pipJoin(pts, polys, res = 6,
      broadcastPolys = false, salt = 16)
    val tiles = pip
      .withColumn("tile", graft.geo.GeoFunctions.cellAt(col("lon"), col("lat"), 5))
      .groupBy(col("tile")).agg(count(lit(1)).as("n"))
    val winners = ChangePipeline.dedupLatest(SynthUniverse.changes(s, dir))
    val merged = ChangePipeline.applyNodeOps(SynthUniverse.nodes(s, dir), winners)
    tiles.count() + merged.count()
  }

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JIT + codegen + file-listing caches (not timed)
    SparkEntry.queries("q01_pricing_agg")(spark, sfDir).count()
    e2ePipeline(spark, sfDir)

    val results = headline.map { name =>
      val (sec, _) = time(SparkEntry.queries(name)(spark, sfDir).count())
      name -> sec
    }
    val docs = Tables.documents(spark, sfDir).count() * E2eFactor
    // best-of-3: JIT/GC variance dominates single runs at this scale
    val e2eSec = (1 to 3).map(_ => time(e2ePipeline(spark, sfDir))._1).min
    val docsPerSec = docs / e2eSec

    val qs = (results :+ ("e2e_pipeline" -> e2eSec))
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + e2eSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"docs":$docs,"e2e_docs_per_sec":$docsPerSec}""")
    spark.stop()
  }
}
