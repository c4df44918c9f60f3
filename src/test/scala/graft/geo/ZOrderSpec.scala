package graft.geo

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Z-order clustering: encoding parity (scalar == column), z-interval
  * decomposition soundness, and the property that justifies the
  * operator at 100 TB — the pushed-down predicates actually PRUNE a
  * clustered layout (and provably do NOT prune an unclustered one),
  * even for the hard case of a box straddling the space's midlines. */
class ZOrderSpec extends SparkTestBase {

  private val bits = 16

  private def uniformPts(n: Int) = spark.range(n).select(
    col("id"),
    (pmod(col("id") * 7919, lit(36000)) / 100.0 - 180.0).as("lon"),
    (pmod(col("id") * 104729, lit(18000)) / 100.0 - 90.0).as("lat"))

  // straddles (0, 0) — the single corner-envelope interval would
  // degenerate to ~3/4 of the z space here; the decomposition must not
  private val box = (-20.0, 16.0, -10.0, 12.5)

  test("scalar zOf == column zValue across random + corner coordinates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sample = Seq.fill(300)(
      (rnd.nextDouble() * 360.0 - 180.0, rnd.nextDouble() * 180.0 - 90.0)) ++
      Seq((-180.0, -90.0), (180.0, 90.0), (0.0, 0.0), (179.99999, 89.99999))
    val rows = sample.toDF("lon", "lat")
      .withColumn("z", ZOrder.zValue(col("lon"), col("lat"), bits))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrder.zOf(r.getDouble(0), r.getDouble(1), bits),
        s"(${r.getDouble(0)}, ${r.getDouble(1)})")
    }
  }

  test("zIntervals: bounded, ordered, disjoint, and sound for every box point") {
    val rnd = new scala.util.Random(13)
    (1 to 500).foreach { _ =>
      val a = rnd.nextDouble() * 360.0 - 180.0
      val b = rnd.nextDouble() * 360.0 - 180.0
      val c = rnd.nextDouble() * 180.0 - 90.0
      val d = rnd.nextDouble() * 180.0 - 90.0
      val (x0, x1) = (math.min(a, b), math.max(a, b))
      val (y0, y1) = (math.min(c, d), math.max(c, d))
      val ivs = ZOrder.zIntervals(x0, x1, y0, y1, bits)
      assert(ivs.nonEmpty && ivs.length <= 16)
      ivs.sliding(2).foreach {
        case Seq(p, q) => assert(p._2 < q._1, s"overlap/unordered: $p $q")
        case _ =>
      }
      (1 to 20).foreach { _ =>
        val px = x0 + rnd.nextDouble() * (x1 - x0)
        val py = y0 + rnd.nextDouble() * (y1 - y0)
        val z = ZOrder.zOf(px, py, bits)
        assert(ivs.exists(iv => z >= iv._1 && z <= iv._2),
          s"box=($x0,$y0)-($x1,$y1) p=($px,$py) z=$z not covered by $ivs")
      }
    }
  }

  test("decomposition beats the corner envelope on a midline-straddling box") {
    val ivs = ZOrder.zIntervals(box._1, box._2, box._3, box._4, bits)
    val covered = ivs.map(iv => iv._2 - iv._1 + 1).sum.toDouble
    val envelope = ZOrder.zOf(box._2, box._4, bits) - ZOrder.zOf(box._1, box._3, bits) + 1
    val total = math.pow(2.0, 2.0 * bits)
    assert(envelope.toDouble / total > 0.5, "test premise: envelope degenerates")
    assert(covered / total < 0.10,
      s"decomposition should cover <10% of z space, covered ${covered / total}")
  }

  /** Runs the read, returns (ids, files enumerated by the scan after
    * partition pruning). */
  private def runAndCountFiles(read: org.apache.spark.sql.DataFrame): (Array[Long], Long) = {
    val rows = read.collect().map(_.getAs[Long]("id")).sorted
    val scans = read.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, read.queryExecution.executedPlan.toString)
    (rows, scans.head.metrics("numFiles").value)
  }

  private def countParquetFiles(root: String): Long = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .count(p => p.getFileName.toString.endsWith(".parquet"))
  }

  test("clustered layout: bbox read prunes zbucket directories and stays exact") {
    import spark.implicits._
    // 40k uniform points; the straddling box covers ~2.5% of the extent
    val pts = uniformPts(40000)
    val root = "target/test_zcluster"
    ZOrder.cluster(pts, "lon", "lat", bits, root, numFiles = 32)
    val total = countParquetFiles(root)

    val read = ZOrder.bboxRead(spark, root, "lon", "lat", bits,
      box._1, box._2, box._3, box._4)
    val (got, filesRead) = runAndCountFiles(read)
    val want = pts.filter(col("lon") >= box._1 && col("lon") <= box._2 &&
        col("lat") >= box._3 && col("lat") <= box._4)
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(filesRead > 0 && filesRead * 2 <= total,
      s"expected <= half of $total files after zbucket pruning, read $filesRead")
  }

  test("row-ordered layout reads everything — clustering is what buys the skip") {
    val root = "target/test_zcluster_rowordered"
    // same columns, same file count, but id-ordered (spatially random)
    // and unpartitioned: no directory to prune, every file overlaps z
    uniformPts(40000)
      .withColumn("zval", ZOrder.zValue(col("lon"), col("lat"), bits))
      .withColumn("zbucket", shiftright(col("zval"), 2 * bits - ZOrder.BucketBits))
      .repartitionByRange(32, col("id"))
      .write.mode("overwrite").parquet(root)
    val read = ZOrder.bboxRead(spark, root, "lon", "lat", bits,
      box._1, box._2, box._3, box._4)
    val (_, filesRead) = runAndCountFiles(read)
    assert(filesRead == 32, s"unclustered layout should read all 32 files, read $filesRead")
  }
}
