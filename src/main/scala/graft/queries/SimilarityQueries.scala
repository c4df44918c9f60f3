package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - q19: brute-force cosine top-k — the exactness baseline. The probe
  *    (query) side is broadcast; the big side streams through one scan,
  *    so the plan is shuffle-free up to the final per-query top-k
  *    (partial top-k per partition via window over a tiny key space).
  *  - q20: sign-LSH bucketed variant — the 100 TB path: each vector
  *    hashes to a 6-bit hyperplane-sign bucket (2^6 buckets; widen with data volume); candidate generation
  *    is an equi-join on the bucket id instead of a cross product.
  *
  * All vector math is forced to double precision BEFORE any arithmetic
  * and folded sequentially (functions.aggregate), giving bit-identical
  * results vs the DuckDB oracle's explicit sequential list_reduce.
  */
object SimilarityQueries {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Sign bucket over the first 6 dims (deterministic hyperplanes =
    * coordinate axes; swap in seeded pseudo-random planes at scale). */
  private def signBucket(v: Column): Column =
    (0 until 6).map(i =>
      when(element_at(v, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  private def embAsDouble(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v"))

  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos") * 1e9, 0).cast("long").as("cos_ppb"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_cosine_topk" -> ((s, dir) => {
      val e = embAsDouble(s, dir)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val pairs = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv")))).as("cos"))
      topK(pairs, 5)
    }),
    "q20_ann_lsh_bucketed" -> ((s, dir) => {
      val e = embAsDouble(s, dir).withColumn("bucket", signBucket(col("v")))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
      val pairs = e.join(broadcast(q), "bucket")
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv")))).as("cos"))
      topK(pairs, 3)
    }),
  )

  private val dotSql =
    "list_reduce(list_prepend(0.0, [a.v[i] * q.qv[i] for i in range(1, len(a.v)+1)]), (x,y) -> x+y)"
  private def normSql(t: String, c: String) =
    s"sqrt(list_reduce(list_prepend(0.0, [$t.$c[i] * $t.$c[i] for i in range(1, len($t.$c)+1)]), (x,y) -> x+y))"

  val oracles: Map[String, String] = Map(
    "q19_cosine_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         |p AS (
         |  SELECT q.query_id, a.vec_id AS neighbor_id,
         |    $dotSql / (${normSql("a", "v")} * ${normSql("q", "qv")}) AS cos
         |  FROM e a, q WHERE a.vec_id <> q.query_id)
         |SELECT query_id, rank, neighbor_id,
         |  CAST(ROUND(cos*1000000000,0) AS BIGINT) AS cos_ppb
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id ASC) AS rank FROM p)
         |WHERE rank <= 5""".stripMargin,
    "q20_ann_lsh_bucketed" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |    list_reduce(list_prepend(0::BIGINT,
         |      [CASE WHEN (embedding::DOUBLE[])[i+1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END
         |       for i in range(0, 6)]), (x,y) -> x+y) AS bucket
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id % 50 = 0),
         |p AS (
         |  SELECT q.query_id, a.vec_id AS neighbor_id,
         |    $dotSql / (${normSql("a", "v")} * ${normSql("q", "qv")}) AS cos
         |  FROM e a JOIN q ON a.bucket = q.bucket WHERE a.vec_id <> q.query_id)
         |SELECT query_id, rank, neighbor_id,
         |  CAST(ROUND(cos*1000000000,0) AS BIGINT) AS cos_ppb
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id ASC) AS rank FROM p)
         |WHERE rank <= 3""".stripMargin,
  )
}
