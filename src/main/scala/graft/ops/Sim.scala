package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - sm01: brute-force cosine top-k for a fixed query set — the exactness
  *    baseline. The corpus side streams; the query side is broadcast, so
  *    at 100 TB this is a single map-side pass (no shuffle) + a tiny top-k.
  *  - sm02: all-pairs nearest neighbor (near-duplicate scan). Quadratic by
  *    definition at small scale; the 100 TB path is sm03's bucketing (only
  *    intra-bucket pairs) — kept exact here so the oracle can verify it.
  *  - sm03: random-hyperplane LSH (16 planes -> 16-bit signature). Planes
  *    come from a deterministic integer formula so the DuckDB oracle
  *    reproduces the *same* buckets — the oracle verifies the algorithm.
  *
  * Dot products are computed in double precision with `zip_with` +
  * `aggregate` (codegen'd, per-row, no UDF); similarities are rounded to 4
  * decimals on output so group-sum association order can't flip a hash.
  */
object Sim {

  /** embedding as array<double> with L2 norm. */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Oracle scaffold: per-(vec, dim) exploded doubles + norms. */
  private val duckVecs =
    """e AS (
        SELECT vec_id, d, CAST(embedding[d + 1] AS DOUBLE) AS x
        FROM embeddings, range(64) t(d)),
      nrm AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM e GROUP BY vec_id)"""

  // ------------------------------------------------- brute-force top-k ANN

  private def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    val q   = broadcast(all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn")))
    val sim = dot(col("qv"), col("v")) / (col("qn") * col("nrm"))
    val byQ = Window.partitionBy("qid").orderBy(desc("sim"), asc("nid"))
    all.join(q, col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"), sim.as("sim"))
      .withColumn("rn", row_number().over(byQ).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("rn"), col("nid"), round(col("sim"), 4).as("sim"))
      .orderBy("qid", "rn")
  }

  private val cosineTopKOracle =
    s"""WITH $duckVecs,
      dots AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid, SUM(a.x * b.x) AS dot
        FROM e a JOIN e b ON a.d = b.d AND b.vec_id <> a.vec_id
        WHERE a.vec_id < 10
        GROUP BY 1, 2),
      sims AS (
        SELECT qid, nid, dot / (na.nrm * nb.nrm) AS sim
        FROM dots JOIN nrm na ON qid = na.vec_id JOIN nrm nb ON nid = nb.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM sims)
      SELECT qid, rn, nid, ROUND(sim, 4) AS sim FROM r WHERE rn <= 5 ORDER BY qid, rn"""

  // ------------------------------------------- all-pairs nearest neighbor

  private def nearestNeighbor(s: SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    val b = broadcast(all.select(
      col("vec_id").as("nid"), col("v").as("bv"), col("nrm").as("bn")))
    val sim  = dot(col("v"), col("bv")) / (col("nrm") * col("bn"))
    val byId = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("nid"))
    all.join(b, col("vec_id") =!= col("nid"))
      .select(col("vec_id"), col("nid"), sim.as("sim"))
      .withColumn("rn", row_number().over(byId))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("nid").as("nn_id"), round(col("sim"), 4).as("sim"))
      .orderBy("vec_id")
  }

  private val nearestNeighborOracle =
    s"""WITH $duckVecs,
      dots AS (
        SELECT a.vec_id AS vid, b.vec_id AS nid, SUM(a.x * b.x) AS dot
        FROM e a JOIN e b ON a.d = b.d AND b.vec_id <> a.vec_id
        GROUP BY 1, 2),
      sims AS (
        SELECT vid, nid, dot / (na.nrm * nb.nrm) AS sim
        FROM dots JOIN nrm na ON vid = na.vec_id JOIN nrm nb ON nid = nb.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY sim DESC, nid) AS rn FROM sims)
      SELECT vid AS vec_id, nid AS nn_id, ROUND(sim, 4) AS sim FROM r WHERE rn = 1 ORDER BY vec_id"""

  // ---------------------------------------------- random-hyperplane LSH

  /** Deterministic plane weights: integer formula -> double in [-1, 1).
    * w(j, d) = ((j*64 + d) * 2654435761 mod 2^32) / 2^31 - 1 */
  private[graft] def planeWeight(j: Int, dim: Int): Double =
    ((j.toLong * 64 + dim) * 2654435761L % 4294967296L) / 2147483648.0 - 1.0

  private def lshBuckets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planes = broadcast(
      (for { j <- 0 until 16; dim <- 0 until 64 }
        yield (j, dim, planeWeight(j, dim), 1L << j)).toDF("j", "d", "w", "pw"))
    val e = Tables.embeddings(s, d).select(
      col("vec_id"), posexplode(transform(col("embedding"), x => x.cast("double"))))
      .withColumnRenamed("pos", "d").withColumnRenamed("col", "x")
    e.join(planes, "d")
      .groupBy("vec_id", "j", "pw")
      .agg(sum(col("x") * col("w")).as("dp"))
      .groupBy("vec_id")
      .agg(sum(when(col("dp") > 0, col("pw")).otherwise(0L)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("bucket")
  }

  private val lshBucketsOracle =
    """WITH planes AS (
        SELECT j, d, ((j * 64 + d) * 2654435761 % 4294967296) / 2147483648.0 - 1.0 AS w,
               CAST(1 AS BIGINT) << j AS pw
        FROM range(16) a(j), range(64) b(d)),
      e AS (
        SELECT vec_id, d, CAST(embedding[d + 1] AS DOUBLE) AS x
        FROM embeddings, range(64) t(d)),
      dots AS (
        SELECT vec_id, j, pw, SUM(x * w) AS dp
        FROM e JOIN planes USING (d) GROUP BY 1, 2, 3),
      sig AS (
        SELECT vec_id, CAST(SUM(CASE WHEN dp > 0 THEN pw ELSE 0 END) AS BIGINT) AS bucket
        FROM dots GROUP BY vec_id)
      SELECT bucket, COUNT(*) AS n_vecs FROM sig GROUP BY bucket ORDER BY bucket"""

  def all: Seq[Q] = Seq(
    Q("sm01_cosine_topk", cosineTopK, Some(cosineTopKOracle)),
    Q("sm02_nearest_neighbor", nearestNeighbor, Some(nearestNeighborOracle)),
    Q("sm03_lsh_buckets", lshBuckets, Some(lshBucketsOracle))
  )
}
