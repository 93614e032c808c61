package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (dim-64 float vectors) —
  * BASELINE north-star: brute-force cosine top-k as the correctness
  * baseline, and a random-hyperplane LSH-bucketed variant as the scale
  * path.
  *
  * Everything is higher-order Catalyst expressions (`zip_with` /
  * `aggregate` / `transform`) — no UDFs — and all arithmetic is forced to
  * double before any fold, so both engines fold identical IEEE doubles in
  * identical order and results hash-match exactly.
  *
  * Scale notes:
  *   - brute-force is probes × corpus: correct at any probe count but
  *     O(P·N) — it exists as the oracle-checkable baseline. The probe side
  *     is explicitly [[broadcast]] so the corpus never shuffles (a
  *     broadcast nested-loop join; each executor streams its corpus slice
  *     once);
  *   - the LSH variant buckets both sides with 4 deterministic hyperplanes
  *     (integer-arithmetic weights — exactly reproducible in SQL, no libm
  *     divergence) and equi-joins on the bucket id: shuffle on a 16-value
  *     uniform key, per-bucket work is |bucket|², and recall is tunable by
  *     plane count / multi-probe. This is the 100 TB shape: candidate
  *     generation by equi-join, never all-pairs;
  *   - norms are computed scan-side before the join (once per vector, not
  *     once per pair).
  */
object Similarity extends QueryModule {

  /** Deterministic hyperplane weight: integer LCG folded to [-0.5, 0.5).
    * Pure integer arithmetic + one division → bit-identical in any engine. */
  private def planeWeight(p: Int, d: Int): Double =
    ((1L + (p.toLong * 64L + d) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5

  private def planeCol(p: Int): Column =
    array((0 until 64).map(d => lit(planeWeight(p, d))): _*)

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** vec_id, emb (double), nrm. */
  private def normed(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(aggregate(col("emb"), lit(0.0), (acc, x) => acc + x * x)))

  /** Brute-force cosine top-5 for probe vectors (vec_id < 10). */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val n = normed(spark, dir)
    val probes = n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"), col("nrm").as("pnrm"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    n.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", dot(col("pemb"), col("emb")) / (col("pnrm") * col("nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), round(col("sim"), 6).as("cos_sim"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  /** LSH-bucketed approximate NN: 4-bit hyperplane bucket, equi-join on
    * bucket, exact cosine inside the bucket, best match per probe. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = normed(spark, dir).withColumn("bucket",
      (0 until 4).map(p =>
        when(dot(col("emb"), planeCol(p)) > 0, lit(1 << p)).otherwise(lit(0)))
        .reduce(_ + _))
    val probes = bucketed.filter(col("vec_id") < 50)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"),
        col("nrm").as("pnrm"), col("bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", dot(col("pemb"), col("emb")) / (col("pnrm") * col("nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("probe_id"), col("vec_id"), round(col("sim"), 6).as("cos_sim"))
      .orderBy(col("probe_id"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q44_sim_cosine_topk" -> cosineTopK _,
    "q45_sim_ann_lsh" -> annLsh _
  )

  /** Oracle-side plane weight, same integer formula as [[planeWeight]]. */
  private def planeWeightSql(p: Int): String =
    s"(((1 + (${p}*64 + (i-1)) * 2654435761) % 1000003) / 1000003.0 - 0.5)"

  private val normedCte =
    """WITH e AS (SELECT vec_id,
      |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      |           FROM embeddings),
      |n AS (SELECT vec_id, emb,
      |        sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm
      |      FROM e)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q44_sim_cosine_topk" ->
      s"""$normedCte,
         |j AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |        list_sum(list_transform(range(1, 65),
         |          i -> p.emb[i] * c.emb[i])) / (p.nrm * c.nrm) AS sim
         |      FROM n p JOIN n c ON p.vec_id < 10 AND c.vec_id <> p.vec_id),
         |r AS (SELECT probe_id, vec_id, sim,
         |        row_number() OVER (PARTITION BY probe_id
         |                           ORDER BY sim DESC, vec_id) AS rn
         |      FROM j)
         |SELECT probe_id, vec_id, round(sim, 6) AS cos_sim, rn
         |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin,
    "q45_sim_ann_lsh" -> {
      val bucketExpr = (0 until 4).map { p =>
        s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> emb[i] * ${planeWeightSql(p)})) > 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
      s"""$normedCte,
         |b AS (SELECT vec_id, emb, nrm, $bucketExpr AS bucket FROM n),
         |j AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |        list_sum(list_transform(range(1, 65),
         |          i -> p.emb[i] * c.emb[i])) / (p.nrm * c.nrm) AS sim
         |      FROM b p JOIN b c
         |        ON p.bucket = c.bucket AND p.vec_id < 50 AND c.vec_id <> p.vec_id),
         |r AS (SELECT probe_id, vec_id, sim,
         |        row_number() OVER (PARTITION BY probe_id
         |                           ORDER BY sim DESC, vec_id) AS rn
         |      FROM j)
         |SELECT probe_id, vec_id, round(sim, 6) AS cos_sim
         |FROM r WHERE rn = 1 ORDER BY probe_id""".stripMargin
    }
  )
}
