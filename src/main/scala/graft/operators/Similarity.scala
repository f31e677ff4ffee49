package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  * Two paths, per the standard ANN playbook:
  *   - [[knnBrute]]: exact brute-force cosine top-k — the correctness
  *     baseline, O(|queries| × n), oracle-checked against DuckDB.
  *   - [[annLsh]]: random-hyperplane LSH bucketing — the 100 TB path; the
  *     only shuffle is a groupBy on the 16-bit bucket key.
  *
  * Cross-engine float determinism: embeddings are quantized to integers
  * (round(x·10⁴)) so dot products and norms are EXACT int64 arithmetic —
  * order-independent under any partitioning, bit-identical in DuckDB.
  * The final cosine is one exact-int division in double.
  */
object Similarity {

  private val Scale = 10000

  /** Quantized embedding: round(x·10⁴) per element, as bigint. */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * Scale).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine from quantized vectors + precomputed squared norms (exact ints). */
  def cosine(qa: Column, na: Column, qb: Column, nb: Column): Column =
    dotQ(qa, qb).cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** Brute-force cosine top-10 for query vectors (vec_id < 5) against the
    * full table: broadcast the tiny query side, per-query row_number. The
    * oracle replicates the identical quantized-integer arithmetic in DuckDB.
    */
  val knnBrute: Q = Q("knn_brute",
    """WITH qz AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |nz AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nrm FROM qz),
      |p AS (
      |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
      |    CAST(list_dot_product(q.qv, t.qv) AS DOUBLE) / (sqrt(CAST(q.nrm AS DOUBLE)) * sqrt(CAST(t.nrm AS DOUBLE))) AS cos_sim
      |  FROM nz q JOIN nz t ON q.vec_id < 5 AND t.vec_id != q.vec_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
      |  FROM p)
      |SELECT query_id, neighbor_id, cos_sim, rn FROM r WHERE rn <= 10
      |ORDER BY query_id, rn""".stripMargin) { (s, dir) =>
    val base = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_qv"), col("q_nrm"), col("qv"), col("nrm")).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .orderBy(col("query_id"), col("rn"))
  }

  /** Signature width: 2^6 = 64 buckets. Sized for the test corpus (hundreds
    * to thousands of vectors → ~n/64 candidates per probe); at real scale
    * this widens with log2(n) and/or adds multi-probe — the plumbing is
    * identical.
    */
  private val SigBits = 6

  /** Per-vector random-hyperplane signature: bit b = sign(Σᵢ qvᵢ·±1) where
    * the ±1 planes are derived from xxhash64 (deterministic, no stored
    * model). Exact integer sums → identical buckets on any cluster layout.
    * Output carries the quantized vector + squared norm for downstream
    * in-bucket exact rescoring.
    */
  def hyperplaneSignatures(s: SparkSession, embeddings: DataFrame): DataFrame = {
    val dims = 64
    val planes = s.range(SigBits.toLong * dims).select(
      (col("id") / dims).cast("int").as("b"),
      (col("id") % dims).cast("int").as("i"),
      when(pmod(xxhash64(concat(lit("plane#"), col("id"))), lit(2)) === 0, 1L).otherwise(-1L).as("sign"))
    val base = embeddings
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
    val comps = base.select(col("vec_id"), posexplode(col("qv")).as(Seq("i", "v")))
    val bits = comps.join(broadcast(planes), Seq("i"))
      .groupBy(col("vec_id"), col("b"))
      .agg(sum(col("v") * col("sign")).as("proj"))
      .withColumn("bit", when(col("proj") > 0, lit(1L)).otherwise(lit(0L)))
    val bucket = bits.groupBy(col("vec_id"))
      .agg(sum(expr("shiftleft(bit, b)")).as("bucket"))
    base.join(bucket, Seq("vec_id"))
  }

  /** ANN via LSH: signature bucketing + in-bucket exact cosine top-k for the
    * same query set as [[knnBrute]] (so recall is directly comparable).
    * Queries probe only their own bucket — at scale the candidate set is
    * n/2^bits per bucket instead of n.
    */
  val annLsh: Q = Q.noOracle("ann_lsh") { (s, dir) =>
    val sig = hyperplaneSignatures(s, Tables.load(s, dir, "embeddings"))
    val queries = sig.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    sig.join(broadcast(queries),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        cosine(col("q_qv"), col("q_nrm"), col("qv"), col("nrm")).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .orderBy(col("query_id"), col("rn"))
  }

  val all: Seq[Q] = Seq(knnBrute, annLsh)
}
