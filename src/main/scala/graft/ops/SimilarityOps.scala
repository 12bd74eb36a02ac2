package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (`vec_id`, `embedding:
  * array<float>`, `label`) — the ANN component of the LLM-pipeline operator
  * set.
  *
  * Three tiers:
  *   - `embed_neardup_cosine` — near-duplicate detection, sign-LSH bucketed
  *     candidates → exact-cosine verify (the embedding member of the dedup
  *     family);
  *   - `ann_bruteforce_topk` — exact top-k for a broadcast query set: one
  *     linear scan of the corpus, the correctness baseline;
  *   - `ann_lsh_topk` — the 100 TB path: multi-probe sign-LSH restricts
  *     each query to its signature bucket neighborhood, so per-query work
  *     is O(bucket) not O(corpus). Hash-dependent → rows-only check here;
  *     its recall against the brute-force truth is asserted in ScalaTest.
  */
object SimilarityOps {

  private val Dim = 64
  private val TopK = 10

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Sign-LSH signatures the codegen way (same reasoning as the dedup
    * signatures: HOF lambdas are interpreted, explode + aggregate is not):
    * posexplode the vector, weight each component by the deterministic
    * hyperplane coefficient, and reduce nPlanes projection sums per id.
    * Formula matches [[graft.functions.VectorFunctions.signLshSignature]]
    * (modulo float-sum order, irrelevant at these margins).
    */
  private def signatures(e: DataFrame, idCol: String, vecCol: String, nPlanes: Int): DataFrame = {
    val exploded = e.select(col(idCol), posexplode(col(vecCol)).as(Seq("j", "x")))
    val aggs = (0 until nPlanes).map { p =>
      val w = (pmod(xxhash64(concat(lit(s"hp_${p}_"), col("j").cast("string"))),
        lit(1000001L)).cast("double") / 500000.0) - 1.0
      sum(col("x").cast("double") * w).as(s"proj$p")
    }
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        (0 until nPlanes).map(p =>
          when(col(s"proj$p") >= 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _).as("sig"))
  }

  /** Corpus plus injected scaled duplicates (×2 per 50th vector — cosine
    * exactly 1 with the original; the raw corpus has no pair above 0.8).
    */
  private def withScaledDups(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding")).unionByName(
      e.where(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))

  /** Embedding near-dup: sign-LSH bucket join (NO cartesian — scaling
    * preserves the signature, so true duplicates always collide), then
    * exact cosine ≥ 0.99 verification of candidates only.
    */
  private def embedNeardup(s: SparkSession, dir: String): DataFrame = {
    val base = withScaledDups(embeddings(s, dir))
    val fx = base.join(signatures(base, "vec_id", "embedding", nPlanes = 12), "vec_id").cache()
    val a = fx.select(col("vec_id").as("a_id"), col("embedding").as("a_e"), col("sig"))
    val b = fx.select(col("vec_id").as("b_id"), col("embedding").as("b_e"), col("sig"))
    a.join(b, Seq("sig")).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), round(cosine(col("a_e"), col("b_e")), 6).as("c"))
      .where(col("c") >= 0.99)
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Query vectors: every 100th id — present at every scale factor. */
  private def querySet(e: DataFrame): DataFrame =
    e.where(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_e"))

  /** Exact top-k cosine for a small broadcast query set: the corpus is
    * scanned ONCE (no shuffle of embeddings), cosines are codegen'd, and
    * only (q × corpus) score rows reach the per-query top-k window.
    */
  private def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val scored = e.crossJoin(broadcast(querySet(e)))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_e"), col("embedding")), 6).as("c"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= TopK)
      .orderBy(col("q_id"), col("rn"))
  }

  /** The bucketed ANN path: candidates = corpus vectors whose 8-bit sign-LSH
    * signature is within hamming ≤ 2 of the query's (multi-probe: the
    * signature itself plus every 1- and 2-bit flip, 37 probes) — an equality
    * join on probe keys, never a cross join. Top-k then ranks candidates only.
    */
  private def annLsh(s: SparkSession, dir: String): DataFrame = {
    val nPlanes = 8
    val e0 = embeddings(s, dir)
    val sigs = signatures(e0, "vec_id", "embedding", nPlanes).cache()
    val e = e0.join(sigs, "vec_id")
    val q = querySet(e0).join(
      sigs.withColumnRenamed("vec_id", "q_id"), "q_id")
    // probe keys: own signature + every 1- and 2-bit flip (multi-probe)
    val flips: Seq[Long] = (0 until nPlanes).map(p => 1L << p) ++
      (for (p <- 0 until nPlanes; r <- p + 1 until nPlanes) yield (1L << p) | (1L << r))
    val probes = q.select(col("q_id"), col("q_e"),
      explode(array(col("sig") +: flips.map(f =>
        col("sig").bitwiseXOR(lit(f))): _*)).as("probe_sig"))
    val candidates = e.join(broadcast(probes), col("sig") === col("probe_sig"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_e"), col("embedding")), 6).as("c"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("vec_id"))
    candidates.withColumn("rn", row_number().over(w))
      .where(col("rn") <= TopK)
      .orderBy(col("q_id"), col("rn"))
  }

  /** The IVF (inverted-file) ANN path: a fixed set of coarse centroids
    * partitions the corpus into posting lists; each query probes only its
    * `nprobe` nearest lists. Per-query work is O(corpus/nlists × nprobe):
    * at 100 TB the posting lists are the partition key and a query touches
    * 2 of 16+ partitions instead of all of them. Centroids here are a
    * deterministic corpus sample (vec_id ≤ 15 — present at every sf);
    * a production build would k-means them, which only changes centroid
    * quality, not the plan shape.
    */
  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    val nprobe = 2
    val e = embeddings(s, dir)
    val cent = e.where(col("vec_id") <= 15)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_e"))
    // assignment: every vector → nearest centroid (one broadcast pass)
    val aw = Window.partitionBy(col("vec_id")).orderBy(col("ac").desc, col("c_id"))
    val assign = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("c_id"),
        cosine(col("embedding"), col("c_e")).as("ac"))
      .withColumn("rn", row_number().over(aw)).where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id"))
    // queries probe their nprobe nearest posting lists
    val qw = Window.partitionBy(col("q_id")).orderBy(col("qc").desc, col("c_id"))
    val probes = querySet(e).crossJoin(broadcast(cent))
      .select(col("q_id"), col("q_e"), col("c_id"), cosine(col("q_e"), col("c_e")).as("qc"))
      .withColumn("rn", row_number().over(qw)).where(col("rn") <= nprobe)
      .select(col("q_id"), col("q_e"), col("c_id"))
    val candidates = assign.join(broadcast(probes), Seq("c_id"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_e"), col("embedding")), 6).as("c"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("vec_id"))
    candidates.withColumn("rn", row_number().over(w))
      .where(col("rn") <= TopK)
      .orderBy(col("q_id"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_neardup_cosine" -> (embedNeardup _),
    "ann_bruteforce_topk" -> (annBruteforce _),
    "ann_lsh_topk" -> (annLsh _),
    "ann_ivf_topk" -> (annIvf _)
  )

  val oracleSql: Map[String, String] = Map(
    "embed_neardup_cosine" ->
      """WITH fx AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, list_transform(embedding, x -> x * 2)
        |  FROM embeddings WHERE vec_id % 50 = 0)
        |SELECT a_id, b_id, c FROM (
        |  SELECT a.vec_id a_id, b.vec_id b_id,
        |    round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) c
        |  FROM fx a JOIN fx b ON a.vec_id < b.vec_id)
        |WHERE c >= 0.99 ORDER BY a_id, b_id""".stripMargin,
    // DOUBLE[] casts in both oracles matter: duckdb's float-list cosine
    // accumulates in float (~1e-7 error), which crosses 6-decimal rounding
    // boundaries that the engine's double-precision cosine does not.
    "ann_bruteforce_topk" ->
      """WITH q AS (SELECT vec_id q_id, embedding q_e FROM embeddings WHERE vec_id % 100 = 7)
        |SELECT q_id, vec_id, c, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT q_id, e.vec_id,
        |    round(list_cosine_similarity(q_e::DOUBLE[], e.embedding::DOUBLE[]), 6) c,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY round(list_cosine_similarity(q_e::DOUBLE[], e.embedding::DOUBLE[]), 6) DESC,
        |        e.vec_id) rn
        |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q_id)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin
    // ann_lsh_topk / ann_ivf_topk: bucket-dependent candidate sets →
    // rows-only checks; recall vs ann_bruteforce_topk asserted in
    // SimilaritySpec.
  )
}
