package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** EmbedClusterOps (k-means): the distributed loop must agree exactly with a
  * driver-side pure-Scala Lloyd's (same integer geometry), be deterministic,
  * and survive the empty-cluster / tie edge cases the carry rule exists for.
  */
class EmbedClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  private val Scale = 10000

  /** Mirror of the engine's quantization: Spark `round` is HALF_UP on the
    * double's exact decimal value.
    */
  private def quant(x: Float): Long =
    BigDecimal(x.toDouble * Scale).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Reference Lloyd's on plain Scala collections — exact int sums, the same
    * `D/n²` double comparator, lowest-cid tie-break, empty-cluster carry.
    */
  private def referenceKmeans(vecs: Seq[(Long, Array[Long])], k: Int, iters: Int): Map[Long, Int] = {
    val sorted = vecs.sortBy(_._1)
    var cents: Vector[(Array[Long], Long)] = sorted.take(k).map(v => (v._2, 1L)).toVector
    var assigned: Map[Long, Int] = Map.empty
    for (it <- 1 to iters) {
      assigned = vecs.map { case (id, q) =>
        val best = cents.zipWithIndex.minBy { case ((s, n), cid) =>
          val d = q.indices.map { i => val t = n * q(i) - s(i); t * t }.sum.toDouble / (n * n).toDouble
          (d, cid)
        }._2
        id -> best
      }.toMap
      if (it < iters) {
        val byC = vecs.groupBy { case (id, _) => assigned(id) }
        cents = cents.zipWithIndex.map { case (prev, cid) =>
          byC.get(cid) match {
            case Some(members) =>
              val dim = members.head._2.length
              (Array.tabulate(dim)(i => members.map(_._2(i)).sum), members.size.toLong)
            case None => prev
          }
        }
      }
    }
    assigned
  }

  test("distributed k-means ≡ driver-side reference Lloyd's (sf0.001)") {
    val raw = Tables.load(spark, Sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(quant).toArray)).toSeq
    val expected = referenceKmeans(raw, k = 8, iters = 3)
    val got = ops.EmbedClusterOps.queries("embed_kmeans")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == raw.size)
    assert(got == expected)
    // the run must actually use >1 cluster on real data
    assert(got.values.toSet.size > 1)
  }

  test("k-means is deterministic across runs") {
    val a = ops.EmbedClusterOps.queries("embed_kmeans")(spark, Sf0001).collect().toSeq
    val b = ops.EmbedClusterOps.queries("embed_kmeans")(spark, Sf0001).collect().toSeq
    assert(a == b)
  }

  test("duplicate seeds: ties collapse to the lowest cid; empty cluster carries") {
    // two identical seed vectors — every point ties between c0 and c1, the
    // tie-break sends all to c0, c1 goes empty and must carry its seed
    // through every update without NULLs or division errors
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(0L, Seq(0.0f, 0.0f)),
      Row(1L, Seq(0.0f, 0.0f)),
      Row(2L, Seq(0.1f, 0.0f)),
      Row(3L, Seq(0.0f, 0.2f)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    // iters=1: every point is equidistant to the two identical seeds — the
    // strict-< fold must send all of them to cid 0
    val one = ops.EmbedClusterOps.kmeansAssign(df, k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(one == Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 0))
    // iters=3: c1 empties after pass 1, carries its (0,0) seed, and then
    // recaptures the origin points — the reference fold defines the truth
    val raw = rows.map(r => (r.getLong(0),
      r.getSeq[Float](1).map(quant).toArray))
    val out = ops.EmbedClusterOps.kmeansAssign(df, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == referenceKmeans(raw, k = 2, iters = 3))
    assert(out.values.toSet == Set(0, 1)) // the carried cluster is non-empty again
  }

  test("semdedup drops exactly the injected duplicates (≡ exhaustive truth)") {
    val dropped = ops.EmbedClusterOps.queries("semdedup_prune")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSet
    // exhaustive ground truth: every ≥0.99-cosine pair in the fixture is an
    // injected exact copy (corpus max pairwise cosine < 0.8), so the
    // cluster-scoped prune must equal the brute-force answer
    val expected = Tables.load(spark, Sf0001, "embeddings")
      .where(col("vec_id") % 50 === 0).collect().map(_.getLong(0) + 100000).toSet
    assert(dropped == expected)
  }

  test("semdedup plan: pairwise work is cluster-scoped (no cartesian)") {
    val p = ops.EmbedClusterOps.queries("semdedup_prune")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  test("assignment plan is broadcast + map-only (no vector-side shuffle before argmin)") {
    // the staged (lazy) pipeline — the registry serves the hygienic view,
    // whose root is an opaque LogicalRDD
    val staged = ops.EmbedClusterOps.kmeansDistancesStaged(
      Tables.load(spark, Sf0001, "embeddings"))
    val p = staged.plan.queryExecution.executedPlan.toString
    staged.release()
    assert(!p.contains("CartesianProduct"), p)
    // the cross join with the 1-row centroid array must be a broadcast
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("outlier screen flags exactly the ceil(5%) most-distant members per cluster") {
    import org.apache.spark.sql.functions._
    val flagged = ops.EmbedClusterOps.queries("embed_outliers")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val dd = ops.EmbedClusterOps
      .kmeansDistances(Tables.load(spark, Sf0001, "embeddings"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val byCluster = dd.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      val quota = (members.length + 19) / 20
      val expected = members.sortBy(m => (-m._3, m._1)).take(quota).map(_._1).toSet
      val got = flagged.filter(_._2 == cid).map(_._1).toSet
      assert(got == expected, s"cluster $cid: flagged $got vs expected $expected")
      val ranks = flagged.filter(_._2 == cid).map(_._3).sorted.toSeq
      assert(ranks == (1 to quota), s"cluster $cid ranks not contiguous: $ranks")
    }
    assert(flagged.nonEmpty)
  }
}
