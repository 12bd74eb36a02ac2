package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall/quality assertions for the hash-dependent similarity paths that
  * the DuckDB oracle can't check (ann_lsh_topk is rows-only in Verify).
  */
class SimilaritySpec extends AnyFunSuite {
  import SparkTestBase._

  test("LSH top-k recalls a usable fraction of the exact top-k") {
    val exact = ops.SimilarityOps.queries("ann_bruteforce_topk")(spark, Sf0001)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = ops.SimilarityOps.queries("ann_lsh_topk")(spark, Sf0001)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.2,
      s"multi-probe LSH should recall a usable fraction on random vectors, got $recall")
    assert(lsh.nonEmpty, "LSH path must produce candidates")
  }

  test("LSH candidate generation prunes the corpus (never all-pairs)") {
    // every LSH result must also appear in some bucket — i.e. the candidate
    // set per query is strictly smaller than the corpus
    val e = Tables.load(spark, Sf0001, "embeddings").count()
    val lsh = ops.SimilarityOps.queries("ann_lsh_topk")(spark, Sf0001)
    val perQuery = lsh.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(perQuery.forall(_ <= 10), "top-k bound respected")
    assert(e > 10, "sanity: corpus bigger than k")
  }

  test("IVF top-k recalls a usable fraction and respects the k bound") {
    val exact = ops.SimilarityOps.queries("ann_bruteforce_topk")(spark, Sf0001)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = ops.SimilarityOps.queries("ann_ivf_topk")(spark, Sf0001)
    val pairs = ivf.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pairs).size.toDouble / exact.size
    assert(recall >= 0.1, s"nprobe=2 of 16 lists should recall some true neighbors, got $recall")
    assert(ivf.groupBy("q_id").count().collect().forall(_.getLong(1) <= 10))
  }

  test("embedding near-dup catches every injected scaled duplicate") {
    val pairs = ops.SimilarityOps.queries("embed_neardup_cosine")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Tables.load(spark, Sf0001, "embeddings")
      .where(org.apache.spark.sql.functions.col("vec_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    assert(pairs == expected)
  }
}
