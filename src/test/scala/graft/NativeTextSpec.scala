package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NativeText
import graft.functions.TextFunctions

/** The native one-pass expressions and their composable (HOF) reference
  * implementations must agree — the composable forms define the semantics,
  * the native forms make them cheap, and this suite is what lets both live
  * in the codebase without drifting.
  */
class NativeTextSpec extends AnyFunSuite {
  import SparkTestBase._

  private implicit lazy val sp: org.apache.spark.sql.SparkSession = spark

  private def docs = {
    NativeText.register(spark)
    Tables.load(spark, Sf0001, "documents").limit(100).cache()
  }

  test("native unigram simhash equals the composable HOF simhash") {
    val d = docs
      .select(expr("graft_simhash60(text)").as("native"),
        TextFunctions.simhash60(TextFunctions.tokens(col("text"))).as("composable"))
    assert(d.where(col("native") =!= col("composable")).count() == 0)
  }

  test("native token hashes equal xxhash64 over composable tokens") {
    val d = docs.select(
      expr("graft_token_hashes(text)").as("native"),
      transform(TextFunctions.tokens(col("text")), w => xxhash64(w)).as("composable"))
    assert(d.where(col("native") =!= col("composable")).count() == 0)
  }

  test("native minhash signature = composable xorshift-min over native shingles") {
    // the permutation keys are shared (TextFunctions.minhashKeys), so slot
    // minima must match exactly when fed the same shingle hashes
    val d = docs.select(
      expr("graft_minhash_sig64(text)").as("native"),
      TextFunctions.minhashSignature(expr("graft_shingle_hashes(text)"), 64).as("composable"))
    assert(d.where(col("native").isNotNull && col("native") =!= col("composable")).count() == 0)
  }

  test("signature expressions are null exactly when the doc has no shingles") {
    import sp.implicits._
    NativeText.register(spark)
    val d = Seq("one two", "a b c d e").toDF("text")
      .select(col("text"), expr("graft_minhash_sig64(text)").as("mh"),
        expr("graft_simhash60_shingles(text)").as("sh"))
      .collect()
    assert(d.find(_.getString(0) == "one two").exists(r => r.isNullAt(1) && r.isNullAt(2)))
    assert(d.find(_.getString(0) == "a b c d e").exists(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }
}
