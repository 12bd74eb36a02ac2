package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hash-gated sampling: the split partitions the corpus exactly, rates land
  * near their bucket fractions, and reruns are bit-identical (no rand()).
  */
class SamplingSpec extends AnyFunSuite {
  import SparkTestBase._

  test("train/val/test split partitions the corpus exactly once") {
    val counts = ops.SamplingOps.queries("mix_split_counts")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val total = Tables.load(spark, Sf0001, "documents").count()
    assert(counts.map(_._2).sum == total, "every document lands in exactly one split")
    assert(counts.map(_._1).toSet == Set("train", "val", "test"))
    val train = counts.filter(_._1 == "train").map(_._2).sum.toDouble / total
    assert(train > 0.6 && train < 0.9, s"train fraction ~12/16, got $train")
  }

  test("stratified sampling is deterministic across runs and keeps non-target langs intact") {
    val run1 = ops.SamplingOps.queries("mix_stratified_sample")(spark, Sf0001).collect().toSeq
    val run2 = ops.SamplingOps.queries("mix_stratified_sample")(spark, Sf0001).collect().toSeq
    assert(run1 == run2, "hash-gated sampling must be a pure function of the corpus")
    val docs = Tables.load(spark, Sf0001, "documents")
    val keptByLang = run1.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    val allByLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    allByLang.foreach { case (lang, n) =>
      if (lang != "en" && lang != "zh")
        assert(keptByLang.getOrElse(lang, 0) == n, s"non-target lang $lang must be kept whole")
    }
    val enKept = keptByLang.getOrElse("en", 0).toDouble / allByLang("en")
    assert(enKept > 0.3 && enKept < 0.7, s"en keep-rate ~8/16, got $enKept")
  }
}
