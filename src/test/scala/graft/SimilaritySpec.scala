package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall/quality assertions for the bucketed ANN paths, against the
  * brute-force truth (the registered `ann_*_recall` queries carry the same
  * joins through the DuckDB oracle; here we assert the raw numbers).
  */
class SimilaritySpec extends AnyFunSuite {
  import SparkTestBase._

  private def recalls(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    df.select("recall_at_k").collect().map(_.getDouble(0)).toSeq

  test("int8 quantization: reconstruction error within half a step, codes in range") {
    val rows = ops.SimilarityOps.queries("embed_quantize_int8")(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nDims, mn, mx, codeSum, maxErr) =>
      val halfStep = (mx - mn) / 510
      assert(maxErr <= halfStep + 1e-6,
        s"vec $id: max_abs_err $maxErr exceeds half a quantization step $halfStep")
      assert(codeSum >= 0 && codeSum <= 255L * nDims,
        s"vec $id: code checksum $codeSum outside [0, 255·n]")
      assert(mx >= mn)
    }
  }

  test("multi-probe LSH recalls ≥0.9 per query point, mean ≥0.95") {
    val r = recalls(ops.SimilarityOps.lshRecall(spark, Sf0001))
    assert(r.nonEmpty)
    assert(r.min >= 0.9, s"per-query LSH recall floor, got min ${r.min}")
    assert(r.sum / r.size >= 0.95, s"mean LSH recall, got ${r.sum / r.size}")
  }

  test("IVF (redundant assignment) recalls ≥0.5 per query point, mean ≥0.9") {
    val r = recalls(ops.SimilarityOps.ivfRecall(spark, Sf0001))
    assert(r.nonEmpty)
    assert(r.min >= 0.5, s"per-query IVF recall floor, got min ${r.min}")
    assert(r.sum / r.size >= 0.9, s"mean IVF recall, got ${r.sum / r.size}")
  }

  test("PQ codes: every vector encoded, codes in range, codebook rows self-code") {
    val rows = ops.SimilarityOps.queries("embed_pq_codes")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val n = Tables.load(spark, Sf0001, "embeddings").count()
    assert(rows.length == n, "every corpus vector must get a code word per subspace")
    rows.foreach { case (id, codes) =>
      assert(codes.forall(c => c >= 0 && c < 64), s"vec $id codes $codes out of range")
    }
    // a codebook vector's nearest codeword in every subspace is itself (d = 0)
    rows.filter(_._1 < 64).foreach { case (id, codes) =>
      assert(codes.forall(_ == id.toInt), s"codebook vec $id must self-code, got $codes")
    }
  }

  test("PQ ADC shortlist + exact rerank: honest recall on this worst-case corpus") {
    // uniform random vectors are PQ's pathological case (no cluster
    // structure for the subspace codebooks to exploit) — the floors here
    // are deliberately what the corpus supports, not a shippable ANN bar;
    // LSH (≥0.9/0.95) is the engine's high-recall path on this data
    val r = recalls(ops.SimilarityOps.pqRecall(spark, Sf0001))
    assert(r.nonEmpty)
    assert(r.min >= 0.5, s"per-query PQ recall floor, got min ${r.min}")
    assert(r.sum / r.size >= 0.7, s"mean PQ recall, got ${r.sum / r.size}")
  }

  test("truncated-dim shortlist + full-dim rerank: honest recall, k bound") {
    // Matryoshka-style serving: stage 1 scans only the first 16 of 64
    // dims, stage 2 reranks the 80-candidate shortlist at full width.
    // Uniform-random embeddings have NO energy compaction in the prefix —
    // the worst case for truncation — so like PQ this path is spec-graded
    // with floors the corpus supports (LSH remains the high-recall route);
    // on real MRL-trained embeddings the same plan approaches full recall.
    val df = ops.SimilarityOps.annTruncatedRerank(spark, Sf0001)
    val perQuery = df.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(perQuery.nonEmpty && perQuery.forall(_ <= 10))
    val r = ops.SimilarityOps.truncRecallProbe(spark, Sf0001)
    assert(r.min >= 0.3, s"per-query truncated-rerank floor, got min ${r.min}")
    assert(r.sum / r.size >= 0.5, s"mean truncated-rerank recall, got ${r.sum / r.size}")
  }

  test("LSH top-k respects the k bound per query") {
    val lsh = ops.SimilarityOps.annLshTopk(spark, Sf0001)
    val perQuery = lsh.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(perQuery.nonEmpty && perQuery.forall(_ <= 10))
  }

  test("scale-derived knobs grow with the corpus; recall floors hold at the larger sf") {
    val Sf01 = "/root/testdata/sf0.1"
    val nSmall = Tables.load(spark, Sf0001, "embeddings").count()
    val nLarge = Tables.load(spark, Sf01, "embeddings").count()
    assert(nLarge > nSmall, "fixture precondition")
    // the derivations must actually move between shipped corpus sizes —
    // constants in disguise would pass every small-sf test and still be
    // the wrong plan at 100 TB
    assert(ops.SimilarityOps.ivfNlists(nLarge) > ops.SimilarityOps.ivfNlists(nSmall),
      s"ivf nlists must grow: ${ops.SimilarityOps.ivfNlists(nSmall)} -> " +
        s"${ops.SimilarityOps.ivfNlists(nLarge)}")
    assert(ops.SimilarityOps.neardupBits(nLarge) > ops.SimilarityOps.neardupBits(nSmall),
      "near-dup bucket bits must grow")
    assert(ops.EmbedClusterOps.kFor(nLarge) > ops.EmbedClusterOps.kFor(nSmall),
      "k-means k must grow")
    // growing the knobs must not sink recall: same floors as the sf0.001
    // asserts, at the sf where the derived values have actually changed
    val lsh = recalls(ops.SimilarityOps.lshRecall(spark, Sf01))
    assert(lsh.min >= 0.9 && lsh.sum / lsh.size >= 0.95,
      s"sf0.1 LSH recall: min ${lsh.min}, mean ${lsh.sum / lsh.size}")
    val ivf = recalls(ops.SimilarityOps.ivfRecall(spark, Sf01))
    assert(ivf.min >= 0.5 && ivf.sum / ivf.size >= 0.9,
      s"sf0.1 IVF recall: min ${ivf.min}, mean ${ivf.sum / ivf.size}")
  }

  test("embedding near-dup catches every scaled AND every perturbed plant") {
    import org.apache.spark.sql.functions.col
    val rows = ops.SimilarityOps.queries("embed_neardup_cosine")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = rows.map(t => (t._1, t._2)).toSet
    val e = Tables.load(spark, Sf0001, "embeddings")
    val scaled = e.where(col("vec_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    val perturbed = e.where(col("vec_id") % 50 === 10)
      .collect().map(r => (r.getLong(0), r.getLong(0) + 300000)).toSet
    assert(pairs == scaled ++ perturbed)
    // the perturbed plants are genuinely near-but-NOT-exact: the analytic
    // window for alternating ±1/8 scaling is [√(1−ε²), 1) = [0.99216, 1)
    rows.filter(_._2 >= 300000).foreach { case (a, b, c) =>
      assert(c >= 0.99216 && c < 1.0, s"perturbed pair ($a,$b) cosine $c")
    }
    rows.filter(_._2 < 300000).foreach { case (a, b, c) =>
      assert(c == 1.0, s"scaled pair ($a,$b) cosine $c")
    }
  }
}
