package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup: the persisted signature index is appended (never
  * rebuilt), and batch-vs-index results equal the brute-force truth.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  import SparkTestBase._

  private def docs = Tables.load(spark, Sf0001, "documents")

  test("index appends add files without rewriting existing ones") {
    val idx = s"${tmpDir("idx_spec_")}/index"
    val corpus = docs.where(s"NOT (${ops.IncrementalDedupOps.BatchPred})")
    val batch = docs.where(ops.IncrementalDedupOps.BatchPred)
    ops.IncrementalDedupOps.appendToIndex(corpus, idx)
    val before = graft.util.Fs.listParquetFiles(spark, idx).toMap
    val corpusRows = spark.read.parquet(idx).count()
    ops.IncrementalDedupOps.appendToIndex(batch, idx)
    val after = graft.util.Fs.listParquetFiles(spark, idx).toMap
    before.foreach { case (path, len) =>
      assert(after.get(path).contains(len),
        s"existing index file must survive an append untouched: $path")
    }
    assert(after.size > before.size, "append must add new files")
    val expectedBatchRows = ops.IncrementalDedupOps.bandRows(batch).count()
    assert(spark.read.parquet(idx).count() == corpusRows + expectedBatchRows)
  }

  test("an old-generation index stays probeable via its pinned banding") {
    // the round-15 constants bump (16x4 -> 21x3) must not silently empty
    // probes of an index persisted under the OLD banding: the sidecar
    // pins the generation, appends and probes reuse it, and the pair set
    // equals the current-generation index's (the 64-slot signature is
    // generation-stable; only recall margins differ, and this corpus's
    // pairs are found by both)
    val corpus = docs.where(s"NOT (${ops.IncrementalDedupOps.BatchPred})")
    val batch = docs.where(ops.IncrementalDedupOps.BatchPred)
    val oldIdx = s"${tmpDir("idx_old_")}/index"
    ops.IncrementalDedupOps.bandRows(corpus, 16, 4)
      .write.parquet(oldIdx)
    import spark.implicits._
    Seq((16, 4)).toDF("bands", "rows_per_band")
      .write.parquet(oldIdx + "_params")
    assert(ops.IncrementalDedupOps.indexParams(spark, oldIdx).contains((16, 4)))
    val viaOld = ops.IncrementalDedupOps.dedupAgainstIndex(batch, corpus, oldIdx)
      .select("new_id", "corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val newIdx = s"${tmpDir("idx_new_")}/index"
    ops.IncrementalDedupOps.appendToIndex(corpus, newIdx)
    // first append pins the CURRENT generation
    assert(ops.IncrementalDedupOps.indexParams(spark, newIdx)
      .contains((ops.DedupOps.Bands, ops.DedupOps.RowsPerBand)))
    val viaNew = ops.IncrementalDedupOps.dedupAgainstIndex(batch, corpus, newIdx)
      .select("new_id", "corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaOld == viaNew && viaNew.nonEmpty,
      s"old-generation probe diverged: old=$viaOld new=$viaNew")
    // rows without a sidecar = interrupted first append: probes fail CLOSED
    val bareIdx = s"${tmpDir("idx_bare_")}/index"
    ops.IncrementalDedupOps.bandRows(corpus).write.parquet(bareIdx)
    intercept[IllegalStateException] {
      ops.IncrementalDedupOps.dedupAgainstIndex(batch, corpus, bareIdx).collect()
    }
    intercept[IllegalStateException] {
      ops.IncrementalDedupOps.appendToIndex(batch, bareIdx)
    }
  }

  test("embedding index appends add files without rewriting existing ones") {
    val idx = s"${tmpDir("eidx_spec_")}/index"
    val corpus = Tables.load(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    ops.SimilarityOps.appendToEmbedIndex(corpus, idx)
    val before = graft.util.Fs.listParquetFiles(spark, idx).toMap
    val corpusRows = spark.read.parquet(idx).count()
    val batch = corpus.where(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    ops.SimilarityOps.appendToEmbedIndex(batch, idx)
    val after = graft.util.Fs.listParquetFiles(spark, idx).toMap
    before.foreach { case (path, len) =>
      assert(after.get(path).contains(len),
        s"existing index file must survive an append untouched: $path")
    }
    assert(after.size > before.size, "append must add new files")
    // params are pinned at creation; the append must reuse them, emitting
    // `bands` key rows per vector
    val Some((bands, bits)) = ops.SimilarityOps.embedIndexParams(spark, idx)
    assert(spark.read.parquet(idx).count() == corpusRows + batch.count() * bands)
    assert(bits == ops.SimilarityOps.neardupBits(corpus.count()))
  }

  test("embedding batch-vs-index dedup equals the exhaustive cosine join") {
    val idx = s"${tmpDir("eidx_spec_")}/index"
    val corpus = Tables.load(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // all three planted populations: exact scaled copies, NEAR-but-not-
    // exact alternating-scaled copies (cosine ≈ 0.992 — the case a single
    // scale-invariant signature could miss), and negated decoys
    val batch = corpus.where(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      .unionByName(corpus.where(col("vec_id") % 50 === 10)
        .select((col("vec_id") + 300000).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * when(i % 2 === 0, lit(1.125f)).otherwise(lit(0.875f))).as("embedding")))
      .unionByName(corpus.where(col("vec_id") % 50 === 25)
        .select((col("vec_id") + 200000).as("vec_id"),
          transform(col("embedding"), x => x * lit(-1.0f)).as("embedding")))
    ops.SimilarityOps.appendToEmbedIndex(corpus, idx)
    val got = ops.SimilarityOps.dedupAgainstEmbedIndex(batch, corpus, idx)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = batch.select(col("vec_id").as("new_id"), col("embedding").as("n_e"))
      .crossJoin(corpus.select(col("vec_id").as("corpus_id"), col("embedding").as("c_e")))
      .select(col("new_id"), col("corpus_id"),
        org.apache.spark.sql.functions.call_function("graft_cosine", col("n_e"), col("c_e")).as("c"))
      .where(col("c") >= 0.99)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must exercise at least one batch-vs-corpus pair")
    assert(expected.exists(_._1 >= 300000),
      "fixture must exercise near-but-not-exact (cosine < 1) pairs")
    assert(!expected.exists(p => p._1 >= 200000 && p._1 < 300000),
      "negated decoys must never survive the exact verify")
  }

  test("the registered query's optimized path equals the public composition") {
    // round-17 optimization: dedup_incremental caches the batch band rows
    // (probe + closing append share one computation). Same rows, same
    // index contents as the public appendToIndex/dedupAgainstIndex
    // composition. (A further left-semi verify restriction was measured a
    // regression and reverted — OPTIMIZATION_r17.md §2b.)
    val viaQuery = ops.IncrementalDedupOps.queries("dedup_incremental")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val idx = s"${tmpDir("idx_eq_")}/index"
    val corpus = docs.where(s"NOT (${ops.IncrementalDedupOps.BatchPred})")
    val batch = docs.where(ops.IncrementalDedupOps.BatchPred)
    ops.IncrementalDedupOps.appendToIndex(corpus, idx)
    val viaPublic = ops.IncrementalDedupOps.dedupAgainstIndex(batch, corpus, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaQuery == viaPublic && viaPublic.nonEmpty,
      s"optimized path diverged: query=$viaQuery public=$viaPublic")
  }

  test("batch-vs-index dedup equals the exhaustive batch×corpus Jaccard join") {
    val idx = s"${tmpDir("idx_spec_")}/index"
    val corpus = docs.where(s"NOT (${ops.IncrementalDedupOps.BatchPred})")
    val batch = docs.where(ops.IncrementalDedupOps.BatchPred)
    ops.IncrementalDedupOps.appendToIndex(corpus, idx)
    val got = ops.IncrementalDedupOps.dedupAgainstIndex(batch, corpus, idx)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every batch×corpus pair, exact shingle Jaccard
    val nSh = ops.DedupOps.shingled(batch)
      .select(col("doc_id").as("new_id"), col("sh_hashes").as("n_sh"))
    val cSh = ops.DedupOps.shingled(corpus)
      .select(col("doc_id").as("corpus_id"), col("sh_hashes").as("c_sh"))
    val expected = nSh.crossJoin(cSh)
      .select(col("new_id"), col("corpus_id"),
        graft.functions.TextFunctions.jaccard(col("n_sh"), col("c_sh")).as("j"))
      .where(col("j") >= 0.5)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must exercise at least one cross-split pair")
  }
}
