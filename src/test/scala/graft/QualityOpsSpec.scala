package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-screening selection ops: PII scrubbing, vocabulary induction,
  * per-language quality top-K.
  */
class QualityOpsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("pii redaction leaves no matchable contact strings and counts the fixture") {
    val out = ops.TextAnalysisOps.queries("ta_pii_redact")(spark, Sf0001).cache()
    // redacted text must not match either pattern again (idempotent scrub)
    val residue = out.where(
      col("redacted").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
        col("redacted").rlike("\\+?[0-9][0-9() -]{6,}[0-9]"))
    assert(residue.count() == 0, "redacted output still contains PII matches")
    val fixture = out.where(col("doc_id") >= 9000000L)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(fixture(9000001L) == ((2, 0)))
    assert(fixture(9000002L) == ((0, 2)))
    assert(fixture(9000003L) == ((1, 1)))
    assert(fixture(9000004L) == ((0, 0)))
    // the raw corpus is letters-only: every count outside the fixture is 0
    assert(out.where(col("doc_id") < 9000000L &&
      (col("n_emails") =!= 0 || col("n_phones") =!= 0)).count() == 0)
    out.unpersist()
  }

  test("vocab top-K is frequency-sorted and mass-consistent with the corpus") {
    val rows = ops.TextAnalysisOps.queries("ta_vocab_topk")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq, "not sorted by n desc")
    // every reported count equals the independently-computed corpus count
    val truth = Tables.load(spark, Sf0001, "documents")
      .select(explode(functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (w, n) => assert(truth(w) == n, s"count mismatch for '$w'") }
  }

  test("quality top-K keeps exactly K contiguously-ranked docs per language") {
    val rows = ops.TextAnalysisOps.queries("mix_topk_quality")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (lang, members) =>
      assert(members.length == 5, s"$lang: expected 5 rows")
      assert(members.map(_._2).sorted.toSeq == (1 to 5).toSeq, s"$lang: ranks not 1..5")
      val byRank = members.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"$lang: quality not non-increasing in rank")
    }
    // selected docs really are the best: no unselected doc beats a selected one
    val quality = ops.TextAnalysisOps.queries("ta_quality_score")(spark, Sf0001)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val langOf = Tables.load(spark, Sf0001, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
    rows.groupBy(_._1).foreach { case (lang, members) =>
      val selected = members.map(_._3).toSet
      val worstSelected = members.map(m => (quality(m._3), -m._3)).min(ord)
      langOf.collect { case (id, l) if l == lang && !selected.contains(id) => id }
        .foreach { id =>
          assert(ord.lteq((quality(id), -id), worstSelected),
            s"$lang: unselected doc $id outranks a selected doc")
        }
    }
  }

  // replays standard greedy left-to-right BPE merge application — which
  // the engine now matches exactly: its two replace passes per merge
  // catch the back-to-back repeat a single non-overlapping replace would
  // miss, so [a,b,a,b] -> [ab, ab] like every reference tokenizer.
  private def applyMerge(syms: List[String], l: String, r: String): List[String] = syms match {
    case a :: b :: rest if a == l && b == r => (l + r) :: applyMerge(rest, l, r)
    case a :: rest => a :: applyMerge(rest, l, r)
    case Nil => Nil
  }

  test("BPE encode tokenizes every document with the learned merges") {
    val merges = ops.TextAnalysisOps.queries("ta_bpe_merges")(spark, Sf0001)
      .collect().map(r => (r.getString(1), r.getString(2))).toList
    val docWords = Tables.load(spark, Sf0001, "documents")
      .select(col("doc_id"), explode(functions.TextFunctions.tokens(col("text"))).as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tokCount = docWords.map(_._2).distinct.map { w =>
      val enc = merges.foldLeft(w.map(_.toString).toList) {
        case (syms, (l, r)) => applyMerge(syms, l, r)
      }
      w -> enc.size.toLong
    }.toMap
    val expected = docWords.groupBy(_._1).map { case (id, ws) =>
      (id, ws.length.toLong, ws.map(x => tokCount(x._2)).sum, ws.map(_._2.length.toLong).sum)
    }.toSet
    val engine = ops.TextAnalysisOps.queries("ta_bpe_encode")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(engine == expected)
    // the merges genuinely compress: strictly fewer tokens than characters
    val (toks, chars) = (engine.toSeq.map(_._3).sum, engine.toSeq.map(_._4).sum)
    assert(toks < chars, s"encode produced $toks tokens over $chars chars — no merge fired")
  }

  test("BPE merges equal a driver-side reference implementation") {
    val engine = ops.TextAnalysisOps.queries("ta_bpe_merges")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    // reference: exact BPE with greedy left-to-right non-overlapping merges
    var words: Map[List[String], Long] = Tables.load(spark, Sf0001, "documents")
      .select(explode(functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0).map(_.toString).toList -> r.getLong(1)).toMap
    val expected = (1 to ops.TextAnalysisOps.BpeRounds).map { k =>
      val counts = words.toSeq.flatMap { case (syms, wf) =>
        syms.zip(syms.drop(1)).map(p => p -> wf)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val ((l, r), n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
      words = words.toSeq.map { case (syms, wf) => applyMerge(syms, l, r) -> wf }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (k, l, r, n)
    }
    assert(engine.toSeq == expected, s"engine ${engine.toSeq} vs reference $expected")
  }

  test("LM familiarity: integer invariants, mass conservation, and join shape") {
    val out = ops.TextAnalysisOps.queries("ta_lm_familiarity")(spark, Sf0001).cache()
    val docs = Tables.load(spark, Sf0001, "documents")
    assert(out.count() == docs.count(), "every document must be scored, even shingle-less ones")
    // df >= 1 for every gram, so familiarity dominates the gram count;
    // novelty is the df==1 subset of the same grams
    assert(out.where(col("familiarity") < col("n_shingles") ||
      col("n_novel") > col("n_shingles")).count() == 0)
    // conservation: sum of per-doc gram counts == total distinct-per-doc
    // shingle instances in the corpus (the model's total df mass)
    val scoredMass = out.agg(sum(col("n_shingles"))).collect()(0).getLong(0)
    val corpusMass = ops.DedupOps.shingled(docs.select(col("doc_id"), col("text")))
      .select(explode(col("sh_hashes"))).count()
    assert(scoredMass == corpusMass, s"gram mass mismatch: $scoredMass vs $corpusMass")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"scoring must stay an equi-join on the gram hash\n${plan.take(800)}")
    out.unpersist()
  }
}
