package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inverted-index retrieval must equal a driver-side brute-force scan of
  * every document, and its plan must keep the query-term filter broadcast
  * (never a cartesian).
  */
class SearchSpec extends AnyFunSuite {
  import SparkTestBase._

  private def corpus: Array[(Long, Array[String])] =
    Tables.load(spark, Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)))

  test("ranked retrieval equals the brute-force tf-rarity scan") {
    val docs = corpus
    val n = docs.length.toLong
    val byQuery = ops.SearchOps.SearchQueries.groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    // brute force: per (query, doc) score = sum_t tf * (n - df + 1)
    val expected = byQuery.toSeq.flatMap { case (qid, terms) =>
      val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
      docs.flatMap { case (id, ws) =>
        val score = terms.map(t => ws.count(_ == t).toLong * (n - df(t) + 1)).sum
        // docs matching no term never enter the posting join
        if (terms.exists(t => ws.contains(t))) Some((qid, id, score)) else None
      }.sortBy { case (_, id, s) => (-s, id) }.take(ops.SearchOps.TopK)
        .zipWithIndex.map { case ((q, id, s), i) => (q, id, s, i + 1) }
    }.toSet
    val engine = ops.SearchOps.queries("search_invindex_topk")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(engine == expected)
    assert(engine.nonEmpty)
    // the absent-term query must contribute nothing
    assert(!engine.exists(_._1 == 4))
  }

  test("keyword extraction equals the brute-force (tf desc, df asc, word) rank") {
    val docs = corpus
    val df = docs.flatMap(_._2.distinct).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val expected = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .map { case (w, tf) => (w, tf, df(w)) }
        .sortBy { case (w, tf, d) => (-tf, d, w) }
        .take(ops.SearchOps.KwPerDoc)
        .zipWithIndex.map { case ((w, tf, d), i) => (id, i + 1, w, tf, d) }
    }.toSet
    val engine = ops.SearchOps.queries("ta_tfidf_topk")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(engine == expected)
    assert(engine.nonEmpty)
  }

  test("retrieval plan broadcasts the term list and never goes cartesian") {
    val plan = ops.SearchOps.queries("search_invindex_topk")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("phrase search equals a brute-force sliding-window scan") {
    val engine = ops.SearchOps.queries("search_phrase")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val phrase = ops.SearchOps.Phrase
    val expected = Tables.load(spark, Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        r.getLong(0) -> w.sliding(phrase.length)
          .count(win => win.length == phrase.length && win == phrase)
      }
      .filter(_._2 > 0).map { case (id, n) => id -> n.toLong }.toMap
    assert(engine == expected, s"engine $engine vs truth $expected")
    assert(engine.nonEmpty, "the pinned phrase must occur at sf0.001")
    val plan = ops.SearchOps.queries("search_phrase")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"adjacency must stay an equi-join on (doc_id, offset)\n${plan.take(800)}")
  }

  test("hybrid fusion: candidate-bounded, both retrievers contribute, plan shape") {
    import ops.SearchOps._
    val df = ops.SearchOps.queries("search_hybrid_fusion")(spark, Sf0001)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(rows.nonEmpty)
    // exactly K fused hits per query doc, ranks total and 1-based
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length == FusionTopK, s"query $q returned ${rs.length} rows")
      assert(rs.map(_._2).sorted.toSeq == (1 to FusionTopK), s"ranks not dense for $q")
    }
    // ranks never exceed the miss sentinel, borda is their exact sum,
    // and the query doc never retrieves itself
    rows.foreach { case (q, _, d, rl, rv, b) =>
      assert(d != q, s"query $q retrieved itself")
      assert(rl >= 1 && rl <= FusionMissRank && rv >= 1 && rv <= FusionMissRank)
      assert(b == rl + rv, s"borda $b != $rl + $rv")
    }
    // fusion is non-degenerate at sf0.001: at least one fused hit came
    // from each retriever's list (not all misses on either side)
    assert(rows.exists(_._4 < FusionMissRank), "no lexical candidate survived fusion")
    assert(rows.exists(_._5 < FusionMissRank), "no vector candidate survived fusion")
    // plan: lexical leg is a broadcast hash join on the shingle key; the
    // only nested-loop is the deliberate broadcast of |queries| code rows
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }
}
