package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session-keyed memo every fixture/plan cache rides on: per-session
  * isolation, build-once semantics, and the stopped-context sweep that
  * stands in for weak-key collection when values capture their session.
  */
class SessionMemoSpec extends AnyFunSuite {
  import SparkTestBase._

  test("builds once per (session, key) and isolates keys") {
    val memo = new graft.util.SessionMemo[String, String]
    var builds = 0
    def get(k: String) = memo.getOrElseUpdate(spark, k) { builds += 1; s"v-$k" }
    assert(get("a") == "v-a" && get("a") == "v-a")
    assert(builds == 1, "same key must build once")
    assert(get("b") == "v-b")
    assert(builds == 2, "distinct keys build independently")
  }

  test("sessions are isolated memo keys; each builds its own entry") {
    val memo = new graft.util.SessionMemo[String, Int]
    var builds = 0
    assert(memo.getOrElseUpdate(spark, "k") { builds += 1; 1 } == 1)
    // newSession shares the SparkContext but is a DISTINCT session object —
    // the memo must not leak one session's fixtures into another
    val other = spark.newSession()
    assert(memo.getOrElseUpdate(other, "k") { builds += 1; 2 } == 2)
    assert(builds == 2, "second session must build its own entry")
    // and neither session's entry disturbed the other's
    assert(memo.getOrElseUpdate(spark, "k") { builds += 1; -1 } == 1)
    assert(memo.getOrElseUpdate(other, "k") { builds += 1; -1 } == 2)
    assert(builds == 2)
  }
}
