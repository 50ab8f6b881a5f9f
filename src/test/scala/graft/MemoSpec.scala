package graft

import graft.operators.Pq

/** Lifecycle of the session-scoped memos — in particular that entries die
  * with their session WITHOUT requiring a later memo call (VERDICT r6
  * wrong #3: Pq's private codebook cache pinned the last session's
  * codebook until JVM exit because its sweep only ran inside a later
  * `codebook()` call). The shared test JVM can't stop its single real
  * SparkContext per test, so ApplicationEnd is delivered to the hooked
  * listener directly — the exact call the listener bus makes at context
  * stop. */
class MemoSpec extends SparkSpec {

  test("cachedValue builds once per (session, key) and returns the same instance") {
    val s2 = spark.newSession()
    var builds = 0
    def get() = Memo.cachedValue(s2, "memo-spec-count") { builds += 1; Array(1, 2, 3) }
    val a = get()
    val b = get()
    assert(builds == 1 && (a eq b))
    Memo.drop(s2)
  }

  test("ApplicationEnd drops value entries with no further memo call") {
    val s2 = spark.newSession()
    var builds = 0
    def get() = Memo.cachedValue(s2, "memo-spec-end") { builds += 1; Array(7) }
    val a = get()
    assert(builds == 1 && Memo.ownedBy(s2) == 1)
    Memo.fireApplicationEnd(s2)
    // the entry is gone NOW — no cachedValue/cached call in between
    assert(Memo.ownedBy(s2) == 0)
    val c = get()
    assert(builds == 2 && !(c eq a))
    Memo.drop(s2)
  }

  test("Pq codebook is lifecycle-managed: memoized, dropped at ApplicationEnd, retrainable") {
    val s2 = spark.newSession()
    val cb1 = Pq.codebook(s2, sf0001)
    assert(cb1.length == Pq.Codes)
    assert(Pq.codebook(s2, sf0001) eq cb1, "second call retrained instead of memo hit")
    assert(Memo.ownedBy(s2) >= 1)
    Memo.fireApplicationEnd(s2)
    assert(Memo.ownedBy(s2) == 0, "codebook entry survived session end")
    val cb2 = Pq.codebook(s2, sf0001)
    assert(!(cb2 eq cb1), "entry not rebuilt after drop")
    // training is deterministic, so the retrained codebook is equal
    assert(cb1.map(_._1).sameElements(cb2.map(_._1)))
    assert(cb1.zip(cb2).forall { case ((_, v1), (_, v2)) => v1.sameElements(v2) })
    Memo.drop(s2)
  }
}
