package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared posting-list machinery for inverted-index candidate generation
  * (df-capped near-dup Jaccard in [[TextPipeline]], winnowing-fingerprint
  * overlap pairs in [[Fingerprint]]).
  */
object Postings {

  /** All ordered (doc_a < doc_b) pairs of a posting list, as an array of
    * `struct(doc_a, doc_b)` — `explode` it to emit candidate pairs in
    * place from the grouped aggregation, with no second self-join of the
    * token frame. Σ pairs ≤ dfCap × Σdf when the caller df-caps first.
    *
    * `sortedDocs` MUST already be sorted ascending, in its OWN projection:
    * Catalyst re-evaluates free subexpressions inside higher-order-function
    * lambdas per element, so an inline `array_sort(docs)` here would
    * re-sort the list once per element (the same trap documented at
    * [[TextPipeline]]'s shingle tokenization). Ascending order is what
    * makes the emitted pairs satisfy doc_a < doc_b.
    */
  def pairStructs(sortedDocs: Column): Column =
    flatten(transform(sortedDocs, (x, i) =>
      transform(slice(sortedDocs, i + lit(2), size(sortedDocs) - i - lit(1)), y =>
        struct(x.as("doc_a"), y.as("doc_b")))))
}
