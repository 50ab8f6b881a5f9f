package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.operators.VectorSearch

/** Plan-quality regression tests (SURVEY §4.2's "free" optimizations must
  * STAY free): predicate pushdown reaching the parquet scan, column
  * pruning, broadcast joins for small dims, map-side partial aggregation,
  * whole-stage codegen, and the absence of all-pairs joins in every
  * vector/dedup path. These assert the plan SHAPE, so a future change
  * that silently de-optimizes (e.g. a cast blocking pushdown, a join
  * falling back to nested-loop) fails the suite rather than the bench. */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf001)

  test("q02: filters push down to the parquet scan; scan is column-pruned") {
    val plan = formatted(q("q02_filter_revenue"))
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed")
    assert(plan.contains("LessThan(l_quantity,24.0)"), "quantity bound not pushed")
    // lineitem has 16 columns; the scan must read only the 4 referenced.
    val read = plan.linesIterator.find(_.startsWith("ReadSchema")).getOrElse("")
    assert(read.count(_ == ',') == 3, s"scan reads more than 4 columns: $read")
  }

  test("q03: dimension join is a broadcast hash join, not sort-merge") {
    val plan = q("q03_segment_revenue").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q01: aggregation is map-side partial + whole-stage codegen") {
    val df = q("q01_pricing_summary")
    assert(df.queryExecution.executedPlan.toString.contains("partial_sum"),
      "no map-side combine before the shuffle")
    // codegen stage markers (*(n)) appear in the FINAL adaptive plan only
    // after execution
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"))
    assert(finalPlan.contains("*("), s"no whole-stage codegen span:\n${finalPlan.take(1500)}")
  }

  test("search path has no cartesian/nested-loop join and no q×n shuffle") {
    // params chosen to NOT match the cached searchFrame plan fragment, so
    // the assertion sees the real operator, not an InMemoryTableScan
    val plan = VectorSearch.topK(spark, sf001, maxQueryId = 50, k = 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the search executes on the planned kernel operator
    assert(plan.contains("CosineCandidatesExec"), s"kernel exec missing from plan:\n${plan.take(1200)}")
  }

  test("bucketed range join (q38) is an equi-join, not a nested loop") {
    val plan = q("q38_range_join").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "range join fell back to all-pairs")
    assert(plan.contains("Join") || plan.contains("ShuffledHashJoin") ||
      plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("text-pipeline queries reuse the memoized shingle frame (no recompute)") {
    // VERDICT r3 #7: pin the memo hit with a plan assertion — if the
    // cached shingle projection stops hitting, every text query silently
    // re-runs the per-doc shingle transform and the suite drifts up
    q("q22_jaccard_neardup").collect() // populates the session memo
    for (name <- Seq("q23_minhash_lsh_neardup", "q56_boilerplate")) {
      val plan = q(name).queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"$name: shingle memo not hit — plan recomputes the shingle transform:\n${plan.take(1200)}")
    }
  }

  test("events scan prunes unread columns (q15 reads 3 of 6)") {
    val plan = formatted(q("q15_events_hourly"))
    val read = plan.linesIterator.find(_.startsWith("ReadSchema")).getOrElse("")
    assert(!read.contains("props"), s"unused props column read: $read")
    assert(!read.contains("event_id"), s"unused event_id column read: $read")
  }

  test("decontamination (q51): corpus joins are broadcast — no sort-merge, no corpus shuffle") {
    val plan = q("q51_decontaminate").queryExecution.executedPlan.toString
    // the eval gram set and the contaminated-id set build the hash sides;
    // the exploded corpus side streams through both joins map-side
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), "corpus-side shuffle crept into the semi-join")
    assert(!plan.contains("CartesianProduct"))
    // the broadcast carries 31-bit gram HASHES, never the gram string:
    // no gram/text column may ride any Exchange (broadcast included)
    val formattedPlan = formatted(q("q51_decontaminate"))
    val lines = formattedPlan.linesIterator.toSeq
    val exchangeInputs = lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) (Broadcast)?Exchange.*""") => lines(i + 1)
    }
    assert(exchangeInputs.nonEmpty, "no Exchange details found in formatted q51 plan")
    exchangeInputs.foreach { in =>
      assert(!in.contains("gram#") && !in.contains("text#"),
        s"gram/text string rides an exchange: $in")
    }
  }

  test("language ID (q62): no gram strings exist; only the doc rebalance moves text; profile joins broadcast") {
    val formattedPlan = formatted(q("q62_langid_ngram"))
    val lines = formattedPlan.linesIterator.toSeq
    // trigram CODES are computed straight off the text (no gram string
    // column is ever materialized), so the only exchange allowed to carry
    // text is the deliberate under-parallel-input rebalance, which hashes
    // by doc_id; every other exchange moves integers/partial aggs only
    val exchanges = lines.zipWithIndex.collect {
      // formatted mode: "(n) Exchange" header, then Input [...], then
      // "Arguments: hashpartitioning(...)" — keep both detail lines
      case (l, i) if l.matches("""\(\d+\) (Broadcast)?Exchange.*""") =>
        (l, lines(i + 1), lines.drop(i + 1).take(3).find(_.startsWith("Arguments:")).getOrElse(""))
    }
    assert(exchanges.nonEmpty)
    val textPayload = """(\[|, )text#""".r
    exchanges.foreach { case (header, in, args) =>
      if (textPayload.findFirstIn(in).isDefined)
        assert(args.contains("hashpartitioning(doc_id"),
          s"text rides a non-rebalance exchange: $header / $in / $args")
    }
    assert(!formattedPlan.contains(" g#"), "a gram string column materialized")
    // the L×K language-profile side must broadcast, never sort-merge
    assert(formattedPlan.contains("BroadcastHashJoin"))
    assert(!formattedPlan.contains("SortMergeJoin"),
      "profile scoring fell back to a sort-merge join")
    assert(!formattedPlan.contains("CartesianProduct"))
  }

  test("length chunking (q60): map-side explode, single aggregate shuffle, no text in any exchange") {
    val formattedPlan = formatted(q("q60_length_chunk"))
    val lines = formattedPlan.linesIterator.toSeq
    // chunking itself is narrow (split -> slice -> posexplode): the only
    // exchanges are the per-source aggregate's hash shuffle and the final
    // orderBy's range exchange — a countDistinct-style two-phase doc
    // dedup shuffle must NOT reappear
    val exchanges = lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") => lines(i + 1)
    }
    assert(exchanges.length <= 2, s"chunking shuffled more than agg+sort: $exchanges")
    assert(!exchanges.exists(_.contains("doc_id#")),
      s"per-doc dedup shuffle crept into q60: $exchanges")
    // and that shuffle carries partial-agg rows, never the text or the
    // chunk word arrays
    val payload = """(\[|, )(text|chunk_words)#""".r
    exchanges.foreach { in =>
      assert(payload.findFirstIn(in).isEmpty,
        s"text/chunk payload rides the aggregate exchange: $in")
    }
    assert(formattedPlan.contains("Generate"), "posexplode missing — chunking not map-side")
  }

  test("sequence packing (q53): window partitions by (source, shard), text not in any shuffle") {
    val plan = formatted(q("q53_sequence_pack"))
    assert(plan.contains("Window"), "running-sum window missing")
    assert(plan.contains("windowspecdefinition(source"), "window not partitioned by source")
    // the shuffles carry metadata only — text collapses into the
    // scan-side projection (n_tok) and must not ride any Exchange
    val lines = plan.linesIterator.toSeq
    val exchangeInputs = lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") => lines(i + 1)
    }
    assert(exchangeInputs.nonEmpty, "no Exchange details found in formatted plan")
    exchangeInputs.foreach { in =>
      assert(!in.contains("text#"), s"raw text column rides a shuffle: $in")
    }
  }

  test("boilerplate (q56): inverted-index joins only — no all-pairs join, gram strings never shuffle") {
    val plan = q("q56_boilerplate").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in q56:\n${plan.take(2000)}")
    // the df/hot-set joins key on the 31-bit hash; the shuffled row must
    // be (doc_id, h) — the gram string stays in the map-side projection.
    // The ONE exchange allowed to carry text is the deliberate
    // under-parallel-input rebalance (hashpartitioning by doc_id) the
    // shared shingle frame runs before its expansion.
    val formattedPlan = formatted(q("q56_boilerplate"))
    val lines = formattedPlan.linesIterator.toSeq
    lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") =>
        (lines(i + 1),
          lines.drop(i + 1).take(3).find(_.startsWith("Arguments:")).getOrElse(""))
    }.foreach { case (in, args) =>
      if (in.contains("text#"))
        assert(args.contains("hashpartitioning(doc_id"),
          s"text rides a non-rebalance exchange: $in / $args")
      assert(!in.contains(" g#") && !in.contains(" s#"),
        s"gram column rides a shuffle: $in")
    }
  }

  test("SemDeDup (q66): equi hash join on the cluster key — no cartesian, no nested loop") {
    val plan = q("q66_semantic_dedup").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q66 pair generation fell back to all-pairs:\n${plan.take(2000)}")
    // the within-cluster self-join must key on centroid_id — an equi join
    assert(plan.contains("Join"), "expected the cluster-scoped self-join in the plan")
  }

  test("range search (v24) and semantic decontam (q68): corpus-side scoring never shuffles") {
    // the scoring pass is a narrow mapPartitions over the corpus: the only
    // Exchanges allowed are AFTER the bounded hit set exists (distinct /
    // census aggregations and the display sort)
    Seq("v24_range_search", "q68_semantic_decontam").foreach { name =>
      val df = q(name)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name fell back to all-pairs")
      val formattedPlan = formatted(df)
      val lines = formattedPlan.linesIterator.toSeq
      lines.zipWithIndex.collect {
        case (l, i) if l.matches("""\(\d+\) Exchange.*""") => lines(i + 1)
      }.foreach { in =>
        assert(!in.contains("vec#") && !in.contains("embedding#"),
          s"$name: an embedding column rides a shuffle: $in")
      }
    }
  }

  test("serving surfaces (v28/v29/v30): no cartesian, bounded sides broadcast") {
    Seq("v28_search_after", "v29_facet_counts", "v30_knn_graph").foreach { name =>
      val plan = q(name).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name fell back to all-pairs:\n${plan.take(1500)}")
    }
    // v29's hit set (q×k rows) must be the broadcast side of its label join
    val v29 = q("v29_facet_counts").queryExecution.executedPlan.toString
    assert(v29.contains("BroadcastHashJoin"),
      s"v29 hit join should broadcast the bounded hit set:\n${v29.take(1500)}")
  }

  test("graph-refined search (v33): no cartesian; bounded candidates broadcast, corpus never does") {
    val df = q("v33_graph_refined")
    val plan = df.queryExecution.executedPlan.toString
    // the only nested-loop allowed is the q×C probe selection inside the
    // seed search (both sides tiny, deliberate — same shape as v09); a
    // CartesianProduct anywhere means a corpus-sized all-pairs fallback
    assert(!plan.contains("CartesianProduct"),
      s"v33 fell back to all-pairs:\n${plan.take(2000)}")
    // the q·k·(1+g)-bounded candidate frame is the broadcast side of the
    // corpus vector fetch; the graph build underneath stays a shuffle
    // equi-join (neither side broadcast — both are corpus-sized)
    assert(plan.contains("BroadcastHashJoin"),
      s"v33 candidate fetch should broadcast the bounded candidate set:\n${plan.take(2000)}")
    // NOTE deliberately NOT asserted: whether the graph build's
    // probe×assignment join broadcasts. That choice is size-based —
    // Catalyst broadcasts the 500-row fixture corpus (correct here) and
    // shuffle-joins a real corpus (correct there); pinning either side
    // would freeze a scale-variant decision. The scale-invariant
    // property is the equi-join itself: no cartesian, asserted above.
  }

  test("domain clustering (q57): join-free broadcast kernel — only the K-row census shuffles") {
    val df = q("q57_domain_cluster")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"q57 should be join-free (broadcast argmax kernel):\n${plan.take(2000)}")
    // embeddings must not ride the census shuffle: the agg input is
    // (centroid_id, score) only
    val formattedPlan = formatted(df)
    val lines = formattedPlan.linesIterator.toSeq
    lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") => lines(i + 1)
    }.foreach { in =>
      assert(!in.contains("vec#") && !in.contains("embedding#"),
        s"embedding column rides a shuffle: $in")
    }
  }

  test("span/prefix/divergence queries (q78/q79/q82): hash-only shuffles, no all-pairs join") {
    for (name <- Seq("q78_dup_span_fraction", "q79_ppjoin_neardup", "q82_source_divergence")) {
      val formattedPlan = formatted(q(name))
      assert(!formattedPlan.contains("CartesianProduct"), s"$name has a cartesian join")
      // q82's single BroadcastNestedLoopJoin is the deliberate 1-row
      // grand-total cross join (bounded by construction); the span/prefix
      // queries must have none at all
      if (name != "q82_source_divergence")
        assert(!formattedPlan.contains("BroadcastNestedLoopJoin"),
          s"$name has an all-pairs join")
      // window/span/token STRINGS must never ride an exchange — only
      // 24-char PortableHashes (longs) and the doc rebalance may move
      val lines = formattedPlan.linesIterator.toSeq
      val exchanges = lines.zipWithIndex.collect {
        case (l, i) if l.matches("""\(\d+\) (Broadcast)?Exchange.*""") =>
          (lines(i + 1),
            lines.drop(i + 1).take(3).find(_.startsWith("Arguments:")).getOrElse(""))
      }
      assert(exchanges.nonEmpty, s"no Exchange details found for $name")
      val textPayload = """(\[|, )(text|win|tok|token)#""".r
      exchanges.foreach { case (in, args) =>
        if (textPayload.findFirstIn(in).isDefined)
          assert(args.contains("hashpartitioning(doc_id"),
            s"$name: text/window strings ride a non-rebalance exchange: $in / $args")
      }
    }
  }

  test("Bloom screen (q83): bit set and known set broadcast; arriving spans never shuffle to them") {
    val formattedPlan = formatted(q("q83_bloom_span_screen"))
    assert(!formattedPlan.contains("CartesianProduct"))
    // all four membership joins are broadcast — the probe side must not
    // shuffle for the bounded filter state
    assert(formattedPlan.contains("BroadcastHashJoin"))
    assert(!formattedPlan.contains("SortMergeJoin"),
      "a membership join fell back to sort-merge (filter state not broadcast)")
  }

  test("leakage-free split (q84): canonical join is the only wide op on the doc frame") {
    val formattedPlan = formatted(q("q84_leakage_free_split"))
    assert(!formattedPlan.contains("CartesianProduct") &&
      !formattedPlan.contains("BroadcastNestedLoopJoin"),
      "q84 has an all-pairs join")
  }
}
