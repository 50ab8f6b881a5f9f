package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams
import graft.streaming.Streams.Event

/** The streaming transforms must produce the SAME result when the events
  * arrive as a stream (across multiple micro-batches, carrying state) as
  * when they run in one batch — that equivalence is the whole point of
  * writing the transform once (SURVEY §2.11 / Streams scaladoc). */
/** Streamed doc row for the near-dup test (top-level: Encoder derivation
  * can't see method-local case classes). */
case class StreamDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

class StreamingSpec extends SparkSpec {

  private def fixtureEvents: Seq[Event] = {
    Streams.typedEvents(spark, sf0001).collect().toSeq
  }

  test("hourly window agg: streamed micro-batches == batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents
    val stream = MemoryStream[Event]
    val q = Streams
      .hourlyAgg(stream.toDF(), watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("hourly_out").outputMode("complete").start()
    try {
      // feed in three micro-batches to exercise state carry-over
      val chunks = events.grouped(math.max(1, events.size / 3 + 1)).toSeq
      chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
      val streamed = spark.table("hourly_out")
        .select($"hour", $"event_type", $"cnt", $"total_value")
        .collect().map(_.toSeq).toSet
      val batch = Streams.hourlyAgg(Tables(spark, sf0001, "events"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stateful latest-per-user: streamed state across batches == batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents
    val stream = MemoryStream[Event]
    val q = Streams.latestPerUser(stream.toDS())
      .toDF("user_id", "event_id", "event_type")
      .writeStream.format("memory").queryName("latest_out").outputMode("update").start()
    try {
      // two batches split so many users appear in BOTH (state must merge)
      val (a, b) = events.sortBy(_.ts_ns).splitAt(events.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      // update mode emits per-batch rows; the latest row per user wins
      val streamed = spark.table("latest_out")
        .withColumn("ord", monotonically_increasing_id())
        .orderBy($"ord".desc)
        .dropDuplicates("user_id")
        .select($"user_id", $"event_id", $"event_type")
        .collect().map(_.toSeq).toSet
      val batch = Streams.latestPerUser(Streams.typedEvents(spark, sf0001))
        .toDF("user_id", "event_id", "event_type")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming near-dup flags across micro-batches == batch q47 (id-ordered arrival)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // synthetic event times in doc_id order: arrival order == id order,
    // which is exactly q47's batch proxy
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, t) => StreamDoc(id, t, new java.sql.Timestamp(1700000000000L + id * 1000L)) }
    val stream = MemoryStream[StreamDoc]
    val q = Streams
      .streamingNearDup(stream.toDF(), watermark = "1 hour", stateTtlMs = 3600L * 1000L)
      .writeStream.format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      val chunks = docs.grouped(math.max(1, docs.length / 3 + 1)).toSeq
      chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
      val streamed = spark.table("neardup_out")
        .groupBy($"doc_id").agg(min($"owner").as("dup_of"))
        .as[(Long, Long)].collect().toMap
      val batch = SparkEntry.queries("q47_lsh_dup_flags")(spark, sf0001)
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup: first arrival across micro-batches == batch firstPerKey") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // feed in (micros ts, event_id) order so first ARRIVAL == first BY TS
    val events = fixtureEvents.sortBy(e => (e.ts_ns / 1000, e.event_id))
    val stream = MemoryStream[Event]
    val q = Streams
      // watermark must cover the fixture's whole event-time span: within-
      // watermark dedup re-emits a duplicate whose predecessor's state was
      // already evicted, and here we want exact parity with batch firstPerKey
      .streamingDedup(stream.toDF(), Seq("user_id", "event_type"), watermark = "365 days")
      .select($"user_id", $"event_type", $"event_id")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val chunks = events.grouped(math.max(1, events.size / 3 + 1)).toSeq
      chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
      val streamed = spark.table("dedup_out").collect().map(_.toSeq).toSet
      val batch = Streams
        .firstPerKey(Tables(spark, sf0001, "events"), Seq("user_id", "event_type"))
        .select($"user_id", $"event_type", $"event_id")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("session-window agg: streamed micro-batches == batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents
    val stream = MemoryStream[Event]
    val q = Streams
      .sessionAgg(stream.toDF(), gap = "12 hours", watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("sessions_out").outputMode("complete").start()
    try {
      // three micro-batches: open sessions must merge state across them
      val chunks = events.sortBy(_.ts_ns).grouped(math.max(1, events.size / 3 + 1)).toSeq
      chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
      val streamed = spark.table("sessions_out").collect().map(_.toSeq).toSet
      val batch = Streams.sessionAgg(Tables(spark, sf0001, "events"), "12 hours")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.size > events.map(_.user_id).distinct.size, "degenerate: one session per user")
    } finally q.stop()
  }

  test("stream-stream interval join across micro-batches == batch q72") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ts-ordered feed: nothing ever arrives late, so watermark eviction
    // (which only drops rows that could no longer match a NON-late row)
    // cannot cost a match — streamed must equal batch exactly
    val events = fixtureEvents.sortBy(e => (e.ts_ns, e.event_id))
    val stream = MemoryStream[Event]
    val df = stream.toDF().withWatermark("ts", "1 hour")
    val joined = Streams.intervalJoin(
      df.filter($"event_type" === "click"),
      df.filter($"event_type" === "purchase"),
      "6 HOURS")
    val q = joined.writeStream
      .format("memory").queryName("sjoin_out").outputMode("append").start()
    try {
      val chunks = events.grouped(math.max(1, events.size / 4 + 1)).toSeq
      chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
      val streamed = spark.table("sjoin_out").collect().map(_.toSeq).toSet
      val batch = SparkEntry.queries("q72_stream_join_batch")(spark, sf0001)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming Bloom bits: set-union state across micro-batches == batch bit set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // span hashes from the fixture corpus — the exact frame q83's filter
    // is built from, here arriving as an unbounded stream
    val spans = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), org.apache.spark.sql.functions.explode(col("ws")).as("w"))
      .select(col("doc_id"), graft.functions.PortableHash.hash(col("w")).as("wh"))
    val a = Seq(1103515245L, 1140671485L, 214013L)
    val b = Seq(12345L, 12820163L, 2531011L)
    val m = 1L << 16
    val batch = Streams.bloomBits(spans, a, b, m).collect().map(_.getLong(0)).toSet
    val whs = spans.select("doc_id", "wh").as[(Long, Long)].collect().toSeq
    val stream = MemoryStream[(Long, Long)]
    val q = Streams.bloomBits(stream.toDF().toDF("doc_id", "wh"), a, b, m)
      .writeStream.format("memory").queryName("bloom_out").outputMode("append").start()
    try {
      val chunks = whs.grouped(math.max(1, whs.size / 4 + 1)).toSeq
      chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
      val streamed = spark.table("bloom_out").collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("HLL shard merge: register-max over per-shard sketches == sketch of the union") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "events")
    val whole = Streams.hllRegisters(e).collect().map(_.toSeq).toSet
    val a = Streams.hllRegisters(e.filter($"user_id" % 2 === 0))
    val b = Streams.hllRegisters(e.filter($"user_id" % 2 === 1))
    val merged = a.unionByName(b)
      .groupBy($"event_type", $"reg")
      .agg(org.apache.spark.sql.functions.max($"mrho").as("mrho"))
      .collect().map(_.toSeq).toSet
    // the mergeability claim made in the q77/q80 scaladoc, pinned: shard
    // sketches combine losslessly by register max
    assert(merged == whole)
  }

  test("streaming HLL registers: state after all micro-batches == batch registers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents
    val stream = MemoryStream[Event]
    val q = Streams.hllRegisters(stream.toDF())
      .writeStream.format("memory").queryName("hll_out").outputMode("complete").start()
    try {
      val chunks = events.grouped(math.max(1, events.size / 4 + 1)).toSeq
      chunks.foreach { c => stream.addData(c); q.processAllAvailable() }
      val streamed = spark.table("hll_out").collect().map(_.toSeq).toSet
      val batch = Streams.hllRegisters(Tables(spark, sf0001, "events"))
        .collect().map(_.toSeq).toSet
      // register-max state is monotone: incremental micro-batch folding
      // must land on exactly the batch register values
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
