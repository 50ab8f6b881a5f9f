package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}

/** Bucketed-table co-located join — the storage-layout half of the 100 TB
  * join story. A fact⋈fact join on raw files shuffles BOTH sides every
  * time it runs; writing each side once as a bucketed+sorted table on the
  * join key (`bucketBy(n, key).sortBy(key)`) pins rows to buckets by
  * `hash(key) % n` at WRITE time, so every subsequent join on that key is
  * a zero-exchange sort-merge join: bucket i of one table joins bucket i
  * of the other, no shuffle, no sort. At 100 TB this converts the
  * dominant recurring cost (a full two-sided exchange per run) into a
  * one-time layout cost amortized over every downstream query.
  *
  * Tables are built if absent into `spark.sql.warehouse.dir`
  * (/tmp/graft_warehouse — the same build-if-absent contract as the ANN
  * index, K4) and keyed by source dir so different SFs don't collide.
  */
object Bucketing extends QModule {

  /** Bucket count: at real scale pick ≈ corpus / (executor-digestible
    * split); 8 keeps the fixture write small while exercising the plan. */
  val Buckets = 8

  /** Build-if-absent bucketed copies of orders/lineitem, bucketed AND
    * sorted by the join key. Returns the (orders, lineitem) table names.
    *
    * Bucket METADATA lives in the session catalog (in-memory here), but
    * the table DATA lives in the warehouse dir, which outlives the JVM —
    * so "absent from the catalog" must clear any stale on-disk location
    * first or saveAsTable fails with LOCATION_ALREADY_EXISTS. */
  def bucketedPair(s: SparkSession, d: String): (String, String) = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val ot = s"graft_orders$tag"
    val lt = s"graft_lineitem$tag"
    if (!s.catalog.tableExists(ot)) {
      clearStaleLocation(s, ot)
      Tables(s, d, "orders")
        .write
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ot)
    }
    if (!s.catalog.tableExists(lt)) {
      clearStaleLocation(s, lt)
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lt)
    }
    (ot, lt)
  }

  /** The warehouse dir is per-process ([[graft.GraftSession]] appends the
    * PID), so the only stale data this can meet is a previous session of
    * THIS process — no cross-JVM race. listFiles() may still return null
    * on a concurrent delete or IO error; treat that as already-empty. */
  private def clearStaleLocation(s: SparkSession, table: String): Unit = {
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = new java.io.File(wh, table)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  /** The co-located join itself: orders ⋈ lineitem on the bucket key.
    * With both sides bucketed by the key at the same bucket count, the
    * planner emits a sort-merge join with NO exchange on either side
    * (asserted in BucketingSpec). */
  def coLocatedJoin(s: SparkSession, d: String): DataFrame = {
    val (ot, lt) = bucketedPair(s, d)
    s.table(ot).join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
  }

  // ---------------------------------------------------------------- q43
  /** Revenue by order priority through the bucketed join; the oracle runs
    * the plain join on the raw parquet — layout must not change a value. */
  private val q43 = Q(
    "q43_bucketed_join",
    (s, d) => {
      import s.implicits._
      coLocatedJoin(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")) / 1000.0, 2).as("rev_k"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_items,
      round(sum(l_extendedprice * (1.0 - l_discount)) / 1000.0, 2) AS rev_k
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY o_orderpriority"""))

  override def all: Seq[Q] = Seq(q43)
}
