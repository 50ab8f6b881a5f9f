package graft

import org.apache.spark.sql.functions._

import graft.functions.{KmvAgg, PortableHash}

/** [[graft.functions.KmvAgg]] — the K-Minimum-Values distinct sketch. */
class KmvSpec extends SparkSpec {

  import spark.implicits._

  test("MinSet keeps the k smallest distinct values") {
    val s = new KmvAgg.MinSet(3)
    Seq(50L, 10L, 30L, 10L, 40L, 20L, 20L).foreach(s.offer)
    assert(s.size == 3)
    assert(s.kthMin == 30L)
    var got = List.empty[Long]
    s.foreach(v => got = v :: got)
    assert(got.sorted == List(10L, 20L, 30L))
  }

  test("exact count when distinct values fit in the sketch") {
    val df = spark.range(100).select(PortableHash.hash($"id".cast("string")).as("hv"))
    val est = df.agg(KmvAgg.kmvDistinct($"hv", 1024)).head().getDouble(0)
    assert(est == 100.0)
  }

  test("estimate lands within 3 standard errors at k=256") {
    val n = 20000L
    val df = spark.range(n).select(PortableHash.hash($"id".cast("string")).as("hv"))
    val est = df.agg(KmvAgg.kmvDistinct($"hv", 256)).head().getDouble(0)
    // KMV relative stderr ~ 1/sqrt(k-2) ~ 6.3%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.19, s"estimate $est vs true $n")
  }

  test("estimate is invariant under repartitioning (merge correctness)") {
    val base = spark.range(5000).select(PortableHash.hash($"id".cast("string")).as("hv"))
    val e1 = base.repartition(1).agg(KmvAgg.kmvDistinct($"hv", 128)).head().getDouble(0)
    val e17 = base.repartition(17).agg(KmvAgg.kmvDistinct($"hv", 128)).head().getDouble(0)
    assert(e1 == e17)
  }

  test("duplicates do not move the estimate (distinctness)") {
    val once = spark.range(3000).select(PortableHash.hash($"id".cast("string")).as("hv"))
    val thrice = once.union(once).union(once)
    val e1 = once.agg(KmvAgg.kmvDistinct($"hv", 64)).head().getDouble(0)
    val e3 = thrice.agg(KmvAgg.kmvDistinct($"hv", 64)).head().getDouble(0)
    assert(e1 == e3)
  }

  test("SQL surface: kmv_distinct is registered and validates k") {
    spark.range(10).select(PortableHash.hash($"id".cast("string")).as("hv"))
      .createOrReplaceTempView("kmv_in")
    val est = spark.sql("SELECT kmv_distinct(hv, 64) AS e FROM kmv_in").head().getDouble(0)
    assert(est == 10.0)
    val err = intercept[Exception] {
      spark.sql("SELECT kmv_distinct(hv, hv) FROM kmv_in").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("q41 rows: under-filled k is exact, larger k has smaller error") {
    val rows = SparkEntry.queries("q41_kmv_distinct")(spark, sf0001)
      .orderBy($"k").collect()
    assert(rows.length == 4)
    val exact = rows.head.getLong(2)
    // k=4096 > ~200 distinct partkeys at sf0.001 -> exact branch
    val last = rows.last
    assert(last.getDouble(1) == exact.toDouble && last.getDouble(3) == 0.0)
  }
}
