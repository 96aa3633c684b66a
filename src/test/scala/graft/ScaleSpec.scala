package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew
import graft.streaming.{EventPipeline, StatefulOps}

/** Scale-pattern specs: keyed state across micro-batches
  * (flatMapGroupsWithState), salted skew aggregation, and bucketed
  * co-located joins (shuffle elimination pinned on the physical plan).
  */
class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  private def obsJson(id: String, email: String, ts: Long): String =
    s"""{"id":"$id","name":"n","email":"$email","signup_ts":${ts - 1000},
       |"country":"US","plan":"basic","event_ts":$ts,"version":1}"""
      .stripMargin.replaceAll("\n", "")

  test("consecutive DQ failures escalate across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[String]
    val curated = EventPipeline.curate(
      EventPipeline.parse(mem.toDF().select(col("value"))))
    val query = StatefulOps.escalations(curated).writeStream
      .outputMode("append").format("memory").queryName("esc").start()

    val t0 = 1700000000000L
    // batch 1: c1 fails twice (bad email), c2 passes
    mem.addData(obsJson("c1", "bad", t0), obsJson("c1", "bad", t0 + 1000),
      obsJson("c2", "ok@example.com", t0))
    query.processAllAvailable()
    assert(spark.table("esc").count() == 0) // streak at 2 < 3

    // batch 2: c1's third consecutive failure -> escalation; c2 fails once
    mem.addData(obsJson("c1", "bad", t0 + 2000), obsJson("c2", "bad", t0 + 2000))
    query.processAllAvailable()
    val esc = spark.table("esc").collect()
    assert(esc.length == 1)
    assert(esc(0).getAs[String]("id") == "c1")
    assert(esc(0).getAs[Int]("consecutive") == 3)

    // batch 3: c1 passes (reset), then fails twice -> no new escalation
    mem.addData(obsJson("c1", "ok@example.com", t0 + 3000),
      obsJson("c1", "bad", t0 + 4000), obsJson("c1", "bad", t0 + 5000))
    query.processAllAvailable()
    assert(spark.table("esc").count() == 1)
    query.stop()
  }

  test("salted aggregation equals direct aggregation") {
    val events = Tables(spark, Sf0001).events
    val direct = events.groupBy(col("user_id")).count()
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val salted = Skew.saltedCount(events, col("user_id"))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.sameElements(direct))
  }

  test("salted distinct-count equals direct countDistinct") {
    val events = Tables(spark, Sf0001).events
    val direct = events.groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("n"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val salted = Skew.saltedCountDistinct(events, col("user_id"),
        col("event_type"))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.sameElements(direct))
  }

  test("salted join equals the direct join row-for-row") {
    val t = Tables(spark, Sf0001)
    val fact = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    val build = t.customer.select("c_custkey", "c_nationkey")
    val direct = fact.join(build, col("o_custkey") === col("c_custkey"))
      .orderBy("o_orderkey")
      .collect()
    val salted = Skew.saltedJoin(fact, build,
        col("o_custkey"), col("c_custkey"), salts = 8)
      .select(direct.head.schema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("o_orderkey")
      .collect()
    assert(salted.sameElements(direct))
    // and the salt really spreads a hot key over multiple shards
    val hot = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(8)))
    assert(hot.select("__salt").distinct().count() > 1)
  }

  test("bloom-prefiltered join equals the direct join; prefilter prunes") {
    val t = Tables(spark, Sf0001)
    val fact = t.lineitem.select("l_orderkey", "l_linenumber", "l_quantity")
    // selective build side: ~1/8 of orders
    val build = t.orders.filter(col("o_orderkey") % 8 === 0)
      .select("o_orderkey", "o_orderstatus")
    val direct = fact.join(build, col("l_orderkey") === col("o_orderkey"))
      .orderBy("l_orderkey", "l_linenumber").collect()
    val bloomed = Skew.bloomPrefilteredJoin(fact, build,
        col("l_orderkey"), col("o_orderkey"),
        expectedItems = 10000L, fpp = 0.01)
      .select(direct.head.schema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("l_orderkey", "l_linenumber").collect()
    assert(bloomed.sameElements(direct))
    // string-key form: same contract
    val factS = fact.withColumn("k", concat(lit("o"), col("l_orderkey")))
    val buildS = build.withColumn("bk", concat(lit("o"), col("o_orderkey")))
    val directS = factS.join(buildS, col("k") === col("bk")).count()
    assert(Skew.bloomPrefilteredJoin(factS, buildS, col("k"), col("bk"),
      10000L, 0.01).count() == directS)
    // and the prefilter really prunes the fact side map-side: with 1%
    // fpp, at most ~(1/8 + fpp + margin) of fact rows survive
    val bf = build.select(col("o_orderkey").cast("long").as("k"))
      .stat.bloomFilter("k", 10000L, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val surviving = fact.filter(
      udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
        .apply(col("l_orderkey").cast("long"))).count()
    assert(surviving < fact.count() / 4)
  }

  test("distributed clustering: O(log n) rounds on a 1k chain, no cache leak") {
    import spark.implicits._
    import graft.ext.Dedup
    // worst-case topology for plain min-propagation: a single 1000-node
    // chain (diameter 999). Pointer jumping must converge in <= log2 n + 1
    // rounds instead of ~1000.
    val n = 1000
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b")
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val (clusters, rounds) = Dedup.distributedClusters(chain)
    val rows = clusters.collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 0L)     // cluster_id = min doc_id
    assert(rows(0).getLong(1) == n.toLong)
    val maxRounds = (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 1
    assert(rounds <= maxRounds, s"took $rounds rounds, bound $maxRounds")
    // superseded label frames + edges were unpersisted: only the final
    // labels frame may remain cached
    val cachedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(cachedAfter - cachedBefore <= 1,
      s"cache grew by ${cachedAfter - cachedBefore} frames")
  }

  test("bucketed tables join without a shuffle exchange") {
    val t = Tables(spark, Sf0001)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    t.orders.write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    t.customer.write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: sort-merge join reads both sides bucket-aligned
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
    assert(joined.count() == t.orders.join(t.customer,
      col("o_custkey") === col("c_custkey")).count())
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    ()
  }
}
