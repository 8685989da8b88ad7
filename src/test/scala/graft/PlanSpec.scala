package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Catalog

/** Executable checks for the plan properties SCALE.md claims: filters
  * reach the parquet scans, projections prune the read schema, and
  * dimension joins broadcast. These pin the *shape* of the plan, not
  * timings — a regression here (e.g. a filter stuck above a join, a
  * scan reading every column) is a scale bug even when sf0.001 results
  * stay correct.
  */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q59 star join: dims broadcast, order-date filter pushed, lineitem scan pruned") {
    val plan = formatted(Catalog.queries("q59_tpch_q5")(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"), "dimension joins should broadcast")
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("o_orderdate")),
      "order-date range filter should reach the orders parquet scan")
    val lineitemSchema = plan.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("l_extendedprice"))
    assert(lineitemSchema.exists(l => !l.contains("l_returnflag") && !l.contains("l_quantity")),
      s"lineitem scan should read only the 4 needed columns, got: $lineitemSchema")
  }

  test("q01 pricing summary: shipdate filter pushed, partial aggregation present") {
    val plan = formatted(Catalog.queries("q01_pricing_summary")(spark, Sf0001))
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")),
      "shipdate filter should reach the lineitem scan")
    assert(plan.contains("HashAggregate"), "aggregation should be hash-based")
    // partial + final pair → map-side combine before the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial and final hash aggregates")
  }

  test("bucketed+sorted inputs run the custom as-of join with ZERO exchanges") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, Sf0001)
    // the metastore is fresh per JVM but the warehouse dir persists —
    // clear both so overwrite can't trip LOCATION_ALREADY_EXISTS
    Seq("b_purchases", "b_clicks").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      SparkSpec.deleteRecursively(s"/tmp/graft_warehouse/$t")
    }
    // one write task → one file per bucket, so the scan reports both
    // bucket partitioning AND in-bucket sort order
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .repartition(1)
      .write.mode("overwrite").bucketBy(4, "user_id").sortBy("user_id", "ts")
      .saveAsTable("b_purchases")
    ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("click_value"))
      .repartition(1)
      .write.mode("overwrite").bucketBy(4, "user_id").sortBy("user_id", "ts")
      .saveAsTable("b_clicks")
    val out = graft.ops.AsOf.asofJoinLatestExec(
      spark.table("b_purchases"), spark.table("b_clicks"),
      "user_id", "ts", "click_value")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"),
      s"bucketed as-of join should be shuffle-free:\n${plan.take(2000)}")
    assert(out.count() === spark.table("b_purchases").count(),
      "as-of join must preserve every left row")
  }

  test("AsofLimitPushDown pushes LIMIT into the as-of join's probe side") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val limited = graft.ops.AsOf.asofJoinLatestExec(
      purchases, clicks, "user_id", "ts", "click_value").limit(7)
    val optimized = limited.queryExecution.optimizedPlan
    val pushed = optimized.collect {
      case j: graft.plans.AsofJoin
          if j.left.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalLimit] => j
    }
    assert(pushed.nonEmpty,
      s"expected LocalLimit pushed into AsofJoin's left child:\n$optimized")
    assert(limited.count() === 7)
  }

  test("runtime bloom-filter pruning injects on a selective fact-fact join") {
    // The 100 TB story for fact⋈fact joins where one side carries a
    // selective filter: Catalyst's InjectRuntimeFilter plants a
    // bloom_filter_agg on the filtered side and a might_contain probe
    // on the scan of the big side, pruning shuffle input at runtime.
    val s = spark
    import org.apache.spark.sql.functions._
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        s.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        s.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        s.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        s.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      // sf0.001 scans are far below the 10GB production default — the
      // threshold exists to skip tiny scans, which is exactly our fixture
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join so the runtime filter is the only pruning path
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(s, Sf0001)
      val o = Tables.orders(s, Sf0001).filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") || optimized.contains("might_contain"),
        s"expected a runtime bloom filter in the optimized plan:\n$optimized")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("coalesce narrows without a shuffle; repartition exchanges") {
    import org.apache.spark.sql.functions.col
    val base = Tables.lineitem(spark, Sf0001).filter(col("l_quantity") > 0)
    val coalesced = base.coalesce(1).queryExecution.executedPlan.toString
    assert(!coalesced.contains("Exchange"),
      s"coalesce must not shuffle:\n$coalesced")
    val repartitioned = base.repartition(8).queryExecution.executedPlan.toString
    assert(repartitioned.contains("Exchange"),
      s"repartition must shuffle:\n$repartitioned")
  }

  test("AQE coalesces post-shuffle partitions on small exchanges") {
    val s = spark
    import org.apache.spark.sql.functions.{col, sum}
    val prev = s.conf.getOption("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      val df = Tables.lineitem(s, Sf0001)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
      df.collect() // materialize so the adaptive plan is final
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead"),
        s"adaptive shuffle read (partition coalescing) expected:\n$plan")
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.adaptive.enabled", v)
      case None => s.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("q58 hash sample keeps sampling as a scan-adjacent filter, no shuffle") {
    val plan = formatted(Catalog.queries("q58_hash_sample")(spark, Sf0001))
    // deterministic sampling must not repartition the table: the only
    // exchange allowed is the final order-by's range partitioning
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"sampling should add no shuffles, found $exchanges exchange nodes")
  }

  test("deterministicSplit is a pure scan-side filter: zero exchanges") {
    val feats = graft.ml.MlPipeline.orderFeatures(Tables.orders(spark, Sf0001))
    val (train, test) = graft.ml.MlPipeline.deterministicSplit(feats, "o_orderkey")
    Seq(train, test).foreach { side =>
      val plan = side.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"md5-bucket split must not shuffle:\n$plan")
    }
  }

  test("sorted-neighborhood pairing is an equi-join, never a nested-loop over blocks") {
    import org.apache.spark.sql.functions.expr
    // the rank-window range condition MUST be folded into the join key
    // (blk, rn+offset): expressed as a post-join filter instead, every
    // block degenerates to block² Levenshtein evaluations — measured
    // 40 s vs 0.6 s at sf0.1 before this shape was pinned
    val plan = graft.dedup.Dedup.sortedNeighborhoodPairs(
        Tables.part(spark, Sf0001), "p_partkey", "p_name",
        expr("split_part(p_name, ' ', 1)"), window = 2, maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"neighborhood join must be hash/merge, not nested-loop:\n${plan.take(1500)}")
  }

  test("CMS counters: the d-fold seed explosion partial-aggregates before its one shuffle") {
    import org.apache.spark.sql.functions._
    val items = Tables.documents(spark, Sf0001)
      .select(explode(graft.text.TextStats.tokens(col("text"))).as("item"))
    val plan = graft.ops.CountMin.counters(items, d = 4, w = 64)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"counter build should shuffle exactly once, found $exchanges")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial aggregation must collapse the seed blowup map-side")
  }

  test("span dedup: no cartesian anywhere; reassembly and span streams shuffle on hash keys") {
    val plan = graft.text.SpanDedup
      .dedupSpans(Tables.documents(spark, Sf0001), window = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "span dedup must stay linear — fingerprint joins only")
  }

  test("fixed-centroid IVF: corpus scanned once, probed queries broadcast") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, Sf0001)
    val centroids = emb.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val plan = graft.similarity.Ann
      .ivfTopKFixed(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 2, centroids, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query side should broadcast into the cell join:\n${plan.take(2000)}")
    // one scan for the corpus side, one for the (broadcast) query side —
    // the corpus must not be scanned per probe cell
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 2, s"expected 2 parquet scans, found $scans")
  }

  test("semanticDedup: within-cell pairing is an equi-join on cell, never a cartesian") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, Sf0001)
    val centroids = emb.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val plan = graft.dedup.Dedup
      .semanticDedup(emb, "vec_id", "embedding", centroids, 0.35)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"cell pairing must be a hash join on cell id:\n${plan.take(1500)}")
    // centroid assignment is literal arithmetic on the scan — the
    // corpus is read once for the ranked side and once for its join
    // mirror, never per centroid
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans <= 3, s"expected <= 3 parquet scans, found $scans")
  }

  test("curateByQuality: argmax window sorts only cluster members, not the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, Sf0001)
    val pairs = graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val df = graft.dedup.Dedup.curateByQuality(docs, pairs, "doc_id",
      graft.text.TextStats.qualityScore(col("text")))
    val plan = df.queryExecution.executedPlan.toString
    // the Window operator must sit above the (small) cluster-member
    // join, not above a full documents scan: its child subtree joins
    // quality onto cluster labels first
    val windowIdx = plan.indexOf("Window")
    assert(windowIdx >= 0, "expected a window for the per-cluster argmax")
    assert(!plan.contains("CartesianProduct"))
  }

  test("keySkewProfile: the fact table is scanned and shuffled once for all metrics") {
    val events = Tables.events(spark, Sf0001)
    val plan = graft.ops.Stats.keySkewProfile(events, "user_id")
      .queryExecution.executedPlan.toString
    // base/top10/hist all derive from the same per-key count, which
    // is localCheckpoint'd — the raw fact must not appear in the
    // profile plan at all (it was scanned exactly once, eagerly, to
    // build the checkpointed count table)
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 0,
      s"fact must be read only into the checkpointed counts, found $scans scans:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"),
      "metric assembly must be single-row broadcast crosses, not a data cartesian")
  }

  test("incremental minhash dedup: cross-side band join only, never a cartesian") {
    val docs = Tables.documents(spark, Sf0001)
    val plan = graft.dedup.Dedup.minHashDedupAgainstCorpus(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 400),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") < 400),
        "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"incremental dedup must stay banded/hash-joined:\n${plan.take(1500)}")
  }

  test("source contamination: shingle pairing is an equi-join on the 5-gram") {
    val plan = Catalog.queries("tx18_source_contamination")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "source-pair overlap must come from the inverted-index equi-join")
  }

  test("bigramNll: unigram vocab broadcasts; bigram table joins by shuffle") {
    val docs = Tables.documents(spark, Sf0001)
    val plan = graft.text.TextStats.bigramNll(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "unigram vocab join must broadcast")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      "bigram LM join present")
    assert(!plan.contains("CartesianProduct"))
  }
}
