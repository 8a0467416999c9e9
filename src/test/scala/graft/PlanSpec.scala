package graft

import graft.queries.{JoinQueries, TradeQueries}

/** Plan-shape regression tests — the 100 TB properties the queries rely
  * on, asserted from the physical plan so they can't silently rot:
  * time predicates must reach the parquet scan as pushed filters, fixed
  * dims must broadcast, and nothing may plan a cartesian product. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: NamedQuery): String =
    q.run(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Number of parquet scans, counted from the formatted plan's detail
    * headers (`(n) Scan parquet`) — the tree section repeats each node,
    * so a raw substring count double-counts. */
  private def scanCount(p: String): Int =
    p.linesIterator.count(l =>
      l.startsWith("(") && l.contains(") Scan parquet"))

  test("windowed trade queries push the ts range down to the scan") {
    Seq(TradeQueries.ohlcv1m, TradeQueries.topSymbols,
      TradeQueries.candleMerge, TradeQueries.countAll).foreach { q =>
      val p = plan(q)
      assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,")
        || p.contains("GreaterThanOrEqual(ts,"),
        s"${q.name}: ts range not pushed to parquet scan")
    }
  }

  test("symbol equality is pushed alongside the time range") {
    val p = plan(TradeQueries.ohlcv1m)
    assert(p.contains("EqualTo(event_type,click)"),
      "symbol filter not pushed to scan")
  }

  test("star join broadcasts the fixed dims, never a cartesian") {
    val p = plan(JoinQueries.revenueRegionMonth)
    assert(p.contains("BroadcastHashJoin"), "no broadcast join in star plan")
    assert(!p.contains("CartesianProduct"), "cartesian product in star plan")
  }

  test("co-bucketed star layout removes the pre-agg exchange the flat " +
    "layout pays (r14 layout experiment)") {
    // flat: groupBy(l_orderkey) over corpus parquet must shuffle the
    // fact-side partials
    val flat = plan(JoinQueries.revenueRegionMonth)
    assert(flat.contains("hashpartitioning(l_orderkey"),
      "flat star lost its pre-agg exchange — the A/B contrast is gone")
    // bucketed: the scan itself delivers the pre-agg's required
    // distribution, so no exchange may touch the order key on either
    // side of the first join
    val bkt = plan(JoinQueries.revenueRegionMonthBucketed)
    assert(!bkt.contains("hashpartitioning(l_orderkey"),
      s"bucketed star still exchanges the fact pre-agg:\n$bkt")
    assert(!bkt.contains("hashpartitioning(o_orderkey"),
      s"bucketed star still exchanges the orders side:\n$bkt")
    assert(bkt.contains("graft_bkt_lineitem"),
      "bucketed star is not reading the bucketed layout")
  }

  test("suppkey-bucketed projection runs the per-supplier pre-agg " +
    "exchange-free (r15 one-sort-key experiment)") {
    // the projection twin: no exchange may touch l_suppkey — the
    // bucketed scan delivers the pre-agg's required distribution, so
    // the fact side never crosses the wire on ANY broadcast decision
    val bkt = plan(JoinQueries.topSuppliersBucketed)
    assert(!bkt.contains("hashpartitioning(l_suppkey"),
      s"bucketed supplier projection still exchanges the fact pre-agg:\n$bkt")
    assert(bkt.contains("graft_bkt_lineitem_sup"),
      "bucketed supplier twin is not reading the suppkey projection")
    // contrast held on the flat side under the no-broadcast (grown-dim)
    // shape: with the dim too big to broadcast, the flat join must
    // exchange the whole fact on l_suppkey — asserted with the
    // threshold disabled so the pin doesn't depend on AQE's choice
    val s = TestSession.spark
    val prevA = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevB =
      s.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val flat = plan(JoinQueries.topSuppliers)
      assert(flat.contains("hashpartitioning(l_suppkey"),
        "flat supplier join lost its fact exchange — A/B contrast gone")
      val bktOff = plan(JoinQueries.topSuppliersBucketed)
      assert(!bktOff.contains("hashpartitioning(l_suppkey"),
        "bucketed supplier projection exchanges the fact when the dim " +
          s"cannot broadcast:\n$bktOff")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevA)
      prevB match {
        case Some(v) =>
          s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort+limit") {
    Seq(TradeQueries.latest10, TradeQueries.topSymbols,
      JoinQueries.topSuppliers).foreach { q =>
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"${q.name}: top-k did not plan TakeOrderedAndProject")
    }
  }

  test("no query plans a CartesianProduct") {
    SparkEntry.registry.foreach { q =>
      assert(!plan(q).contains("CartesianProduct"),
        s"${q.name}: cartesian product in plan")
    }
  }

  test("quantile queries sort only broadcast-pruned target buckets — " +
    "no window over an unreduced corpus scan") {
    // the r9/r10 parallelism cap: a window partitioned by the 5-value
    // symbol key sorted the WHOLE corpus in 5 tasks. The two-pass
    // selection must keep every window's input reduced — an aggregate
    // (the per-bucket counts) or a join (the target-bucket prune) has
    // to sit between any window and any scan leaf. Pinned for BOTH
    // consumers of bucketedRankSelect: the exact quantiles query and
    // the histogram sketch's exact accuracy readout
    import org.apache.spark.sql.execution.SparkPlan
    def reducedBeforeScan(node: SparkPlan): Boolean = node match {
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        true
      case leaf if leaf.children.isEmpty => !leaf.nodeName.contains("Scan")
      case other => other.children.forall(reducedBeforeScan)
    }
    Seq(TradeQueries.priceQuantiles, TradeQueries.histQuantiles).foreach {
      q =>
        val sp = q.run(spark, sf).queryExecution.sparkPlan
        val windows = sp.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w }
        assert(windows.nonEmpty, s"${q.name}: bucketed selection lost its windows")
        windows.foreach { w =>
          assert(w.children.forall(reducedBeforeScan),
            s"${q.name}: a window sorts the raw corpus scan:\n${w.treeString}")
        }
        // and the prune is a broadcast, not a shuffled join of the corpus
        assert(plan(q).contains("BroadcastHashJoin"),
          s"${q.name}: target-bucket prune is not a broadcast join")
    }
  }

  test("range join plans a broadcast nested-loop over the tiny band dim") {
    val p = plan(graft.queries.EventQueries.valueBands)
    // the correct plan for a CONSTANT-size non-equi dim: broadcast NLJ
    // (O(bands) per row, map-side) — anything shuffling the fact side
    // or a cartesian is a regression
    assert(p.contains("BroadcastNestedLoopJoin"),
      "value-band range join lost its broadcast NLJ shape")
    assert(!p.contains("CartesianProduct"))
  }

  test("semi join stays a LeftSemi, not an inner join + distinct") {
    val p = plan(JoinQueries.urgentSemi)
    assert(p.contains("LeftSemi"), "EXISTS shape lost its semi join")
  }

  test("CMS probe joins against a broadcast sketch") {
    val p = plan(graft.queries.EventQueries.cmsHeavy)
    assert(p.contains("BroadcastHashJoin"),
      "CMS probe should broadcast the fixed-size sketch")
  }

  test("MG heavy hitters: candidate pass re-scans behind a broadcast") {
    // pass 2's exact re-count must semi-filter the fact scan with the
    // O(k) candidate set broadcast — a shuffle join here would defeat
    // the sketch (the whole point is never shuffling the distinct keys)
    val p = plan(graft.queries.EventQueries.mgHeavy)
    assert(p.contains("BroadcastHashJoin"),
      "MG candidate filter should broadcast the O(k) candidate set")
  }

  test("quantized top-k plans TakeOrderedAndProject") {
    assert(plan(graft.queries.EmbQueries.quantizedTopK)
      .contains("TakeOrderedAndProject"))
  }

  test("shuffle join injects a runtime bloom filter on the fact side") {
    // the 100 TB story for selective dim filters when the dim is too big
    // to broadcast: Catalyst builds a bloom filter from the filtered
    // creation side and semi-filters the fact scan BEFORE the shuffle.
    // Thresholds are tuned down to fire at test scale; broadcast is
    // disabled because broadcast joins don't need (or get) the filter.
    import org.apache.spark.sql.functions.col
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val p = Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf).where(col("p_size") === 1),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").count()
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.toLowerCase.contains("might_contain"),
        s"no runtime bloom filter in shuffle-join plan:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("scans read only the projected columns (column pruning)") {
    val p = plan(TradeQueries.countAll)
    // count over the time window needs ts only — the ReadSchema must not
    // drag the full events row through the scan
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no ReadSchema in plan"))
    assert(!readSchema.contains("props") && !readSchema.contains("user_id"),
      s"count query reads unneeded columns: $readSchema")
  }

  test("funnel resolves all three stages from ONE scan and ONE shuffle") {
    // the round-5 formulation re-scanned events once per stage; the
    // window formulation must keep exactly one parquet scan and one
    // pre-window exchange (three Windows sharing a single sort)
    val p = plan(graft.queries.EventQueries.funnel)
    val scans = p.linesIterator.count(_.contains("Location: InMemoryFileIndex"))
    assert(scans == 1, s"funnel plans $scans events scans, want 1:\n$p")
    // count the details-section operator entries "(N) Window" — the tree
    // section's "+- " prefixes shift with AQE nesting, the details don't.
    // Exactly three: one per funnel stage, all fed by the single exchange.
    val windows = p.linesIterator.count(_.trim.matches("""\(\d+\) Window"""))
    assert(windows == 3,
      s"funnel plans $windows Window operators, want 3:\n$p")
  }

  test("contamination keeps the train semi-join a partitioned hash join " +
    "and never re-tokenizes per gram") {
    val p = plan(graft.queries.DocQueries.contamination)
    // the train-gram set is the BIG side: the hint must survive to a
    // ShuffledHashJoin LeftSemi — a broadcast here is a single-threaded
    // build locally and a driver OOM at scale
    assert(p.contains("ShuffledHashJoin") && p.contains("LeftSemi"),
      "train-gram semi-join lost its shuffle-hash shape")
    // the tokenizer must stay bound inside the lambda barrier. Without
    // it, CollapseProject inlines the token alias into the per-gram
    // lambda — the signature is `slice(split(trim(...)), i, 13)` inside
    // a lambdafunction, re-tokenizing once PER GRAM (4 s of wall at
    // sf0.1). Per-ROW occurrences (one per branch Project, plus the
    // inferred non-empty Filter conjuncts the optimizer pushes below
    // the explode) are fine and CSE'd at codegen; bound them loosely.
    val opt = graft.queries.DocQueries.contamination.run(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!opt.contains("slice(split(trim("),
      "tokenizer inlined into the per-gram lambda")
    val tokenizes = "split\\(trim\\(".r.findAllIn(opt).length
    assert(tokenizes <= 9,
      s"tokenizer appears $tokenizes times — lambda barrier lost")
  }

  test("span dedup keeps the lambda barrier and plans no cartesian") {
    val q = graft.queries.DocQueries.spanDedup
    val opt = q.run(spark, sf).queryExecution.optimizedPlan.toString
    assert(!opt.contains("slice(split(trim("),
      "tokenizer inlined into the per-gram lambda")
    assert(!plan(q).contains("CartesianProduct"))
  }

  test("span dedup's (doc_id, gram) distinct settles map-side: the gram " +
    "explode plans ZERO exchanges") {
    // per-doc array_distinct replaced the global .distinct() — the key
    // contains doc_id, so every duplicate lives inside one row's
    // explode and a corpus-wide shuffle would be pure data movement.
    // The one allowed exchange is Tables.documents' input-spreading
    // REPARTITION_BY_NUM (the corpus arrives as a single parquet file
    // locally); a reappearing distinct would plan HashAggregates plus
    // a hash-partitioned exchange of the EXPLODED gram stream.
    val p = graft.queries.DocQueries.spanDedupGramsFor(
      Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!p.contains("HashAggregate"),
      s"the per-doc-distinct gram explode should not aggregate:\n$p")
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange"))
      .filterNot(_.contains("REPARTITION_BY_NUM")).toList
    assert(shuffles.isEmpty,
      s"the per-doc-distinct gram explode should be shuffle-free:\n$p")
  }

  test("simhash signature build is pure map-side: fused graft_simhash, " +
    "zero exchanges, no token explode") {
    // the r14 fused SimhashSig made the whole signature one codegen'd
    // byte pass per document; the distributed spelling it replaced
    // exploded the token stream and exchanged on (doc_id, tok). A
    // reappearing explode or aggregate here is the 100 TB regression
    // this pin exists to catch (the exchange was corpus-sized). Same
    // REPARTITION_BY_NUM allowance as the span-dedup pin above.
    val p = graft.queries.DocQueries.simhashFrames(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_simhash"),
      s"signature should come from the fused expression:\n$p")
    assert(!p.contains("Generate") && !p.contains("HashAggregate"),
      s"signature build should not explode or aggregate:\n$p")
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange"))
      .filterNot(_.contains("REPARTITION_BY_NUM")).toList
    assert(shuffles.isEmpty,
      s"the fused signature build should be shuffle-free:\n$p")
  }

  test("semantic dedup joins on the cluster key, never cartesian") {
    val p = plan(graft.queries.EmbQueries.semanticDedup)
    assert(!p.contains("CartesianProduct"),
      "cluster-local self-join degenerated to all-pairs")
  }

  test("capped semantic dedup: the pair join keys on (cluster, LSH " +
    "prefix) and the bit-width frame broadcasts") {
    val df = graft.queries.EmbQueries.semanticDedupCapped.run(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "sub-bucketed self-join degenerated to all-pairs")
    assert(p.contains("BroadcastHashJoin"),
      "the O(labels) bit-width frame should broadcast onto the scan")
    // the quadratic term's key includes the sub-bucket, not label alone
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.toString.contains("vec_id")) => j
    }
    assert(joins.nonEmpty &&
      joins.forall(_.condition.get.toString.contains("sk")),
      "pair join must key on the LSH sub-bucket")
  }

  test("fuzzy contamination prunes candidates before the shingle join, " +
    "never cartesian") {
    val q = graft.queries.DocQueries.fuzzyContamination
    val lp = q.run(spark, sf).queryExecution.optimizedPlan
    // the expensive step is the shingle-verification join (right side
    // produces the `shingles` arrays the jaccard projection consumes);
    // the scale contract is that the cross-split pruning — the
    // md5-bucket arithmetic — happens on its LEFT (candidate) side,
    // so verification only ever sees train×test survivors
    val verifyJoins = lp.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.right.output.exists(_.name == "shingles") => j
    }
    assert(verifyJoins.nonEmpty, "no shingle-verification join in plan")
    assert(verifyJoins.exists(_.left.toString.contains("% 10")),
      "cross-split pruning does not precede the shingle verification")
    assert(!plan(q).contains("CartesianProduct"))
  }

  test("PQ search broadcasts the codebook and ADC table, ranks via " +
    "TakeOrderedAndProject") {
    val p = plan(graft.queries.EmbQueries.pqTopK)
    assert(p.contains("BroadcastExchange"),
      "PQ codebook/ADC not broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "PQ ranking did not plan TakeOrderedAndProject")
  }

  test("IVF-PQ probes via broadcast semi-join and keeps kernel scoring " +
    "map-side") {
    // the composite's whole point at 100 TB: cell membership must be a
    // broadcast semi-join the scan side can consume BEFORE vector math
    // (partition pruning on a cell-partitioned layout), never a shuffle
    // of the encoded fact side; the rank stays TakeOrdered
    val p = plan(graft.queries.EmbQueries.ivfPqTopK)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "probed-cell membership is not a broadcast semi-join")
    assert(p.contains("TakeOrderedAndProject"),
      "IVF-PQ ranking did not plan TakeOrderedAndProject")
    assert(!p.contains("SortMergeJoin"),
      "IVF-PQ shuffled the encoded fact side")
    // the broadcast above must come from the PLANNER's stats, not a
    // forced hint on the probe side (round-8 verdict: a pinned
    // broadcast on a data-dependent frame is an OOM at 100 TB); the
    // only hints left in the query are the O(1)-bounded codebook / ADC
    // / query-row frames, none under the semi-join's build side
    val hinted = graft.queries.EmbQueries.ivfPqTopK
      .run(spark, sf)
      .queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
    assert(hinted.forall(h => !h.child.toString.contains("LocalLimit")),
      "the nprobe cell-list (limit-3) frame carries a forced broadcast hint")
  }

  test("kmeans refine assigns against a broadcast codebook") {
    val p = plan(graft.queries.EmbQueries.kmeansRefine)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "Lloyd assignment lost its broadcast-codebook shape")
    assert(!p.contains("CartesianProduct"))
  }

  test("posting lists aggregate map-side partials before both exchanges " +
    "and head via TakeOrdered") {
    // the graft_topk partial is what bounds the posting shuffle to
    // O(terms x k) — a window spelling would sort every hot term's
    // full posting list instead
    val p = plan(graft.queries.DocQueries.postingLists)
    assert(p.contains("TakeOrderedAndProject"), "head is not TakeOrdered")
    assert(p.contains("ObjectHashAggregate"),
      "bounded top-k aggregate missing from the posting plan")
    assert(!p.contains("WindowExec") && !p.contains("CartesianProduct"),
      "posting lists must not plan a window sort or cartesian")
  }

  test("MV posting readback heads via TakeOrdered over the merge fold, " +
    "no window sort") {
    // the read path must keep the batch index's bounded-aggregate shape:
    // counters + heap re-select from the block store, TakeOrdered head —
    // a window or cartesian here would sort/blow up vocab × blocks rows
    val p = plan(graft.queries.DocQueries.postingListsMv)
    assert(p.contains("TakeOrderedAndProject"), "MV head is not TakeOrdered")
    assert(p.contains("ObjectHashAggregate"),
      "bounded top-k re-select missing from the merge fold")
    assert(!p.contains("WindowExec") && !p.contains("CartesianProduct"),
      "MV readback planned a window sort or cartesian")
  }

  test("dedup-MV readback verifies through a semi-join prune — " +
    "tokenization runs only on candidate docs, never a cartesian") {
    // the verification joins shingles for docs appearing in candidate
    // pairs: the corpus scan must sit under a LeftSemi against the
    // candidate-id set, so read-time text work is candidates-sized
    val p = plan(graft.queries.DocQueries.minhashPairsMv)
    assert(p.contains("LeftSemi"),
      "candidate-id semi-join prune missing from MV verification")
    assert(p.contains("TakeOrderedAndProject"), "MV head is not TakeOrdered")
    assert(!p.contains("CartesianProduct"),
      "MV readback planned a cartesian")
  }

  test("streamed-IVF search ranks behind a PARTITION-PRUNED scan of the " +
    "cell-partitioned inverted lists — no membership join at all") {
    // the 100 TB probe shape (round-8 verdict task 1): the probed cell
    // becomes a literal filter on the store's physical partition key,
    // so the ranking scan reads only `cell=<probe>` directories — no
    // member list is ever built, broadcast, or joined; the head stays
    // a bounded TakeOrdered
    val df = graft.queries.EmbQueries.ivfStreamed.run(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), "head is not TakeOrdered")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "streamed-IVF probe planned a shuffle join or cartesian")
    val pruned = "PartitionFilters: \\[[^\\]]*cell".r
      .findFirstIn(p).isDefined
    assert(pruned,
      "inverted-list scan lost its cell partition filter:\n" + p)
    // and the prune is REAL: the scan reads strictly fewer files than
    // the store holds (4 blocks × 10 cells at sf0.001)
    df.collect()
    // plan-wide totals: pruned inverted scan (≤1 file per live block ×
    // 2 blocks) + the 1-file query-vector scan; an unpruned store scan
    // would read every populated cell dir (~20 files) and fail this
    val (files, _) = graft.store.ScanStats.totals(df)
    assert(files > 0 && files <= 3,
      s"expected ≤3 files across the plan after cell pruning, read $files")
  }

  test("the SQL-spelled streamed-IVF readback partition-prunes through " +
    "graft_mv_read exactly like the Scala probe") {
    // the registered SQL spelling (emb_ivf_streamed_sql) must keep the
    // probe's 100 TB property: `WHERE cell = <probe>` over the table
    // function resolves to a PartitionFilters entry on the store scan,
    // and the plan-wide file count stays ≤3 (pruned inverted scan ×2
    // live blocks + the 1-file query-vector scan)
    val df = graft.queries.EmbQueries.ivfStreamedSql.run(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), "head is not TakeOrdered")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "SQL-path probe planned a shuffle join or cartesian")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      "SQL-path inverted-list scan lost its cell partition filter:\n" + p)
    df.collect()
    val (files, _) = graft.store.ScanStats.totals(df)
    assert(files > 0 && files <= 3,
      s"expected ≤3 files across the SQL-path plan, read $files")
  }

  test("BPE trainer's final plan scans the corpus ZERO times (state " +
    "lineage truncated per round)") {
    // without localCheckpoint the merge/argmax branches both re-derive
    // the parent state — the DAG doubles per round and round K replays
    // the corpus scan 2^K times. The checkpointed plan must read only
    // materialized partitions: no file scan anywhere in the final plan.
    val p = plan(graft.queries.DocQueries.bpeTrain)
    assert(!p.contains("Location: InMemoryFileIndex"),
      s"BPE trainer re-scans the corpus:\n$p")
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      "expected checkpointed inputs in the trainer plan")
  }

  test("apply-BPE encoder inherits the trainer's zero-corpus-scan " +
    "plan: encoding runs on the checkpointed type table") {
    // the encoder re-weights the fold's final word-type table by its
    // counts — if its plan touched the corpus, encoding cost would
    // scale with corpus size instead of vocabulary size
    val p = plan(graft.queries.DocQueries.bpeEncode)
    assert(!p.contains("Location: InMemoryFileIndex"),
      s"BPE encoder re-scans the corpus:\n$p")
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      "expected checkpointed inputs in the encoder plan")
  }

  test("PQ recall joins two fixed-k heads, never the corpus") {
    val p = plan(graft.queries.EmbQueries.pqRecall)
    assert(p.contains("TakeOrderedAndProject"),
      "recall sides lost their TakeOrdered heads")
    assert(!p.contains("CartesianProduct"), "recall join went cartesian")
  }

  test("BM25 broadcasts df and corpus stats; head is TakeOrdered") {
    val p = plan(graft.queries.DocQueries.bm25TopK)
    assert(p.contains("TakeOrderedAndProject"), "BM25 head is not TakeOrdered")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      "df / stats frames are not broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "BM25 must never shuffle the tf side for the tiny df/stats joins")
  }

  test("phrase search joins occurrence lists, never the corpus") {
    // both sides of the adjacency join must be term-filtered BEFORE the
    // exchange, and the head must be TakeOrdered
    val p = plan(graft.queries.DocQueries.phraseSearch)
    assert(p.contains("TakeOrderedAndProject"), "head is not TakeOrdered")
    assert(!p.contains("CartesianProduct"), "adjacency join went cartesian")
    // formatted plans render the condition as "(tok#N = table)" — match
    // on the stable "= table)" / "= hash)" suffixes, one per join side
    assert(p.contains("= table)") && p.contains("= hash)"),
      "term filters missing from the occurrence sides")
  }

  test("hybrid RRF limits before ranking: no corpus-sized window input") {
    // both rank windows must be fed by a LocalLimit/GlobalLimit pair
    // (the top-20 TakeOrdered), never by the raw scored frame
    val df = graft.queries.EmbQueries.hybridRrf.run(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("Window"), "rank windows missing")
    assert(p.contains("GlobalLimit") || p.contains("TakeOrderedAndProject"),
      "candidate lists are not limited before the rank windows")
    assert(!p.contains("CartesianProduct"),
      "fusion join planned a cartesian")
  }

  test("retention's bounds branch reuses the per-user exchange at runtime") {
    // statically the bounds aggregate and the per-user frame are two
    // subtrees over the same scan; their exchanges are canonically equal,
    // so AQE must execute the scan+partial-agg ONCE and feed both from
    // the same shuffle (the single-scan contract of the rewrite)
    val df = graft.queries.EventQueries.userRetention.run(spark, sf)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange"),
      s"retention did not reuse the per-user exchange:\n$executed")
  }

  test("ingest decode is one scan, zero joins: generate → from_json → " +
    "project, all map-side until the output sort") {
    val p = plan(TradeQueries.ingestDecode)
    assert(scanCount(p) == 1, s"expected exactly one scan:\n$p")
    assert(!p.contains("Join"), s"decode planned a join:\n$p")
    assert(p.contains("from_json"), "the real from_json decode is gone")
    // exactly two intentional exchanges: the key-column fan-out BEFORE
    // the CPU-bound generate+parse (an 8-byte-per-row shuffle that buys
    // full-width decode parallelism over a compact scan) and the output
    // sort's range partitioning — the decode itself never shuffles
    val exchanges = p.linesIterator.count(l =>
      l.startsWith("(") && l.contains(") Exchange"))
    assert(exchanges <= 2, // key fan-out + the sort's range partitioning
      s"decode shuffled beyond fan-out + output sort ($exchanges):\n$p")
    assert(p.contains("REPARTITION_BY_COL"),
      "the pre-decode key fan-out is gone — a compact scan would run " +
        "the parse 2-way at the 100× corpus")
  }

  test("media decode stats: ONE corpus scan feeds the typed codec " +
    "pipeline; source rides through, no join back to documents") {
    val p = plan(graft.queries.MediaQueries.decodeStats)
    assert(scanCount(p) == 1, s"expected exactly one scan:\n$p")
    assert(!p.contains("Join"), s"metadata aggregation joined back:\n$p")
    assert(p.contains("MapPartitions"),
      "the per-partition codec stage is gone")
  }
}
