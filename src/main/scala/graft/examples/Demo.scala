package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.GraphXBridge
import graft.dsl.G
import graft.operators.Skew
import graft.sources.GraphLoader

/** End-to-end sample of the library surface beyond the query inventory:
  * DSL chain, GraphX analytics, CSV bulk-load round trip, salted join.
  * `sbt "runMain graft.examples.Demo [sfDir]"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val g = GraphLoader.tpch(spark, sfDir)

    // 1. DSL chain
    val asiaCustomers = G(g).V("Region").has("r_name", "ASIA")
      .in("IN_REGION", "Nation").in("IN_NATION", "Customer").dedup().count()
    println(s"DEMO dsl_asia_customers=$asiaCustomers")

    // 2. GraphX connected components + PageRank
    val cc = GraphXBridge.connectedComponents(g)
    println(s"DEMO graphx_components=${cc.select("component").distinct().count()}")
    val topRank = GraphXBridge.pageRank(g).orderBy(desc("rank")).limit(1)
      .collect().head
    println(s"DEMO graphx_top_rank_label=${topRank.getLong(0)} rank=${"%.3f".format(topRank.getDouble(2))}")

    // 3. CSV bulk-load round trip
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo_csv").toString
    GraphLoader.persistCsv(g, tmp)
    val back = GraphLoader.openCsv(spark, tmp)
    println(s"DEMO csv_roundtrip_customers=${back.vertices("Customer").count()}")

    // 4. Bucketed persist: co-located hop join with zero shuffle
    val bdir = java.nio.file.Files.createTempDirectory("graft_demo_bucketed").toString
    GraphLoader.persistBucketed(g, bdir, prefix = "demo", buckets = 8)
    val bg = GraphLoader.openBucketed(spark, g, "demo")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val spec1 = graft.model.EdgeSpec("CONTAINS", "Order", "Part")
    val spec2 = graft.model.EdgeSpec("SUPPLIED_BY", "Order", "Supplier")
    val hopJoin = bg.edgeFrames(spec1).select(col("_src"), col("_dst"))
      .join(bg.edgeFrames(spec2).select(col("_src").as("_s2"), col("_dst").as("_d2")),
        col("_src") === col("_s2"))
    val shuffles = hopJoin.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Exchange hashpartitioning"))
    println(s"DEMO bucketed_hop_join_shuffles=$shuffles rows=${hopJoin.count()}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    // 5. Bounded-heap top-k == window-rank top-k
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val viaAgg = graft.ext.Similarity.bruteForceTopKAgg(emb, Seq(0L, 1L), 5)
    val viaWin = graft.ext.Similarity.bruteForceTopK(emb, Seq(0L, 1L), 5)
    val same = viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty
    println(s"DEMO topk_agg_equals_window=$same")

    // 6. Salted join vs plain join parity
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
    val plain = li.join(parts, li("l_partkey") === parts("p_partkey")).count()
    val salted = Skew.saltedEquiJoin(li, parts, "l_partkey", "p_partkey", 8).count()
    println(s"DEMO salted_join_parity=${plain == salted} rows=$salted")

    // 7. As-of join + banded range join over the event stream
    val ev = graft.queries.Extensions.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"))
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts")).agg(max("value").as("v"))
    val matched = graft.operators.AsOfJoin.backward(
      purchases, clicks, Seq("user_id"), "pts", "ts", Seq("v"))
    println(s"DEMO asof_matched=${matched.where(col("v").isNotNull).count()}/${matched.count()}")

    // 8. IVF ANN vs brute force recall
    val cids = (0 until 8).map(_ * 63L)
    val ivf = graft.ext.Similarity.ivfTopK(emb, cids, Seq(0L, 1L, 2L), 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = graft.ext.Similarity.bruteForceTopK(emb, Seq(0L, 1L, 2L), 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"DEMO ivf_recall=${(ivf & bf).size.toDouble / bf.size}")

    // 9. DSL fixpoint + paths
    val reach = G(g).V("Region", 0L).untilFixpoint()(_.both("IN_REGION")).count()
    println(s"DEMO fixpoint_reach=$reach")
    val paths = G(g).V("Region", 0L).withPath()
      .in("IN_REGION", "Nation").in("IN_NATION", "Customer").paths().count()
    println(s"DEMO paths_region0=$paths")

    // 10. SQL surface: catalog views + native functions from SQL text
    graft.sources.GraphCatalog.registerViews(g)
    graft.functions.GraftFunctions.register(spark)
    val sqlHop = spark.sql(
      """SELECT count(*) FROM e_in_nation_customer_nation e
        |JOIN v_nation n ON e._dst = n._vid WHERE n.n_regionkey = 0""".stripMargin)
      .collect().head.getLong(0)
    val sqlHash = spark.sql("SELECT rolling_hash64('graft')").collect().head.getLong(0)
    println(s"DEMO sql_hop=$sqlHop sql_hash=$sqlHash")

    // 11. The dedup pipeline end-to-end: deterministic sample -> LSH
    // candidates -> transitive clusters -> canonical survivors
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sampled = graft.ext.Sampling.hashSample(docs, col("doc_id"), 0.5)
    val clusters = graft.ext.Dedup.dedupClusters(sampled)
    val survivors = clusters.where(col("doc_id") === col("keep_id")).count()
    println(s"DEMO dedup_survivors=$survivors/${sampled.count()}")

    // 12. k-means-trained IVF vs fixed picks (20 queries for a stable read)
    val qids20 = (0L until 20L).toSeq
    val bf20 = graft.ext.Similarity.bruteForceTopK(emb, qids20, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed20 = graft.ext.Similarity.ivfTopK(emb, cids, qids20, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = graft.ext.Similarity.trainCentroids(emb, k = 8, iters = 5)
    val ivfKm = graft.ext.Similarity.ivfTopKWith(emb, trained, qids20, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"DEMO ivf_kmeans_recall=${(ivfKm & bf20).size.toDouble / bf20.size}" +
      s" fixed_recall=${(fixed20 & bf20).size.toDouble / bf20.size}")

    // 13. dense GraphX relabeling (keys beyond 48 bits)
    import spark.implicits._
    val bigGraph = new graft.graph.PropertyGraph(spark,
      Map("U" -> Seq(1L, 2L, (1L << 52) + 7).toDF("_vid")),
      Map(graft.model.EdgeSpec("KNOWS", "U", "U") -> Seq((1L, 2L)).toDF("_src", "_dst")))
    val denseComps = graft.analytics.GraphXBridge.connectedComponentsDense(bigGraph)
      .select("comp_vid").distinct().count()
    println(s"DEMO dense_cc_components=$denseComps")

    // 14. the whole corpus-construction pipeline in ONE lazy plan:
    // sample -> exact dedup -> near-dup filter -> quality floor ->
    // per-language cap (the e31 composition)
    val corpus = graft.queries.Extensions.e31_pipeline(spark, sfDir)
    println(s"DEMO pipeline_corpus_rows=${corpus.count()}")

    // 15. decontamination against a held-out benchmark split
    val bench = docs.where(col("doc_id") % 50 === 0)
    val train = docs.where(col("doc_id") % 50 =!= 0)
    val clean = graft.ext.Dedup.decontaminate(train, bench, n = 4)
    println(s"DEMO decontaminated=${clean.count()}/${train.count()}")

    // 16. Gremlin captures: customers with their orders via as()/select()
    val pairs = G(g).V("Customer").as("c").in("PLACED_BY", "Order").as("o")
      .select("c", "o").count()
    println(s"DEMO capture_pairs=$pairs")

    // 17. graph variables round-trip through persist/open
    val varDir = java.nio.file.Files.createTempDirectory("graft_demo_vars").toString
    g.variables.set("schema_version", "4")
    g.variables.set("loaded_at", "2026-08-12")
    graft.sources.GraphLoader.persist(g, varDir)
    val varsBack = graft.sources.GraphLoader.open(spark, varDir).variables.toMap
    println(s"DEMO graph_variables=${varsBack.toSeq.sorted.mkString(",")}")

    // 18. multimodal -> ANN composition: payloads -> stub embeddings ->
    // trained IVF (the e32 dataflow)
    val media = graft.ext.Multimodal.mediaFromDocuments(docs)
    val memb = graft.ext.Multimodal.mediaEmbeddings(media)
    val mcen = graft.ext.Similarity.trainCentroids(memb, k = 4, iters = 2)
    val mivf = graft.ext.Similarity.ivfTopKWith(memb, mcen, (0L until 5L).toSeq, 5)
    println(s"DEMO media_ivf_rows=${mivf.count()}")

    // 19. sequence packing + corpus health + normalized dedup
    val packed = graft.ext.Packing.contiguousPack(
      docs.select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens")),
      col("doc_id"), col("n_tokens"), budgetTokens = 2048, shards = 8)
    println(s"DEMO packs=${packed.select("shard", "pack_id").distinct().count()}" +
      s" health_rows=${graft.queries.Extensions.e39_corpus_health(spark, sfDir).count()}" +
      s" norm_dups=${graft.queries.Extensions.e37_normalized_dedup(spark, sfDir)
        .where(col("n_same") > 1).count()}")

    // 20. GraphX-delegated dedup clusters agree with the loop form
    val gxSurvivors = graft.ext.Dedup.dedupClustersGraphX(sampled)
      .where(col("doc_id") === col("keep_id")).count()
    println(s"DEMO dedup_survivors_graphx=$gxSurvivors (loop=$survivors)")

    // 21. SNB social graph: friends-of-friends, bothE edge reads, and a
    // predicate-terminated climb on the TPCH tree
    val sg = GraphLoader.snb(spark, sfDir)
    val friends = G(sg).V("Person", 0L).both("KNOWS").dedup()
    val fof = friends.as("f").both("KNOWS").dedup().count()
    val knowsEdges = G(sg).V("Person", 0L).bothE("KNOWS").count()
    val untilRegions = G(g).V("Customer")
      .repeatUntil(col("r_name").isNotNull, maxIter = 4)(
        _.union(_.out("IN_NATION", "Nation"), _.out("IN_REGION", "Region")))
      .dedup().count()
    println(s"DEMO snb_friends=${friends.count()} fof=$fof bothE_rows=$knowsEdges until_regions=$untilRegions")

    // 22. BM25 retrieval: a document's own opening retrieves neighbors
    val docsDf = docs // the frame scenario 12 already loaded
    val bmQs = docsDf.where(col("doc_id") === 7L)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("q_text"))
    val hits = graft.ext.Retrieval.bm25TopK(docsDf, bmQs, k = 3).count()
    println(s"DEMO bm25_hits=$hits")

    // 23. train a quality classifier, evaluate it, deploy it frozen
    val label = when(col("lang") === "en", 1L).otherwise(-1L)
    val model = graft.ext.Classify.perceptronTrain(docsDf, label,
      rounds = 4, buckets = 4096)
    val scored = graft.ext.Classify.score(docsDf, model, buckets = 4096)
      .join(docsDf.select(col("doc_id"), label.as("y")), "doc_id")
    val acc = scored.where(col("pred") === col("y")).count().toDouble /
      scored.count()
    val kept = graft.streaming.Streams.classifierQualityFilter(
      docsDf, graft.ext.Classify.weightsMap(model), buckets = 4096).count()
    println(s"DEMO classifier_acc=${"%.3f".format(acc)} ingest_kept=$kept")

    // 24. unigram tokenizer: learn a piece vocabulary, tile the words
    val uniVocab = graft.ext.Unigram.train(docsDf, rounds = 2)
    println(s"DEMO unigram_pieces=${uniVocab.count()}")

    // 25. graph embedding corpus: deterministic DeepWalk + node2vec walks
    val dw = graft.analytics.Iterative.deterministicWalks(sg, "Person",
      col(graft.model.GraphColumns.Id) % 50 === 3, steps = 4,
      edgeLabels = Set("KNOWS")).count()
    val n2v = graft.analytics.Iterative.node2vecWalks(sg, "Person",
      col(graft.model.GraphColumns.Id) % 50 === 7, steps = 3,
      edgeLabels = Set("KNOWS")).count()
    println(s"DEMO walk_rows=$dw node2vec_rows=$n2v")

    // 26. the round-11 curation surface in one pass: hybrid RRF
    // retrieval (lexical BM25 + bounded-heap dense ranks over the
    // shared id space), the bigram-LM loop (train split -> CCNet
    // head bucket -> frozen ingest filter), per-source domain shift,
    // WordPiece-vs-BPE first merges, and semantic decontamination
    val rq = docsDf.where(col("doc_id") % 17 === 3)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("q_text"))
    val fused = graft.ext.Retrieval.rrfFuse(
      graft.ext.Retrieval.bm25TopK(docsDf, rq, k = 5, excludeSelf = true),
      graft.ext.Retrieval.denseRanksAgg(emb, rq.select(col("query_id")), k = 5),
      k = 5).count()
    val trainPred = col("doc_id") % 5 =!= 3
    val heads = graft.ext.Text.perplexityBuckets(docsDf, trainPred)
      .where(col("bucket") === 1).count()
    val (pbM, puM) = graft.ext.Text.bigramModel(docsDf, trainPred)
    val ingest = graft.streaming.Streams.bigramSurprisalFilter(
      docsDf, pbM, puM, 0L, 200000L).count()
    val shifted = graft.ext.Text.domainShift(docsDf)
      .orderBy(desc("kl_s8")).limit(1).collect().head.getString(0)
    val wpFirst = graft.ext.Bpe.bpeMerges(docsDf, rounds = 1, likelihood = true)
      .collect().head.getString(3)
    val bpeFirst = graft.ext.Bpe.bpeMerges(docsDf, rounds = 1)
      .collect().head.getString(3)
    val dirty = graft.ext.Similarity.semanticDecontaminate(emb,
      col("vec_id") % 40 === 1, 0.2).select("vec_id").distinct().count()
    println(s"DEMO rrf_rows=$fused ppl_head_docs=$heads bigram_ingest_kept=$ingest " +
      s"top_shift_source=$shifted wordpiece_first=$wpFirst bpe_first=$bpeFirst " +
      s"semantic_dirty_docs=$dirty")

    // 27. rule gate + diversity quota: Gopher word-level flags keep the
    // prose-shaped docs, then the k-means quota picks each semantic
    // cell's prototypes — the cheap front gate and the balanced sample
    // that bound what the expensive model scorers ever see
    val gateAgg = graft.ext.Text.gopherRules(docsDf)
      .agg(sum(col("keep")).as("kept"), count(lit(1)).as("n")).head
    val quotaAgg = graft.ext.Similarity.clusterSample(emb, k = 8, iters = 2,
        perCell = 3, roundDecimals = 6)
      .agg(countDistinct(col("cell")).as("cells"), count(lit(1)).as("rows")).head
    // ...and the temperature-flattened source weights the mixer would
    // consume: the rarest source's share rises above its raw share
    val tw = graft.ext.Sampling.temperatureWeights(docsDf, col("source"))
      .orderBy(asc("n_tokens")).limit(1).collect().head
    println(s"DEMO gopher_kept=${gateAgg.getLong(0)}/${gateAgg.getLong(1)} " +
      s"quota_cells=${quotaAgg.getLong(0)} quota_rows=${quotaAgg.getLong(1)} " +
      s"rarest_source=${tw.getString(0)} raw_fp=${tw.getLong(3)} mix_fp=${tw.getLong(5)}")

    // 28. choose the dedup detector by measurement: every sub-quadratic
    // detector scored against the exact-Jaccard truth in one frame
    val sbRows = graft.ext.Dedup.dedupScoreboard(docsDf).collect()
      .map(r => s"${r.getString(0)}:p=${"%.2f".format(r.getDouble(4))}," +
        s"r=${"%.2f".format(r.getDouble(5))}").sorted.mkString(" ")
    println(s"DEMO dedup_scoreboard $sbRows")

    // 29. ...and pick the tokenizer the same way: measured fertility
    // (tokens per word) for the three trained subword models
    val fert = graft.SparkEntry.queries("e85_tokenizer_fertility")(spark, sfDir)
      .collect()
      .map(r => s"${r.getString(0)}=${"%.2f".format(r.getDouble(3))}")
      .mkString(" ")
    println(s"DEMO tokenizer_fertility $fert")

    // 30. ...and the decontamination knob too: n-gram size / Bloom /
    // fuzzy detectors scored against the exact n=4 overlap truth —
    // the bloom row reading 1.00/1.00 is the measured proof the
    // 100-TB prefilter path loses nothing
    val dsb = graft.SparkEntry.queries("e87_decon_scoreboard")(spark, sfDir)
      .collect()
      .map(r => s"${r.getString(0)}:p=${"%.2f".format(r.getDouble(4))}," +
        s"r=${"%.2f".format(r.getDouble(5))}").mkString(" ")
    println(s"DEMO decon_scoreboard $dsb")

    // 31. feed order + mixture: the easy-first curriculum schedule
    // (phase 0 first, shuffled within phase) and the DoReMi excess-
    // perplexity source weights — what the training loop would
    // actually consume downstream of all the gates above
    val cur = graft.SparkEntry.queries("e88_curriculum_order")(spark, sfDir)
    val curHead = cur.orderBy(asc("ord")).limit(3).collect()
      .map(r => s"${r.getLong(0)}@p${r.getLong(2)}").mkString(",")
    val phases = cur.agg(countDistinct(col("phase"))).head.getLong(0)
    val dor = graft.SparkEntry.queries("e89_doremi_weights")(spark, sfDir)
      .orderBy(desc("ratio_fp")).limit(1).collect().head
    println(s"DEMO curriculum_phases=$phases first_feed=$curHead " +
      s"hardest_source=${dor.getString(0)} ratio_fp=${dor.getLong(4)} " +
      s"mix_fp=${dor.getLong(6)}")

    // 32. label QC + dedup policy: can the cheap gate stand in for the
    // model scorer (chance-corrected kappa), and which copy survives
    // each near-dup cluster once quality picks instead of min-id
    val kap = graft.SparkEntry.queries("e91_rater_kappa")(spark, sfDir)
      .collect()
      .map(r => s"${r.getString(0)}~${r.getString(1)}:" +
        f"${r.getDouble(7)}%.3f").mkString(" ")
    val kb = graft.SparkEntry.queries("e94_keep_best")(spark, sfDir)
    val moved = kb.where(col("best_id") =!= col("keep_id"))
      .select(countDistinct(col("keep_id"))).head.getLong(0)
    println(s"DEMO rater_kappa $kap quality_survivor_clusters=$moved")

    // 33. retrieval-training prep + the entropy gate: BM25 hard
    // negatives with verified near-dups excluded, and the char-level
    // gibberish screen (lowest/highest entropy docs)
    val hn = graft.SparkEntry.queries("e92_hard_negatives")(spark, sfDir)
      .agg(count(lit(1)).as("rows"), countDistinct(col("query_id"))).head
    val ent = graft.SparkEntry.queries("e93_char_entropy")(spark, sfDir)
    val lo = ent.orderBy(asc("entropy8")).limit(1).collect().head
    val hi = ent.orderBy(desc("entropy8")).limit(1).collect().head
    println(s"DEMO hard_negatives=${hn.getLong(0)}/${hn.getLong(1)}q " +
      s"entropy8_min=${lo.getLong(2)}@doc${lo.getLong(0)} " +
      s"entropy8_max=${hi.getLong(2)}@doc${hi.getLong(0)}")

    // 34. the incremental-ingest loop: what the new crawl changed
    // (content-addressed snapshot diff) and which of its docs are
    // near-dups of the FROZEN corpus index (no corpus recompute)
    val sd = graft.SparkEntry.queries("e102_snapshot_diff")(spark, sfDir)
      .groupBy("status").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    val ing = graft.SparkEntry.queries("e97_index_dedup")(spark, sfDir)
      .agg(count(lit(1)), countDistinct(col("new_id"))).head
    println(s"DEMO snapshot_diff $sd " +
      s"ingest_dups=${ing.getLong(0)}pairs/${ing.getLong(1)}docs")

    // 35. which retriever, and can the cheap LM gate for the good one:
    // measured precision/recall@10 + MRR per retriever, and the
    // bigram-vs-KN-trigram rank agreement (rho 0.36 here = NO, the
    // cheap scorer does not stand in on this corpus)
    val rsb = graft.SparkEntry.queries("e96_retrieval_scoreboard")(spark, sfDir)
      .collect()
      .map(r => f"${r.getString(0)}:mrr=${r.getDouble(8)}%.3f").mkString(" ")
    val lmA = graft.SparkEntry.queries("e104_lm_agreement")(spark, sfDir)
      .collect().head
    println(s"DEMO retrieval_scoreboard $rsb " +
      f"lm_rank_agreement=${lmA.getDouble(4)}%.3f")

    // 36. embedding hygiene: the exact PCA corpus axis (1-D spread for
    // range sharding / drift watch) and the division-free whitening
    // whose w.v = 0 law both engines verify as integer zero
    val pca = graft.SparkEntry.queries("e100_pca_scores")(spark, sfDir)
      .agg(min(col("pc1_fp")), max(col("pc1_fp"))).head
    println(s"DEMO pca_axis=[${pca.getLong(0)},${pca.getLong(1)}] " +
      s"whitened_rows=${graft.SparkEntry.queries("e105_pc1_removal")(spark, sfDir).count()}")

    // 37. how much padding each packing policy costs, measured: raw
    // contiguous (overflow semantics), split-then-pack, and the
    // boundary-free concat-cut ceiling at the same budget
    val pk = graft.SparkEntry.queries("e103_packing_scoreboard")(spark, sfDir)
      .collect()
      .map(r => s"${r.getString(0)}=${r.getLong(3)}milli/${r.getLong(1)}packs")
      .mkString(" ")
    println(s"DEMO packing_fill $pk")

    // 38. subsample-to-budget and the drift dashboard: a length-
    // proportional deterministic sample (A-Res race), and each
    // source's mean position along the frozen corpus axis per
    // snapshot half — the crawl-over-crawl drift number
    val ws = graft.SparkEntry.queries("e107_weighted_sample")(spark, sfDir)
      .agg(count(lit(1)), sum(col("n_tokens"))).head
    val dr = graft.SparkEntry.queries("e108_axis_drift")(spark, sfDir)
      .orderBy("source", "half").limit(4).collect()
      .map(r => s"${r.getString(0)}/h${r.getLong(1)}=${r.getLong(3)}")
      .mkString(" ")
    println(s"DEMO weighted_sample=${ws.getLong(0)}docs/${ws.getLong(1)}tokens " +
      s"axis_drift $dr")

    // 39. the round-14 seam closures: whiten THEN dedup as one plan
    // (how many drops survive once the common direction is gone), the
    // k-D corpus map (three exact axes per vector), and the
    // delta-driven dashboard refresh (hash-equal to a full recompute,
    // paying only the delta's feature work)
    val wsd = graft.SparkEntry.queries("e109_whitened_semdedup")(spark, sfDir)
    val kmap = graft.SparkEntry.queries("e106_pca_map")(spark, sfDir)
      .agg(min(col("pc3_fp")), max(col("pc3_fp"))).head
    val ih = graft.SparkEntry.queries("e110_incremental_health")(spark, sfDir)
      .agg(count(lit(1)), sum(col("n_docs"))).head
    println(s"DEMO whitened_dropped=${wsd.count()} " +
      s"pc3_range=[${kmap.getLong(0)},${kmap.getLong(1)}] " +
      s"refreshed_groups=${ih.getLong(0)}/${ih.getLong(1)}docs")

    // 40. the search index survives the crawl: top-25 heavy hitters,
    // the MinHash index and BM25 ranking all re-derived from frozen
    // state + the delta, each hash-equal to a full rebuild
    val hh = graft.SparkEntry.queries("e111_incremental_hh")(spark, sfDir)
      .limit(1).collect().head
    val sig = graft.SparkEntry.queries("e112_incremental_index")(spark, sfDir)
    val bm = graft.SparkEntry.queries("e113_incremental_bm25")(spark, sfDir)
    println(s"DEMO incremental top_term=${hh.getString(0)}x${hh.getLong(1)} " +
      s"index_rows=${sig.count()} bm25_rows=${bm.count()}")

    // 41. the whole maintenance pass off ONE diff: all five frozen
    // artifacts (dashboard, heavy hitters, MinHash index, BM25
    // serving, PCA axis) refreshed from a single materialized
    // work-list pair; plus the ANN assignment index upsert and the
    // dirty-shard repack that leaves clean training shards byte-equal
    val all15 = graft.SparkEntry.queries("e115_incremental_all")(spark, sfDir)
    val byArtifact = all15.groupBy("artifact").count()
      .orderBy("artifact").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    val ann = graft.SparkEntry.queries("e116_incremental_ann")(spark, sfDir)
    val rp = graft.SparkEntry.queries("e118_delta_repack")(spark, sfDir)
      .agg(max(col("pack_id")), count(lit(1))).collect().head
    println(s"DEMO one_diff_all_consumers $byArtifact " +
      s"ann_assignments=${ann.count()} " +
      s"repacked_rows=${rp.getLong(1)} max_pack=${rp.getLong(0)}")

    // 42. the crawl→retrain inputs survive the crawl too: the
    // co-occurrence matrix and both LM count frames maintained off
    // the same content-addressed diff, each hash-equal to a retrain
    val cooc = graft.SparkEntry.queries("e119_incremental_cooc")(spark, sfDir)
      .limit(1).collect().head
    val lm = graft.SparkEntry.queries("e120_incremental_lm")(spark, sfDir)
    val kn = graft.SparkEntry.queries("e121_incremental_kn")(spark, sfDir)
    println(s"DEMO retrain_inputs top_pair=${cooc.getString(0)}+" +
      s"${cooc.getString(1)} bigram_scored=${lm.count()} " +
      s"kn_scored=${kn.count()}")

    spark.stop()
  }
}
