package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.cosineSimilarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosineSimilarity matches hand computation") {
    val df = Seq((Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 1f, 0f), Array(1f, 1f, 0f)),
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val sims = df.select(cosineSimilarity(col("a"), col("b"))).as[Double].collect()
    assert(sims(0) == 0.0)
    assert(math.abs(sims(1) - 1.0) < 1e-12)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(sims(2) - expected) < 1e-12)
  }

  test("bruteForceTopK returns k nearest excluding self, deterministic order") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f)),
      (3L, Array(0.8f, 0.3f)), (4L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val top2 = Similarity.bruteForceTopK(vecs, Seq(0L), 2)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(top2 == Seq(1L, 3L))
  }

  test("bounded-heap top-k aggregator returns exactly the window-rank rows") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 10L).toSeq
    val viaWindow = Similarity.bruteForceTopK(emb, qids, 10)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    val viaAgg = Similarity.bruteForceTopKAgg(emb, qids, 10)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("lsh recall on fixture embeddings is usable and candidates are pruned") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 10L).toSeq
    val bf = Similarity.bruteForceTopK(emb, qids, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(emb, qids, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf & ann).size.toDouble / bf.size
    // near-random fixture vectors: worst case for hyperplane LSH
    assert(recall > 0.4, s"recall=$recall")
  }

  test("multi-probe lsh: probes=0 == plain form, recall monotone in probes, hits superset") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 10L).toSeq
    def hits(probes: Int): Set[(Long, Long)] =
      Similarity.lshTopK(emb, qids, 10, probes = probes)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val plain = Similarity.lshTopK(emb, qids, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(hits(0) == plain) // probes = 0 IS the plain banded form
    val bf = Similarity.bruteForceTopK(emb, qids, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(s: Set[(Long, Long)]): Double = (bf & s).size.toDouble / bf.size
    // the probe ring only ADDS candidates, so top-k recall is monotone
    // non-decreasing in probes (the returned top-k itself may differ —
    // better candidates displace worse ones)
    val r = Seq(0, 1, 4).map(p => recall(hits(p)))
    assert(r == r.sorted, s"recall not monotone in probes: $r")
    assert(r.last > r.head,
      s"full Hamming-1 probing gained no recall on the fixture: $r")
  }

  test("lshTopKWith over a prebuilt index equals lshTopK, any probe setting") {
    // The r16 seam: one materialized corpus-side band index serves the
    // plain AND multi-probe forms (the e72 scoreboard builds it once) —
    // the law is exact row equality with the fused form, both settings.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 10L).toSeq
    val idx = Similarity.lshCandidateIndex(emb).localCheckpoint()
    for (probes <- Seq(0, 4)) {
      val fused = Similarity.lshTopK(emb, qids, 10, probes = probes)
        .select("query_id", "neighbor_id", "sim")
        .as[(Long, Long, Double)].collect().toSet
      val split = Similarity.lshTopKWith(emb, idx, qids, 10, probes = probes)
        .select("query_id", "neighbor_id", "sim")
        .as[(Long, Long, Double)].collect().toSet
      assert(split == fused, s"probes=$probes")
    }
  }

  test("ivf top-k: every cell assignment is the true nearest centroid and recall is usable") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 10L).toSeq
    val cids = (0 until 8).map(_ * 63L)
    val ivf = Similarity.ivfTopK(emb, cids, qids, 10, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    // each query returns at most k, all from probed cells, no self matches
    assert(ivf.groupBy(_._1).values.forall(_.size <= 10))
    assert(ivf.forall { case (q, n) => q != n })
    val bf = Similarity.bruteForceTopK(emb, qids, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    // random fixture vectors spread thin over 8 cells; nprobe=2 of 8 means
    // ~25% of the corpus is scored — recall well above that floor shows the
    // cells are informative
    assert(recall > 0.3, s"recall=$recall")
  }

  test("ivf assignment upsert equals a full re-assign (frozen centroids)") {
    // the e116 law: under a FROZEN quantizer, anti-join + delta
    // re-assign is indistinguishable from rebuilding the serving index
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val older = emb.where(col("vec_id") % 5 =!= 1)
    val newer = emb.where(col("vec_id") % 4 =!= 2)
    val cen = emb.where(col("vec_id").isin((0 until 8).map(_ * 63L): _*))
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val subIds = older.join(newer, Seq("vec_id"), "left_anti")
      .select("vec_id")
    val addIds = newer.join(older, Seq("vec_id"), "left_anti")
      .select("vec_id")
    val full = Similarity.ivfAssignments(newer, cen).collect().toSet
    val inc = graft.ext.Snapshot.refreshIvfAssignments(
      Similarity.ivfAssignments(older, cen), newer, cen, subIds, addIds)
      .collect().toSet
    assert(inc == full && inc.nonEmpty)
  }

  test("broadcast-kernel near-dup pairs are pair-for-pair identical to the join form") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val slow = Similarity.embeddingNearDupPairs(emb, 0.3)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    val fast = Similarity.embeddingNearDupPairsFast(emb, 0.3)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(fast == slow) // exact doubles, not approximate
    assert(fast.nonEmpty)

    // Multi-block path (the 100 TB shape): tiny block size forces the
    // corpus through 4 broadcast passes; the union must be identical —
    // every pair emitted exactly once, same values.
    val blocked = Similarity.embeddingNearDupPairsFast(emb, 0.3, maxBlockRows = 128)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect()
    assert(blocked.length == blocked.toSet.size) // no duplicate pairs across passes
    assert(blocked.toSet == slow)
  }

  test("k-means centroids match or beat the fixed picks' recall") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 20L).toSeq
    val bf = Similarity.bruteForceTopK(emb, qids, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(ivf: org.apache.spark.sql.DataFrame): Double = {
      val got = ivf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (bf & got).size.toDouble / bf.size
    }
    val fixedIds = (0 until 8).map(_ * 63L)
    val fixed = recall(Similarity.ivfTopK(emb, fixedIds, qids, 10, nprobe = 2))
    val trained = Similarity.trainCentroids(emb, k = 8, iters = 5)
    assert(trained.count() <= 8 && trained.count() > 1)
    val km = recall(Similarity.ivfTopKWith(emb, trained, qids, 10, nprobe = 2))
    assert(km >= fixed, s"k-means recall $km < fixed-pick recall $fixed")
  }

  test("ivf with nprobe = #centroids equals brute force") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 5L).toSeq
    val cids = (0 until 4).map(_ * 100L)
    val ivf = Similarity.ivfTopK(emb, cids, qids, 10, nprobe = 4)
      .select("query_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect().toSet
    val bf = Similarity.bruteForceTopK(emb, qids, 10)
      .select("query_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect().toSet
    assert(ivf == bf)
  }

  test("sq8 with rerank >= corpus equals brute force; codes stay in [0,255]") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val n = emb.count().toInt
    val qids = (0L until 5L).toSeq
    val sq = Similarity.sq8TopK(emb, qids, 10, rerank = n, dims = 64)
      .select("query_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect().toSet
    val bf = Similarity.bruteForceTopK(emb, qids, 10)
      .select("query_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect().toSet
    assert(sq == bf)
    // encoding invariants: every code integer-valued in [0, 255]
    val codes = Similarity.sq8Encode(emb, Similarity.sq8Ranges(emb), 64)
      .select(explode(col("code")).as("c")).as[Float].collect()
    assert(codes.forall(c => c >= 0f && c <= 255f && c == math.floor(c)))
    // the narrow rerank window still returns k rows per query
    val narrow = Similarity.sq8TopK(emb, qids, 5, rerank = 10, dims = 64)
    assert(narrow.groupBy("query_id").count().select("count")
      .as[Long].collect().forall(_ == 5L))
  }

  test("semDedup equals the window-assigned brute-force reference") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (k, iters, thr) = (4, 1, 0.35)
    val dropped = Similarity.semDedup(emb, k, iters, thr, roundDecimals = 6)
      .select("vec_id", "kept_by", "sim").as[(Long, Long, Double)].collect().toSet
    assert(dropped.nonEmpty) // 257 brute pairs >= 0.35 on this fixture

    // Independent reference: same trained centroids, but assignment via
    // a per-vector WINDOW rank (not the argmax agg), pair scoring via
    // the all-pairs operator filtered to same-cell, keep-first by
    // groupBy-min (not a window).
    val cen = Similarity.trainCentroids(emb, k, iters, roundDecimals = 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("csim"), asc("cid"))
    val cells = emb.crossJoin(cen)
      .withColumn("csim", round(cosineSimilarity(col("embedding"), col("cv")), 9))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val pairs = Similarity.embeddingNearDupPairs(emb, thr)
      .join(cells.select(col("vec_id").as("id_a"), col("cell").as("ca")), "id_a")
      .join(cells.select(col("vec_id").as("id_b"), col("cell").as("cb")), "id_b")
      .where(col("ca") === col("cb"))
    val ref = pairs.groupBy(col("id_b").as("vec_id"))
      .agg(min(struct(col("id_a"), col("sim"))).as("m"))
      .select(col("vec_id"), col("m.id_a").as("kept_by"), col("m.sim").as("sim"))
      .as[(Long, Long, Double)].collect().toSet
    assert(dropped == ref)

    // Survivors' law: no dropped id ever appears as a keeper of a
    // SMALLER id (keep-first drops strictly greater pair members).
    dropped.foreach { case (v, kept, _) => assert(kept < v) }
  }

  test("semDedupAuto equals semDedup at the k it derives") {
    // The production k-schedule (k = ceil(n / targetCell)) must be a
    // pure parameter derivation — same clustering, same pairs, same
    // drops as the fixed-k call it resolves to. n = 100 here, so
    // targetCell 25 -> k 4 (exact) and targetCell 30 -> k 4 (ceil).
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val n = emb.count()
    for (targetCell <- Seq(25, 30)) {
      val k = ((n + targetCell - 1) / targetCell).toInt
      val auto = Similarity.semDedupAuto(emb, targetCell, iters = 1,
        threshold = 0.35, roundDecimals = 6)
        .as[(Long, Long, Double)].collect().toSet
      val fixed = Similarity.semDedup(emb, k, iters = 1,
        threshold = 0.35, roundDecimals = 6)
        .as[(Long, Long, Double)].collect().toSet
      assert(auto == fixed, s"targetCell=$targetCell k=$k")
      assert(auto.nonEmpty)
    }
  }

  test("row-local literal argmax == broadcast-join argmax agg (the round-16 assignment law)") {
    // The round-16 optimization replaced the k-centroid broadcast join +
    // map-side max(struct) agg with a row-local array_max over collected
    // centroid literals (Similarity.bestCellStruct). This law pins
    // value-identity against the former form, rebuilt inline: same
    // rounded sim, same smaller-cid tie-break, cell for cell.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cen = Similarity.trainCentroids(emb, k = 4, iters = 2, roundDecimals = 6)
    val rowLocal = Similarity.ivfAssignments(emb, cen)
      .as[(Long, Long)].collect().toSet
    val csim = round(cosineSimilarity(col("embedding"), col("cv")), 9)
    val joined = emb.join(broadcast(cen)).groupBy(col("vec_id"))
      .agg(max(struct(csim.as("sim"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), (-col("best.ncid")).as("cell"))
      .as[(Long, Long)].collect().toSet
    assert(rowLocal == joined)
    assert(rowLocal.nonEmpty)
  }

  test("sampled train == trainCentroids on the hash sample; semDedupAuto switches above the cap") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val n = emb.count()
    val (iters, thr) = (1, 0.35)

    // Law 1 (the VERDICT r15 wording): the sampled trainer IS the
    // fixed-k trainer applied to the deterministic hash sample —
    // bit-identical centroids, cid for cid.
    val f = 0.5
    val sampled = Similarity.trainCentroidsSampled(emb, k = 4, iters,
      roundDecimals = 6, trainFraction = f)
      .select(col("cid"), col("cv")).as[(Long, Array[Float])].collect()
      .map { case (c, v) => (c, v.toSeq) }.toSet
    val direct = Similarity.trainCentroids(
      Sampling.hashSample(emb, col("vec_id"), f), k = 4, iters,
      roundDecimals = 6)
      .select(col("cid"), col("cv")).as[(Long, Array[Float])].collect()
      .map { case (c, v) => (c, v.toSeq) }.toSet
    assert(sampled == direct)
    assert(sampled.nonEmpty)
    // The sample is a strict, non-empty subset — the law is not
    // vacuously comparing full-corpus trains.
    val sn = Sampling.hashSample(emb, col("vec_id"), f).count()
    assert(sn > 0 && sn < n)

    // Law 2: above the cap, semDedupAuto routes through the sampled
    // chain at its derived k and fraction cap/n — same drops, pair
    // for pair; below the cap (the default), it is the full-train
    // path the earlier law pins.
    val cap = n / 2
    val targetCell = 25
    val k = ((n + targetCell - 1) / targetCell).toInt
    val auto = Similarity.semDedupAuto(emb, targetCell, iters, thr,
      roundDecimals = 6, maxTrainRows = cap)
      .as[(Long, Long, Double)].collect().toSet
    val explicit = Similarity.semDedupSampled(emb, k, iters, thr,
      roundDecimals = 6, trainFraction = cap.toDouble / n)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto == explicit)
    assert(auto.nonEmpty)
  }

  test("clusterSample keeps each cell's top-perCell prototypes, window-reference-exact") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (k, iters, per) = (4, 1, 3)
    val got = Similarity.clusterSample(emb, k, iters, per, roundDecimals = 6)
      .select("cell", "vec_id", "sim", "rnk").as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    // Quota law: at most perCell rows per cell, ranks dense from 1.
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.length <= per)
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }

    // Independent reference: window-ranked assignment (the semDedup
    // spec's cross-join form, not the argmax agg), then a per-cell
    // window rank — must match row-for-row including sims.
    val cen = Similarity.trainCentroids(emb, k, iters, roundDecimals = 6)
    val wAsg = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("csim"), asc("cid"))
    val cells = emb.crossJoin(cen)
      .withColumn("csim", round(cosineSimilarity(col("embedding"), col("cv")), 9))
      .withColumn("rn", row_number().over(wAsg)).where(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"), col("csim").as("sim"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(desc("sim"), asc("vec_id"))
    val ref = cells.withColumn("rnk", row_number().over(wRank))
      .where(col("rnk") <= per)
      .select("cell", "vec_id", "sim", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got.toSet == ref)
  }

  test("clusterDiversity: entropy poles, driver replay, partitioning independence") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (k, iters) = (4, 1)
    // groups: one "concentrated" group = copies of the SAME vector id
    // modulo assignment (every member lands in one cell -> entropy 0)
    // versus the id-striped rest
    val cen = Similarity.trainCentroids(emb, k, iters, roundDecimals = 6)
    val groups = emb.select(col("vec_id"),
      when(col("vec_id") < 10, lit("tight")).otherwise(
        concat(lit("g"), (col("vec_id") % 3).cast("string"))).as("source"))
    val out = Similarity.clusterDiversity(emb, groups, k, iters, roundDecimals = 6)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // driver replay from the independently-computed assignment
    val wAsg = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("csim"), asc("cid"))
    val cells = emb.crossJoin(cen)
      .withColumn("csim", round(cosineSimilarity(col("embedding"), col("cv")), 9))
      .withColumn("rn", row_number().over(wAsg)).where(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
      .join(groups, "vec_id")
      .as[(Long, Long, String)].collect()
    def log8(x: Long) = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      8L * e + ((x * 8) >> e) - 8
    }
    cells.groupBy(_._3).foreach { case (src, rows) =>
      val n = rows.length.toLong
      val cnts = rows.groupBy(_._2).values.map(_.length.toLong)
      val want = cnts.map(c => c * (log8(n) - log8(c))).sum / n
      val (_, nv, nc, e8) = out(src)
      assert(nv == n && nc == cnts.size.toLong && e8 == want, s"$src")
    }
    // a single-cell group reads exactly 0
    val one = Similarity.clusterDiversity(emb,
        emb.select(col("vec_id"), lit("all").as("source")).where(col("vec_id") === 0),
        k, iters, roundDecimals = 6)
      .as[(String, Long, Long, Long)].collect()
    assert(one.toSeq == Seq(("all", 1L, 1L, 0L)))
    // partitioning independence
    val again = Similarity.clusterDiversity(emb.repartition(7), groups, k, iters,
        roundDecimals = 6)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == out)
  }

  test("pq with one subspace and a per-vector codebook is exact L2 search") {
    // m=1, ks=n, 0 Lloyd rounds: every vector is its own centroid, so
    // each code IS the vector and the ADC "approximation" collapses to
    // the exact rounded L2 distance — PQ must equal brute force.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(200)
      .localCheckpoint()
    val n = emb.count().toInt
    val qids = (0L until 5L).toSeq
    val pq = Similarity.pqTopK(emb, qids, 10, m = 1, ks = n, iters = 0)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Double)].collect().toSet
    val e = emb.select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val d2 = round(
      graft.functions.dotProduct(col("qv"), col("qv"))
        + graft.functions.dotProduct(col("embedding"), col("embedding"))
        - lit(2.0) * graft.functions.dotProduct(col("qv"), col("embedding")), 9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(asc("d"), asc("vec_id"))
    val bf = q.crossJoin(e).where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        d2.cast("decimal(28,9)").cast("double").as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(asc("d"), asc("neighbor_id"))))
      .where(col("rn") <= 10).select("query_id", "neighbor_id", "d")
      .as[(Long, Long, Double)].collect().toSet
    assert(pq == bf)
  }

  test("ivf-pq probing every cell equals plain pq") {
    // nprobe = kc removes the inverted-file restriction entirely — the
    // candidate set is the whole corpus and IVF-PQ must reproduce
    // pqTopK's ADC ranking exactly (same codebooks, same sums).
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 5L).toSeq
    val pq = Similarity.pqTopK(emb, qids, 5, m = 4, ks = 4, iters = 2,
        roundDecimals = 6)
      .as[(Long, Long, Double)].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(emb, qids, 5, kc = 4, nprobe = 4,
        m = 4, ks = 4, iters = 2, roundDecimals = 6)
      .as[(Long, Long, Double)].collect().toSet
    assert(pq == ivfpq && pq.nonEmpty)
  }

  test("residual ivf-pq with one coarse cell equals plain pq on the centered corpus") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 5L).toSeq
    val res = Similarity.ivfPqResidualTopK(emb, qids, 5, kc = 1, nprobe = 1,
        m = 4, ks = 4, iters = 2, dims = 64, roundDecimals = 6)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Double)].collect().toSet
    // with kc = 1 every Lloyd round re-averages the whole corpus, so the
    // coarse centroid is the rounded global mean and every residual is
    // the centered vector — plain PQ over the centered corpus must agree
    val mean = emb.select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos").agg(round(avg("x"), 6).cast("float").as("m"))
      .orderBy("pos").select("m").as[Float].collect()
    val meanLit = typedLit(mean.toSeq)
    val centered = emb.select(col("vec_id"),
      transform(sequence(lit(1), lit(64)), i =>
        element_at(col("embedding"), i).cast("double")
          - element_at(meanLit, i).cast("double")).as("embedding"))
    val pq = Similarity.pqTopK(centered, qids, 5, m = 4, ks = 4, iters = 2,
        dims = 64, roundDecimals = 6)
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Double)].collect().toSet
    assert(res.nonEmpty && res == pq)
  }

  test("hardTriplets: least-similar same-label positive, most-similar other-label negatives") {
    val vecs = Seq(
      (0L, Array(1f, 0f), 1),
      (1L, Array(0.95f, 0.1f), 1),  // same label, very similar
      (2L, Array(0f, 1f), 1),       // same label, dissimilar -> hardest positive
      (3L, Array(0.99f, 0.05f), 2), // other label, most similar -> rank-1 negative
      (4L, Array(-1f, 0f), 2))      // other label, far
      .toDF("vec_id", "embedding", "label")
    val t = Similarity.hardTriplets(vecs, Seq(0L), k = 2)
      .select("query_id", "pos_id", "neg_id").as[(Long, Long, Long)].collect()
    assert(t.length == 2)
    assert(t.map(_._2).toSet == Set(2L))
    assert(t.map(_._3).toSet == Set(3L, 4L))
    val negOrder = Similarity.hardTriplets(vecs, Seq(0L), k = 1)
      .select("neg_id").as[Long].collect()
    assert(negOrder.toSeq == Seq(3L))
    // an anchor with no same-label partner yields no triple
    val only = Similarity.hardTriplets(
      vecs.where($"vec_id".isin(0L, 3L, 4L)), Seq(0L), 2)
    assert(only.count() == 0)
  }

  test("pq codes compress to m entries per vector with codebook-bounded ids") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qids = (0L until 3L).toSeq
    val topk = Similarity.pqTopK(emb, qids, 5, m = 4, ks = 4, iters = 2,
      roundDecimals = 6)
    assert(topk.count() == qids.size * 5)
    val cb = Similarity.pqCodebooks(emb, m = 4, ks = 4, iters = 2, dims = 64,
      roundDecimals = 6)
    // codebook: <= ks entries per subspace, 16-dim float means
    val perSub = cb.groupBy("sub").count().as[(Int, Long)].collect().toMap
    assert(perSub.keySet == (0 until 4).toSet)
    assert(perSub.values.forall(c => c >= 1 && c <= 4))
    val lens = cb.select(size(col("cv"))).distinct().as[Int].collect().toSeq
    assert(lens == Seq(16))
  }

  test("semanticDecontaminate == cross-split restriction of the all-pairs report") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val tau = 0.2 // low enough for hits on the tiny fixture
    val flagged = Similarity.semanticDecontaminate(emb,
        col("vec_id") % 40 === 1, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cross = Similarity.embeddingNearDupPairs(emb, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, s) =>
        (a % 40 == 1, b % 40 == 1) match {
          case (true, false) => Some((b, a, s)) // (corpus, bench, sim)
          case (false, true) => Some((a, b, s))
          case _             => None // within-side pairs are not leakage
        }
      }
    assert(flagged.nonEmpty)
    assert(flagged.toSet == cross.toSet)
    assert(flagged.forall { case (c, b, _) => c % 40 != 1 && b % 40 == 1 })
  }
}
