package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("diff: the four statuses, hand fixture") {
    val older = snap(1L -> "same", 2L -> "was this", 3L -> "gone")
    val newer = snap(1L -> "same", 2L -> "now this", 4L -> "fresh")
    val out = Snapshot.diff(older, newer)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(2L -> "changed", 3L -> "removed", 4L -> "added"))
    val stats = Snapshot.diffStats(older, newer)
      .as[(String, Long)].collect().toMap
    assert(stats == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("diff laws: self-diff empty; statuses partition the id union") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(Snapshot.diff(docs, docs).isEmpty)
    val older = docs.where(col("doc_id") % 7 =!= 2)
    val newer = docs.where(col("doc_id") % 13 =!= 5)
    val stats = Snapshot.diffStats(older, newer)
      .as[(String, Long)].collect().toMap
    val union = older.select("doc_id").union(newer.select("doc_id"))
      .distinct().count()
    assert(stats.values.sum == union)
    assert(stats("added") == newer.join(older, Seq("doc_id"), "left_anti").count())
    assert(stats("removed") == older.join(newer, Seq("doc_id"), "left_anti").count())
    assert(!stats.contains("changed")) // same content either side here
  }

  test("NULL content classifies by id presence, not hash nullness") {
    // advisor round 13: a NULL text md5s to NULL, and hash-nullness
    // classification would read these present-in-both rows as
    // added/removed. Presence is a per-side flag; the hash compare is
    // null-safe (NULL==NULL -> unchanged, NULL vs text -> changed).
    val older = snap(1L -> null, 2L -> null, 3L -> "text", 4L -> null)
    val newer = snap(1L -> null, 2L -> "born", 3L -> null, 5L -> null)
    val stats = Snapshot.diffStats(older, newer)
      .as[(String, Long)].collect().toMap
    assert(stats == Map("unchanged" -> 1L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
    val out = Snapshot.diff(older, newer)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("refreshHealth: incremental merge equals the full recompute; dead groups drop") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // an independent construction (different moduli than e110)
    val older = docs.where(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 9 === 0,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    val newer = docs.where(col("doc_id") % 4 =!= 2)
    def finish(sums: org.apache.spark.sql.DataFrame) = sums
      .select(col("source"), col("lang"), col("n_docs"), col("sum_tokens"),
        (col("sum_q").cast("double") / col("n_docs").cast("double"))
          .as("avg_quality"))
    val full = finish(Snapshot.healthSums(newer))
      .as[(String, String, Long, Long, Double)].collect().toSet
    val inc = Snapshot.refreshHealth(Snapshot.healthSums(older), older, newer)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(inc == full && inc.nonEmpty)
    // a group whose mass cancels to zero must DROP, not read 0/0:
    // older holds one group that newer loses entirely
    val o2 = Seq((1L, "gone", "xx", "one two three"), (2L, "kept", "yy", "four five"))
      .toDF("doc_id", "source", "lang", "text")
    val n2 = Seq((2L, "kept", "yy", "four five"))
      .toDF("doc_id", "source", "lang", "text")
    val inc2 = Snapshot.refreshHealth(Snapshot.healthSums(o2), o2, n2)
      .select("source").as[String].collect().toSet
    assert(inc2 == Set("kept"))
  }

  test("refreshHeavyHitters: merged counts equal the full recompute; cancelled terms drop") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val older = docs.where(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 9 === 0,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    val newer = docs.where(col("doc_id") % 4 =!= 2)
    val full = graft.ext.Sketches.heavyHittersExact(newer, k = 25)
      .as[(String, Long)].collect().toSeq
    val inc = Snapshot.refreshHeavyHitters(
      Snapshot.termCounts(older), older, newer, k = 25)
      .as[(String, Long)].collect().toSeq
    assert(inc == full && inc.size == 25)
    // a term alive only in removed docs must CANCEL out of the frame
    val o2 = Seq((1L, "unique_gone_term x"), (2L, "x y")).toDF("doc_id", "text")
    val n2 = Seq((2L, "x y")).toDF("doc_id", "text")
    val inc2 = Snapshot.refreshHeavyHitters(
      Snapshot.termCounts(o2), o2, n2, k = 10)
      .select("term").as[String].collect().toSet
    assert(inc2 == Set("x", "y"))
  }

  test("refreshSignatureIndex: maintained index equals a full rebuild") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val older = docs.where(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 9 === 0,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    val newer = docs.where(col("doc_id") % 4 =!= 2)
    val full = Dedup.minhashSignatures(newer)
      .orderBy("doc_id").collect().toSeq
    val inc = Snapshot.refreshSignatureIndex(
      Dedup.minhashSignatures(older), older, newer)
      .orderBy("doc_id").collect().toSeq
    assert(inc == full && inc.nonEmpty)
    // a changed doc that collapses below the shingle width must leave
    // the index (both paths: the signature aggregate never sees it)
    val o2 = Seq((1L, "a b c d e"), (2L, "p q r s t")).toDF("doc_id", "text")
    val n2 = Seq((1L, "a b"), (2L, "p q r s t")).toDF("doc_id", "text")
    val inc2 = Snapshot.refreshSignatureIndex(
      Dedup.minhashSignatures(o2), o2, n2)
      .select("doc_id").as[Long].collect().toSet
    assert(inc2 == Set(2L))
  }

  test("skipping a crawl is sound: diff(t0,t2) is presence+content alone, no t1 state") {
    // the property an incremental pipeline relies on when a crawl is
    // skipped: the direct t0->t2 diff depends ONLY on the two
    // endpoints (independent driver-side replay from presence sets +
    // content hashes) — intermediate t1 states (including
    // changed-then-reverted content) cannot leak into it
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val t0 = docs.where(col("doc_id") % 3 =!= 0)
    val t2 = docs.where(col("doc_id") % 6 =!= 2)
    val direct = Snapshot.diff(t0, t2)
      .as[(Long, String)].collect().toMap
    val ids0 = t0.select("doc_id").as[Long].collect().toSet
    val ids2 = t2.select("doc_id").as[Long].collect().toSet
    val h0 = t0.select(col("doc_id"), md5(col("text"))).as[(Long, String)]
      .collect().toMap
    val h2 = t2.select(col("doc_id"), md5(col("text"))).as[(Long, String)]
      .collect().toMap
    val composed = (ids0 ++ ids2).flatMap { id =>
      (ids0.contains(id), ids2.contains(id)) match {
        case (false, true) => Some(id -> "added")
        case (true, false) => Some(id -> "removed")
        case (true, true) =>
          if (h0(id) != h2(id)) Some(id -> "changed") else None
        case _ => None
      }
    }.toMap
    assert(direct == composed && direct.nonEmpty)
  }

  test("co-bucketed snapshots diff with no shuffle exchange (the 100 TB claim, plan-asserted)") {
    // the scaladoc's scale shape made checkable: both snapshots
    // persisted bucketBy(id) -> the full-outer hash join reads
    // pre-bucketed, no Exchange anywhere in the diff plan
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val older = docs.where(col("doc_id") % 7 =!= 2)
    val newer = docs.where(col("doc_id") % 13 =!= 5)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      older.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("snap_old_b")
      newer.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("snap_new_b")
      val diffed = Snapshot.diff(spark.table("snap_old_b"),
        spark.table("snap_new_b"))
      // correctness unchanged by the layout
      val want = Snapshot.diff(older, newer)
        .as[(Long, String)].collect().toSet
      assert(diffed.as[(Long, String)].collect().toSet == want)
      val plan = diffed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS snap_old_b")
      spark.sql("DROP TABLE IF EXISTS snap_new_b")
    }
  }

  test("refreshBm25Index: every maintained frame equals a full rebuild's") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val older = docs.where(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 9 === 0,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    val newer = docs.where(col("doc_id") % 4 =!= 2)
    val full = graft.ext.Retrieval.buildBm25Index(newer)
    val inc = Snapshot.refreshBm25Index(
      graft.ext.Retrieval.buildBm25Index(older), older, newer)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSet
    assert(rows(inc.postings) == rows(full.postings))
    assert(rows(inc.dl) == rows(full.dl))
    assert(rows(inc.dfreq) == rows(full.dfreq))
    assert(inc.dfreq.count() > 0)
    // a term alive only in subtracted docs cancels out of the df frame
    val o2 = Seq((1L, "unique_df_term x"), (2L, "x y")).toDF("doc_id", "text")
    val n2 = Seq((2L, "x y")).toDF("doc_id", "text")
    val inc2 = Snapshot.refreshBm25Index(
      graft.ext.Retrieval.buildBm25Index(o2), o2, n2)
    assert(inc2.dfreq.select("_t").as[String].collect().toSet == Set("x", "y"))
  }

  test("refreshCooccurrence: merged pair mass equals the full recompute; cancelled pairs drop") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val older = docs.where(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 9 === 0,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    val newer = docs.where(col("doc_id") % 4 =!= 2)
    val full = Text.cooccurrence(newer, window = 3)
      .orderBy("center", "context").collect().toSeq
    val inc = Snapshot.refreshCooccurrence(
      Text.cooccurrence(older, window = 3), older, newer, window = 3)
      .orderBy("center", "context").collect().toSeq
    assert(inc == full && inc.nonEmpty)
    // a pair alive only in removed docs must CANCEL out of the frame
    val o2 = Seq((1L, "unique gone"), (2L, "x y")).toDF("doc_id", "text")
    val n2 = Seq((2L, "x y")).toDF("doc_id", "text")
    val inc2 = Snapshot.refreshCooccurrence(
      Text.cooccurrence(o2, window = 3), o2, n2, window = 3)
      .select("center", "context").as[(String, String)].collect().toSet
    assert(inc2 == Set("x" -> "y", "y" -> "x"))
  }

  test("refreshBigramCounts: maintained model equals a full retrain, through scoring") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val older = docs.where(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 9 === 0,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    val newer = docs.where(col("doc_id") % 4 =!= 2)
    val trainF = col("doc_id") % 3 =!= 0 // independent of the delta moduli
    val full = Text.buildBigramCounts(newer.where(trainF))
    val inc = Snapshot.refreshBigramCounts(
      Text.buildBigramCounts(older.where(trainF)), older, newer, trainF)
    assert(inc.big.collect().toSet == full.big.collect().toSet)
    assert(inc.uni.collect().toSet == full.uni.collect().toSet)
    // ...and the SERVED scores equal a full retrain+rescore
    val gotScores = Text.bigramSurprisalFrom(inc, newer)
      .orderBy("doc_id").collect().toSeq
    val wantScores = Text.bigramSurprisal(newer, trainF)
      .orderBy("doc_id").collect().toSeq
    assert(gotScores == wantScores && gotScores.nonEmpty)
  }

  test("refreshTrigramCounts: maintained c3 equals a full retrain, through KN scoring") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val older = docs.where(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 9 === 0,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    val newer = docs.where(col("doc_id") % 4 =!= 2)
    val trainF = col("doc_id") % 3 =!= 0
    val full = Text.buildTrigramCounts(newer.where(trainF))
    val inc = Snapshot.refreshTrigramCounts(
      Text.buildTrigramCounts(older.where(trainF)), older, newer, trainF)
    assert(inc.collect().toSet == full.collect().toSet)
    val gotScores = Text.knTrigramSurprisalFrom(inc, newer)
      .orderBy("doc_id").collect().toSeq
    val wantScores = Text.knTrigramSurprisal(newer, trainF)
      .orderBy("doc_id").collect().toSeq
    assert(gotScores == wantScores && gotScores.nonEmpty)
  }

  test("one shared delta feeds every consumer: *With variants equal the per-consumer paths") {
    // the e115 discipline: deltaWorkLists computes the full-outer hash
    // join ONCE; each refresh*With consumer must produce exactly what
    // its own-diff form produces
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val older = docs.where(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 9 === 0,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    val newer = docs.where(col("doc_id") % 4 =!= 2)
    val (subIds, addIds) = Snapshot.deltaWorkLists(older, newer)

    val hFull = Snapshot.refreshHealth(Snapshot.healthSums(older), older, newer)
      .collect().toSet
    val hWith = Snapshot.finishHealth(Snapshot.refreshHealthSumsWith(
      Snapshot.healthSums(older), older, newer, subIds, addIds))
      .collect().toSet
    assert(hWith == hFull && hWith.nonEmpty)

    val hhFull = Snapshot.refreshHeavyHitters(
      Snapshot.termCounts(older), older, newer, k = 25).collect().toSeq
    val hhWith = Snapshot.refreshHeavyHittersWith(
      Snapshot.termCounts(older), older, newer, subIds, addIds, k = 25)
      .collect().toSeq
    assert(hhWith == hhFull && hhWith.size == 25)

    val sFull = Snapshot.refreshSignatureIndex(
      Dedup.minhashSignatures(older), older, newer).collect().toSet
    val sWith = Snapshot.refreshSignatureIndexWith(
      Dedup.minhashSignatures(older), newer, subIds, addIds).collect().toSet
    assert(sWith == sFull && sWith.nonEmpty)

    val bFull = Snapshot.refreshBm25Index(
      graft.ext.Retrieval.buildBm25Index(older), older, newer)
    val bWith = Snapshot.refreshBm25IndexWith(
      graft.ext.Retrieval.buildBm25Index(older), older, newer, subIds, addIds)
    assert(bWith.dfreq.collect().toSet == bFull.dfreq.collect().toSet)
    assert(bWith.postings.collect().toSet == bFull.postings.collect().toSet)

    // the retrain-input consumers accept the same shared delta
    val trainF = col("doc_id") % 3 =!= 0
    val coFull = Snapshot.refreshCooccurrence(
      Text.cooccurrence(older), older, newer).collect().toSet
    val coWithDf = Snapshot.refreshCooccurrenceWith(
      Text.cooccurrence(older), older, newer, subIds, addIds)
    val coWith = coWithDf.collect().toSet
    assert(coWith == coFull && coWith.nonEmpty)
    val lmWith = Snapshot.refreshBigramCountsWith(
      Text.buildBigramCounts(older.where(trainF)), older, newer,
      subIds, addIds, trainF)
    assert(lmWith.big.collect().toSet ==
      Text.buildBigramCounts(newer.where(trainF)).big.collect().toSet)
    val knWith = Snapshot.refreshTrigramCountsWith(
      Text.buildTrigramCounts(older.where(trainF)), older, newer,
      subIds, addIds, trainF)
    assert(knWith.collect().toSet ==
      Text.buildTrigramCounts(newer.where(trainF)).collect().toSet)

    // none of the consumer plans re-runs the snapshot diff: zero
    // full-outer joins live anywhere downstream of the shared cut
    Seq(Snapshot.refreshHealthSumsWith(Snapshot.healthSums(older), older,
        newer, subIds, addIds),
      Snapshot.refreshSignatureIndexWith(Dedup.minhashSignatures(older),
        newer, subIds, addIds),
      bWith.dfreq, coWithDf, knWith).foreach { df =>
      assert(!df.queryExecution.executedPlan.toString.contains("FullOuter"))
    }
    // ...and the diff itself plans exactly one
    val diffPlan = Snapshot.diff(older, newer)
      .queryExecution.executedPlan.toString
    assert("FullOuter".r.findAllIn(diffPlan).size == 1, diffPlan.take(800))
  }

  test("diff is content-addressed: metadata-only frames don't alias") {
    // same ids, one text flipped -> exactly one changed row
    val older = snap(10L -> "alpha", 11L -> "beta")
    val newer = snap(10L -> "alpha", 11L -> "beta!")
    val out = Snapshot.diff(older.repartition(5), newer.repartition(3))
      .as[(Long, String)].collect().toSeq
    assert(out == Seq(11L -> "changed"))
  }
}
