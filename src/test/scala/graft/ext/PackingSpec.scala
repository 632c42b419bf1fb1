package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, 40L), (1L, 40L), (2L, 40L),   // packs: 0,0,0 (cum-excl 0,40,80)
    (3L, 250L),                        // oversize: starts pack 1 (120/100)
    (4L, 30L), (5L, 30L))              // cum-excl 370 -> pack 3; 400 -> pack 4
    .toDF("doc_id", "n_tokens")

  test("contiguous packing assigns floor(exclusive-prefix / budget) per shard") {
    val out = Packing.contiguousPack(docs, col("doc_id"), col("n_tokens"),
        budgetTokens = 100, shards = 1)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 3L, 5L -> 4L))
  }

  test("non-oversize packs hold at most the budget before their last doc") {
    val packed = Packing.contiguousPack(docs, col("doc_id"), col("n_tokens"),
        budgetTokens = 100, shards = 1)
      .select("shard", "pack_id", "n_tokens").as[(Long, Long, Long)]
      .collect().groupBy(t => (t._1, t._2))
    packed.values.foreach { rows =>
      // all but the boundary-straddling doc fit the budget
      assert(rows.map(_._3).sum - rows.map(_._3).max < 100 || rows.length == 1)
    }
  }

  test("an oversize doc overflows the pack its prefix starts in (documented contract)") {
    // budget 100: prefixes 0, 40, 290 -> packs 0, 0, 2 — the 250-token
    // doc SHARES pack 0 with doc 0 (callers pre-split oversize docs;
    // see the contiguousPack scaladoc)
    val d = Seq((0L, 40L), (1L, 250L), (2L, 40L)).toDF("doc_id", "n_tokens")
    val out = Packing.contiguousPack(d, col("doc_id"), col("n_tokens"), 100, shards = 1)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
  }

  test("splitOversize chunks to the budget; composed pack bound becomes tight") {
    val d = Seq((0L, 40L), (1L, 250L), (2L, 40L)).toDF("doc_id", "n_tokens")
    val pieces = Packing.splitOversize(d, col("n_tokens"), 100)
      .select("doc_id", "piece_idx", "piece_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(pieces == Set(
      (0L, 0L, 40L),
      (1L, 0L, 100L), (1L, 1L, 100L), (1L, 2L, 50L),
      (2L, 0L, 40L)))
    // composed with contiguousPack, no piece exceeds the budget, so the
    // budget bound holds up to ONE straddling piece per pack
    val packed = Packing.contiguousPack(
      Packing.splitOversize(d, col("n_tokens"), 100)
        // piece-level id keeps the per-shard order deterministic
        .withColumn("pid", col("doc_id") * 10 + col("piece_idx")),
      col("pid"), col("piece_tokens"), 100, shards = 1)
      .select("shard", "pack_id", "piece_tokens").as[(Long, Long, Long)]
      .collect().groupBy(t => (t._1, t._2))
    packed.values.foreach { rows =>
      assert(rows.map(_._3).sum - rows.map(_._3).max < 100)
    }
  }

  test("split-then-pack with tieBreak=piece_idx is partitioning-independent") {
    // Pieces of a split doc share its doc_id, so without the tie-break
    // the running sum's order — hence pack_id — would depend on
    // partition order. With it, assignment is a pure function of
    // (doc_id, piece_idx).
    val d = Seq((0L, 40L), (1L, 250L), (2L, 40L), (3L, 320L), (4L, 10L))
      .toDF("doc_id", "n_tokens")
    def run(parts: Int) = Packing.contiguousPack(
        Packing.splitOversize(d.repartition(parts), col("n_tokens"), 100),
        col("doc_id"), col("piece_tokens"), 100, shards = 2,
        tieBreak = Seq(col("piece_idx")))
      .select("doc_id", "piece_idx", "shard", "pack_id", "piece_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val once = run(1)
    assert(once == run(7))
    // and the budget bound is tight: per (shard, pack) the total minus
    // the straddling piece fits the budget (no piece exceeds it, so at
    // most one straddler per pack)
    val packs = once.groupBy(t => (t._3, t._4))
    assert(packs.nonEmpty)
    packs.values.foreach { rows =>
      val toks = rows.toSeq.map(_._5)
      assert(toks.sum - toks.max < 100,
        s"pack exceeds budget beyond one straddler: $rows")
      assert(toks.forall(_ <= 100))
    }
  }

  test("repackDirtyShards: clean shards pass through byte-identically; result equals a full repack") {
    // the e118 delta-stability law: shard membership is id-pure, so a
    // crawl delta re-packs ONLY the shards containing delta ids — a
    // clean shard's exported file never rewrites
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    def toks(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // a delta confined to shards {3, 5, 6}: removals from shard 3,
    // content edits in shard 5, one brand-new doc landing in shard 6
    val older = d
    val newer = d.where(col("doc_id") % 8 =!= 3)
      .withColumn("text", when(col("doc_id") % 8 === 5,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .unionByName(Seq((1000006L, "a brand new crawled document"))
        .toDF("doc_id", "text"))
    val shards = 8
    val budget = 256L
    val base = Packing.contiguousPack(toks(older), col("doc_id"),
        col("n_tokens"), budget, shards)
      .select("doc_id", "n_tokens", "shard", "pack_id").localCheckpoint()
    val (subIds, addIds) = Snapshot.deltaWorkLists(older, newer)
    val deltaIds = subIds.unionByName(addIds)
    val out = Packing.repackDirtyShards(base, toks(newer), deltaIds,
      col("doc_id"), col("n_tokens"), budget, shards)
    val full = Packing.contiguousPack(toks(newer), col("doc_id"),
        col("n_tokens"), budget, shards)
      .select("doc_id", "n_tokens", "shard", "pack_id")
    assert(out.collect().toSet == full.collect().toSet)
    // clean shards: the output rows ARE the base rows (pass-through)
    val dirty = deltaIds.select(pmod(col("doc_id"), lit(shards.toLong)))
      .as[Long].collect().toSet
    assert(dirty.size < shards, "fixture must leave at least one clean shard")
    val cleanOut = out.where(!col("shard").isin(dirty.toSeq: _*))
      .collect().toSet
    val cleanBase = base.where(!col("shard").isin(dirty.toSeq: _*))
      .collect().toSet
    assert(cleanOut == cleanBase && cleanOut.nonEmpty)
  }

  test("pack assignment is independent of physical partitioning") {
    def run(parts: Int) = Packing.contiguousPack(
        docs.repartition(parts), col("doc_id"), col("n_tokens"), 100, shards = 3)
      .select("doc_id", "shard", "pack_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(run(1) == run(7))
  }

  test("packStats: hand-exact fills; idealCutStats prices the ceiling") {
    // one shard (shards=1), budget 10, docs 7/7/7: exclusive prefixes
    // 0/7/14 -> packs 0/0/1; pack0 = 14 tokens (1400 milli — start-in
    // overhang), pack1 = 7 (700 milli). mean = 21*1000 div (2*10) = 1050.
    val toks = Seq((0L, 7L), (1L, 7L), (2L, 7L)).toDF("doc_id", "n_tokens")
    val packed = Packing.contiguousPack(toks, col("doc_id"), col("n_tokens"), 10, shards = 1)
    val st = Packing.packStats(packed, col("n_tokens"), 10)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(st == ((2L, 21L, 1050L, 700L, 1400L)))
    // ideal: 21 tokens -> 2 full packs + tail 1 (fill 100): 3 packs,
    // mean = 21000 div 30 = 700, min = tail 100, max = 1000
    val ideal = Packing.idealCutStats(toks, col("doc_id"), col("n_tokens"), 10, shards = 1)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(ideal == ((3L, 21L, 700L, 100L, 1000L)))
  }

  test("packStats structural laws on the fixture (budget 64 inside the doc-length range)") {
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val budget = 64L
    def stats(st: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long, Long) =
      st.as[(Long, Long, Long, Long, Long)].head()
    val contigSt = stats(Packing.packStats(
      Packing.contiguousPack(toks, col("doc_id"), col("n_tokens"), budget, shards = 8),
      col("n_tokens"), budget))
    val splitSt = stats(Packing.packStats(
      Packing.contiguousPack(
        Packing.splitOversize(toks, col("n_tokens"), budget),
        col("doc_id"), col("piece_tokens"), budget, shards = 8,
        tieBreak = Seq(col("piece_idx"))),
      col("piece_tokens"), budget))
    val idealSt = stats(Packing.idealCutStats(toks, col("doc_id"), col("n_tokens"),
      budget, shards = 8))
    // token mass is invariant across methods
    assert(contigSt._2 == splitSt._2 && splitSt._2 == idealSt._2)
    // split-pack's tight-budget contract: a pack holds at most the
    // budget plus ONE straddling piece (< 2 budgets); raw contiguous
    // with 99-token docs against a 64 budget can overflow past that
    assert(splitSt._5 < 2000, s"split-pack fill bound violated: $splitSt")
    // ideal cut: every pack full except per-shard tails
    assert(idealSt._5 == 1000 && idealSt._3 >= 900 && idealSt._3 <= 1000,
      s"concat-cut must price the ceiling: $idealSt")
  }

  test("shardShuffle: total addressing, reproducible, epoch-independent draws") {
    val base = spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id")
    def run(df: org.apache.spark.sql.DataFrame, epoch: Long) =
      Packing.shardShuffle(df, col("doc_id"), shards = 4, epoch = epoch)
        .select("doc_id", "shard", "pos").as[(Long, Long, Int)].collect()
    val a = run(base, 0L)
    // every row addressed exactly once; positions contiguous per shard
    assert(a.length == base.count())
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // partitioning-independent
    assert(run(base.repartition(11), 0L).toSet == a.toSet)
    // a different epoch is a genuinely different permutation
    val b = run(base, 1L)
    val sameAddr = a.toSet.intersect(b.toSet).size
    assert(sameAddr < a.length / 2, s"epochs too correlated: $sameAddr")
  }
}
