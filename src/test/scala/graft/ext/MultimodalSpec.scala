package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(30)
    Multimodal.mediaFromDocuments(docs)
  }

  test("media table plumbing: binary payloads with typed metadata") {
    val rows = media.collect()
    assert(rows.length == 30)
    assert(rows.forall(_.bytes.nonEmpty))
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("extractFeatures is deterministic and preserves ids") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.map(_.media_id).toSet == media.collect().map(_.media_id).toSet)
    assert(f1.forall(f => f.width >= 64 && f.height >= 64 && f.byte_len > 0))
  }

  test("sampleFrames emits n rows per video with monotone offsets") {
    val frames = Multimodal.sampleFrames(media, 4)
    val byId = frames.collect().groupBy(_.getLong(0))
    assert(byId.values.forall(_.length == 4))
    byId.values.foreach { fs =>
      val offs = fs.sortBy(_.getInt(1)).map(_.getInt(2))
      assert(offs.zip(offs.tail).forall { case (a, b) => a <= b })
    }
  }
}
