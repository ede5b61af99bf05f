package graft

import graft.Tables
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("extractMeta: schema contract and deterministic stub features") {
    val docs = Tables.load(spark, sf0001, "documents").limit(20)
    val out = Multimodal.extractMeta(docs).collect()
    assert(out.length == 20)
    out.foreach { m =>
      assert(m.content_id.length == 32, "md5 hex content id")
      assert(m.n_bytes > 0)
      assert(m.width == m.n_bytes % 640)
      assert(m.height == (m.n_bytes * 7) % 480)
    }
  }

  test("sampleFrames keeps every stride-th frame with stable uids") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf0001, "documents").limit(40)
    val meta = Multimodal.extractMeta(docs)
    val frames = Multimodal.sampleFrames(meta, 5)
    val perDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    meta.collect().foreach { m =>
      val expect = if (m.frames > 0) (m.frames + 4) / 5 else 0L
      assert(perDoc.getOrElse(m.doc_id, 0L) == expect,
        s"doc ${m.doc_id} frames=${m.frames}")
    }
    // uid is a function of (content, frame): re-running yields same uids
    val a = frames.select("frame_uid").collect().map(_.getString(0)).toSet
    val b = Multimodal.sampleFrames(Multimodal.extractMeta(docs), 5)
      .select("frame_uid").collect().map(_.getString(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("resizeStub emits exactly w*h bytes per row, all rows") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf0001, "documents").limit(30)
    val out = Multimodal.resizeStub(docs, 8, 6, batchSize = 7)
    assert(out.count() == 30)
    assert(out.where(length(col("media")) =!= 48).count() == 0)
    assert(out.select("out_w", "out_h").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((8L, 6L)))
  }

  test("media binary column round-trips UTF-8 byte length") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf0001, "documents").limit(50)
    val mismatch = Multimodal.withMediaBinary(docs, "text")
      .where(length(col("media")) =!= octet_length(col("text")))
      .count()
    assert(mismatch == 0)
  }
}
