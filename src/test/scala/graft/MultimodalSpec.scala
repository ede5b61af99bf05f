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

  test("media binary column round-trips UTF-8 byte length") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf0001, "documents").limit(50)
    val mismatch = Multimodal.withMediaBinary(docs, "text")
      .where(length(col("media")) =!= octet_length(col("text")))
      .count()
    assert(mismatch == 0)
  }
}
