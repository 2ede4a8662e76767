package graft

import org.apache.spark.sql.functions._

/** Multimodal plumbing spec: binary payload round-trip, partition-
  * batched stub decode, feature schema. */
class MultimodalSpec extends GraftSpec {

  test("frame sampling covers the stride grid and hashes real payload windows") {
    val f = multimodal.Multimodal.frameSample(spark, Dir).collect()
    assert(f.nonEmpty)
    // indices sit on the stride grid
    f.foreach(r => assert(r.getAs[Long]("frame_idx") % 4 == 0))
    // every doc contributes its frame 0, and full frames are 64 bytes
    val perDoc = f.groupBy(_.getAs[Long]("doc_id"))
    val nDocs = sources.Tables(spark, Dir).documents.count()
    assert(perDoc.size == nDocs)
    perDoc.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("frame_idx")).min == 0)
      val sorted = rows.sortBy(_.getAs[Long]("frame_idx"))
      sorted.init.foreach(r => assert(r.getAs[Long]("frame_len") == 64))
      assert(sorted.last.getAs[Long]("frame_len") <= 64)
    }
    // a sampled frame of one doc re-hashes to the same md5 (slice is
    // anchored at frame_idx × 64 bytes of the payload)
    val doc = sources.Tables(spark, Dir).documents
      .select(col("doc_id"), col("text")).head()
    val bytes = doc.getString(1).getBytes("UTF-8")
    val hx = bytes.map("%02X".format(_)).mkString
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(hx.slice(0, 128).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = f.filter(r => r.getAs[Long]("doc_id") == doc.getLong(0))
      .minBy(_.getAs[Long]("frame_idx")).getAs[String]("frame_md5")
    assert(got == expect)
  }

  test("media records carry the document bytes") {
    val rec = multimodal.Multimodal.mediaRecords(spark, Dir)
    val docs = sources.Tables(spark, Dir).documents
    val joined = rec.toDF().join(docs, "doc_id")
      .select(col("payload"), col("text")).collect()
    joined.foreach { r =>
      assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == r.getAs[String]("text"))
    }
  }

  test("features are deterministic functions of the payload") {
    val f = multimodal.Multimodal.features(spark, Dir)
    assert(f.columns.sorted.sameElements(
      Array("byte_len", "channels", "doc_id", "first_byte", "height", "width")))
    val rows = f.collect()
    assert(rows.length == sources.Tables(spark, Dir).documents.count())
    rows.foreach { r =>
      val len = r.getAs[Long]("byte_len")
      assert(r.getAs[Long]("width") == len % 64 + 1)
      assert(r.getAs[Long]("height") == (len / 64) % 64 + 1)
      assert(r.getAs[Long]("first_byte") >= 0 && r.getAs[Long]("first_byte") < 256)
    }
  }

  test("text analysis columns agree with documents metadata") {
    val t = operators.TextAnalysis.tokens(spark, Dir)
    val docs = sources.Tables(spark, Dir).documents
    val j = t.join(docs, "doc_id").collect()
    j.foreach { r =>
      assert(r.getAs[Long]("n_chars_computed") == r.getAs[Long]("n_chars"))
    }
  }
}
