package graft

import org.apache.spark.sql.functions._

/** Multimodal plumbing spec: binary payload round-trip, partition-
  * batched stub decode, feature schema. */
class MultimodalSpec extends GraftSpec {

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
