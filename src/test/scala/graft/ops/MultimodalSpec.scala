package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary-column feature extraction: schema, determinism, stubbed decode") {
    val df = Seq((1L, "hello world"), (2L, "xyz"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    val out = Multimodal.extractFeatures(spark, df).collect().sortBy(_.doc_id)

    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).n_bytes == 11L)
    assert(out(1).n_bytes == 3L)
    assert(out(2).n_bytes == 0L)
    // magic-number signature = first 4 bytes hex ("hell" = 68656c6c)
    assert(out(0).format_sig == "68656c6c")
    assert(out.forall(f => f.width >= 1 && f.height >= 1))
    assert(out.forall(_.embedding.length == 4))

    // determinism: identical input → identical features
    val again = Multimodal.extractFeatures(spark, df).collect().sortBy(_.doc_id)
    assert(out.map(_.embedding.toSeq).toSeq == again.map(_.embedding.toSeq).toSeq)
  }

  test("featuresOverDocuments runs over testdata with stable output shape") {
    val out = Multimodal.featuresOverDocuments(spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "format_sig", "width", "height", "emb0", "emb1"))
    assert(out.count() == 500)
  }
}
