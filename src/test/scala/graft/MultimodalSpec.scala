package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{ImageIoDecoder, Multimodal}

/** The REAL image codec path: genuine PNG bytes through the binary
  * column, decoded with javax.imageio in the partition-batched seam. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("packAsPng writes genuine PNG payloads (magic bytes, decodable)") {
    val docs = Seq((1L, "hello world"), (2L, "x" * 300)).toDF("doc_id", "text")
    val rows = Multimodal.packAsPng(docs, "doc_id", "text").collect()
    val magic = Array(0x89, 'P', 'N', 'G').map(_.toByte)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(bytes.take(4).sameElements(magic))
      assert(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)) != null)
    }
  }

  test("decoded stats equal the closed-form pixel algebra") {
    val text = "abcdefghij" * 5 // len 50 -> w=3, h=3, a=50
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val out = Multimodal.extractImageFeatures(
        Multimodal.packAsPng(docs, "doc_id", "text"))
      .select("media_id", "features.*").collect().head
    val (w, h, a) = (1 + 50 % 16, 1 + 50 % 12, 50 % 200)
    val sum = w * h * a + h * (w * (w - 1) / 2) + w * (h * (h - 1) / 2)
    assert(out.getInt(1) === w)
    assert(out.getInt(2) === h)
    assert(out.getLong(3) === w.toLong * h)
    assert(out.getLong(4) === sum.toLong)
    assert(out.getDouble(5) === sum.toDouble / (w * h))
  }

  test("a corrupt payload fails loudly, not with silent zeros") {
    val d = new ImageIoDecoder
    val e = intercept[IllegalArgumentException](
      d.decode("not a png".getBytes("UTF-8")))
    assert(e.getMessage.contains("undecodable"))
  }
}
