package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

class MultimodalSpec extends AnyFunSuite {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, Array.tabulate(100)(_.toByte)),
    (2L, Array.tabulate(37)(i => (i * 3).toByte)),
    (3L, Array[Byte]())).toDF("id", "payload")

  test("decode stub emits the documented deterministic dimensions") {
    val out = Multimodal.decodeImageStub(media, "id", "payload")
      .select("id", "meta.width", "meta.height", "meta.channels")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == ((16 + 100 % 16, 16 + 700 % 16, 3)))
    assert(out(3L) == ((16, 16, 3))) // empty payload handled
  }

  test("frame sampling: one row per kept frame with ordinals") {
    val out = Multimodal.sampleFrames(media, "id", "payload", frameBytes = 32, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).length))
    // id 1: 100/32 = 3 frames, stride 2 -> frames 0, 2
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(0, 2))
    assert(out.forall(_._3 == 32))
    // id 2: 37/32 = 1 frame -> frame 0; id 3: none
    assert(out.filter(_._1 == 2L).map(_._2).toSeq == Seq(0))
    assert(!out.exists(_._1 == 3L))
  }

  test("feature extraction delegates to the model runtime (dim, norm, determinism)") {
    val out = Multimodal.extractImageFeatures(media.where(col("id") < 3), "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L).size == 512)
    val norm = math.sqrt(out(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4)
    val again = Multimodal.extractImageFeatures(media.where(col("id") === 1), "id", "payload")
      .collect().head.getSeq[Float](1)
    assert(out(1L) == again)
    // non-image model rejected
    intercept[IllegalArgumentException](
      Multimodal.extractImageFeatures(media, "id", "payload", "all-minilm-l6-v2"))
  }
}
