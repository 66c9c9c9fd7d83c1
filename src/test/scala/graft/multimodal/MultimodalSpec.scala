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

  test("resize stub: nearest-neighbor src indices, zero-padding, exact bytes") {
    // payload [10,20,30,40]: stubDims(4) = (w=20, h=28, c=3). 2×2 target:
    // sy ∈ {0, 14}, sx ∈ {0, 10} → only (0,0) maps inside the payload
    // (src 0,1,2); every other sampled index ≥ 4 → zero-padded
    val one = Seq((7L, Array[Byte](10, 20, 30, 40))).toDF("id", "payload")
    val out = Multimodal.resizeImageStub(one, "id", "payload", 2, 2).collect()
    assert(out.length == 1 && out.head.getLong(0) == 7L)
    val bytes = out.head.getAs[Array[Byte]](1)
    assert(bytes.toSeq == Seq[Byte](10, 20, 30, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    // empty payload: all zeros, full target size
    val empty = Seq((8L, Array[Byte]())).toDF("id", "payload")
    val z = Multimodal.resizeImageStub(empty, "id", "payload", 4, 4).collect()
    assert(z.head.getAs[Array[Byte]](1).toSeq == Seq.fill(48)(0: Byte))
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
