package graft.ai

import java.nio.charset.StandardCharsets

import graft.types.MetadataValue

/**
 * The supported-model registry — the AI layer's "scalar function library"
 * (reference: /root/reference/ahnlich/ai/src/engine/ai/models.rs:82-224;
 * proto names protos/ai/models.proto:7-20). Dimensions and input types are
 * the reference's exactly; the runtime is pluggable (see [[Embedder]]).
 */
final case class ModelDetails(
    name: String,
    inputKind: String, // "raw_string" | "image" | "audio"
    dim: Int,
    oneToMany: Boolean = false)

object Models {

  val registry: Map[String, ModelDetails] = Seq(
    ModelDetails("all-minilm-l6-v2", "raw_string", 384),
    ModelDetails("all-minilm-l12-v2", "raw_string", 384),
    ModelDetails("bge-base-en-v1.5", "raw_string", 768),
    ModelDetails("bge-large-en-v1.5", "raw_string", 1024),
    ModelDetails("resnet-50", "image", 2048),
    ModelDetails("clip-vit-b32-image", "image", 512),
    ModelDetails("clip-vit-b32-text", "raw_string", 512),
    ModelDetails("sface-yunet", "image", 128, oneToMany = true),
    ModelDetails("buffalo-l", "image", 512, oneToMany = true),
    ModelDetails("clap-audio", "audio", 512),
    ModelDetails("clap-text", "raw_string", 512),
    ModelDetails("jina-embeddings-v2-base-code", "raw_string", 768),
  ).map(m => m.name -> m).toMap

  def details(name: String): ModelDetails =
    registry.getOrElse(name.toLowerCase,
      throw graft.types.GraftException(s"Found unsupported ai model $name"))
}

/**
 * The embedding runtime boundary. The reference holds one ONNX session per
 * model thread (ai/src/manager/mod.rs:35-140); the Spark-native equivalent
 * is one session per executor partition inside `mapPartitions` — so this
 * trait must be Serializable and cheap to ship in a closure. In the
 * zero-egress build the deterministic [[MockEmbedder]] stands in
 * (SURVEY.md §5, FIXTURES.md §6).
 */
trait Embedder extends Serializable {
  def details: ModelDetails
  /** One input → one (one-to-one) or several (one-to-many, e.g. faces)
    * embedding vectors. MUST be deterministic per input. */
  def embedOne(input: MetadataValue): Seq[Array[Float]]
  def embed(inputs: Seq[MetadataValue]): Seq[Seq[Array[Float]]] =
    inputs.map(embedOne)
}

/**
 * Deterministic mock: content hash → seeded unit vector. Properties the
 * tests (and oracles) rely on:
 *  - same input bytes → identical vector, so self-similarity is exactly 1.0
 *    and dedup-by-content carries over from the DB layer;
 *  - unit L2 norm (‖v‖=1 to float precision);
 *  - one-to-many face models expand one input into `1 + (byteLen mod 3)`
 *    entries — SQL-expressible, so oracles can predict expansion counts.
 */
final class MockEmbedder(val details: ModelDetails) extends Embedder {

  private def bytesOf(v: MetadataValue): Array[Byte] = v match {
    case MetadataValue.RawString(s) => s.getBytes(StandardCharsets.UTF_8)
    case MetadataValue.Image(b)     => b
    case MetadataValue.Audio(b)     => b
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def contentSeed(bytes: Array[Byte], variant: Int): Long = {
    var h = 0xcbf29ce484222325L ^ (details.name.hashCode.toLong << 17) ^ variant.toLong
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  private def unitVec(seed: Long): Array[Float] = {
    val d = details.dim
    val a = new Array[Float](d)
    var norm2 = 0.0
    var j = 0
    while (j < d) {
      val u = (splitmix64(seed + j) >>> 11).toDouble / (1L << 53).toDouble
      val x = 2.0 * u - 1.0
      a(j) = x.toFloat
      norm2 += x * x
      j += 1
    }
    val inv = (1.0 / math.sqrt(norm2)).toFloat
    j = 0
    while (j < d) { a(j) *= inv; j += 1 }
    a
  }

  def embedOne(input: MetadataValue): Seq[Array[Float]] = {
    val bytes = bytesOf(input)
    if (details.oneToMany) {
      val n = 1 + (bytes.length % 3) // deterministic "detected faces" count
      (0 until n).map(i => unitVec(contentSeed(bytes, i)))
    } else Seq(unitVec(contentSeed(bytes, 0)))
  }
}

object Embedders {
  /** The pluggable factory — swap for an ONNX-backed implementation in a
    * connected deployment; the mock is the default zero-egress runtime. */
  @volatile var factory: ModelDetails => Embedder = new MockEmbedder(_)
  def forModel(name: String): Embedder = factory(Models.details(name))
}
