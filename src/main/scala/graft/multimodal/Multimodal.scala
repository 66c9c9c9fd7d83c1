package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ai.{Embedders, Models}
import graft.types.MetadataValue

/**
 * Multimodal column plumbing for LLM training-data pipelines: image/audio/
 * video payloads ride as opaque `BINARY` columns with a typed metadata
 * struct, and the decode/feature stages run per-partition with bounded batch
 * shape — the Scala analog of `mapInPandas` over Arrow batches.
 *
 * The DECODE KERNELS ARE STUBS: this build environment has no image/audio
 * codecs, so `decodeImageStub` derives deterministic dimensions from the
 * payload bytes (documented formula, SQL-mirrorable for oracles) where a
 * real deployment would call an actual decoder inside the same
 * `mapPartitions` body. Everything around the stub — schema, partitioning,
 * batch iteration, feature-extraction hand-off to the [[graft.ai]] embedder
 * runtime — is the real plumbing and is tested.
 */
object Multimodal {

  /** media row: (id, kind, payload, meta{width,height,channels,frames}) */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("frames", IntegerType, nullable = true)))

  /** STUB decode formula (deterministic from payload length; a real decoder
    * replaces exactly this function): width = 16 + len mod 16,
    * height = 16 + (len * 7) mod 16, channels = 3. */
  def stubDims(len: Int): (Int, Int, Int) =
    (16 + len % 16, 16 + (len * 7) % 16, 3)

  /** "Decode" an image binary column into typed media metadata. Runs
    * per-partition over the payload iterator (real plumbing; fake kernel). */
  def decodeImageStub(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", mediaMetaType, nullable = false)))
    val rdd = df.select(col(idCol).cast("long"), col(binCol)).rdd.mapPartitions { it =>
      // one decoder instance per partition (the session/codec slot in a
      // real deployment); iterate the batch, never materialize it
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, c) = stubDims(payload.length)
        Row(id, Row(w, h, c, null))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Feature extraction: payload bytes → embedding via the pluggable model
    * runtime (mock CLIP here; an ONNX session per partition in deployment).
    * Returns (id, embedding ARRAY<FLOAT>). */
  def extractImageFeatures(df: DataFrame, idCol: String, binCol: String,
      model: String = "clip-vit-b32-image"): DataFrame = {
    val m = Models.details(model)
    require(m.inputKind == "image", s"$model is not an image model")
    val bEmb = df.sparkSession.sparkContext.broadcast(Embedders.forModel(m.name))
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = df.select(col(idCol).cast("long"), col(binCol)).rdd.mapPartitions { it =>
      val emb = bEmb.value
      it.map { r =>
        val vec = emb.embedOne(MetadataValue.Image(r.getAs[Array[Byte]](1))).head
        Row(r.getLong(0), vec.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Nearest-neighbor resize over the stub's pixel layout: the payload is
    * interpreted as `stubDims`-shaped h×w×c row-major bytes (zero-padded
    * past the payload's end), resampled to targetW×targetH with the
    * standard `src = (ty·h/th, tx·w/tw)` nearest-neighbor grid. The
    * RESAMPLE is a real kernel (index math identical to an image resize);
    * only the pixel source is the stub decode. Output
    * (id, resized BINARY[tw·th·c]), byte-exact and SQL-mirrorable. */
  def resizeImageStub(df: DataFrame, idCol: String, binCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast("long"), col(binCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, c) = stubDims(payload.length)
        val out = new Array[Byte](targetW * targetH * c)
        var i = 0
        var ty = 0
        while (ty < targetH) {
          val sy = ty * h / targetH
          var tx = 0
          while (tx < targetW) {
            val sx = tx * w / targetW
            var ch = 0
            while (ch < c) {
              val src = (sy * w + sx) * c + ch
              out(i) = if (src < payload.length) payload(src) else 0
              i += 1; ch += 1
            }
            tx += 1
          }
          ty += 1
        }
        Row(id, out)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * fixed-size frame chunks and keep every `stride`-th — the batch shape
    * (one input row → N frame rows with ordinals) is the real contract;
    * the chunking stands in for a codec's frame iterator. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast("long"), col(binCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val nFrames = payload.length / frameBytes
        (0 until nFrames by stride).map { f =>
          Row(id, f, java.util.Arrays.copyOfRange(payload, f * frameBytes,
            (f + 1) * frameBytes))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
