package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Scalar (per-vector min/max) int8 quantization for embedding columns —
 * the storage/IO lever for vector corpora at scale: a 768-d float
 * embedding is 3 KB; its int8 codes + two doubles are ~784 bytes, and an
 * int8 dot-product prefilter reads 4× fewer bytes than the float kernel
 * before an exact float rescore of the shortlist.
 *
 * Everything here is a pure per-row Catalyst HOF projection — shuffle-free,
 * no UDFs — and arithmetic is performed in IEEE double with a FIXED
 * operation order, `(x − min) · 255 / (max − min)`, so any engine
 * computing the same order on the same floats produces bit-identical
 * codes (the oracle gate recomputes them in DuckDB).
 *
 * (North-star extension — SURVEY.md §2.7 family; the reference stores
 * vectors only as f32: `ahnlich/types/src/lib.rs` StoreKey.)
 */
object Quantize {

  /** Int8 codes (as 0..255 longs, the unsigned convention):
    * `q_i = min(255, floor((x_i − mn) · 255 / (mx − mn)))`, where mn/mx
    * are the vector's own min/max. The `min(255, ·)` clamp absorbs the
    * one case where rounding overshoots at x = mx. Constant vectors
    * (mx = mn) quantize to all-zero codes. The double array and its
    * min/max are LET-BOUND so the tokenize-once discipline from
    * [[graft.text.TextOps.ngrams]] holds: without binding, mn/mx would
    * re-reduce the array per element — O(d²) per row. */
  def int8Codes(vec: Column): Column =
    GraftFunctions.bind(transform(vec, _.cast("double"))) { dbl =>
      GraftFunctions.bind(array_min(dbl)) { mn =>
        GraftFunctions.bind(array_max(dbl)) { mx =>
          transform(dbl, x =>
            when(mx === mn, lit(0L)).otherwise(
              least(lit(255.0), floor((x - mn) * 255.0 / (mx - mn)))
                .cast("long")))
        }
      }
    }

  /** The (min, max) dequantization parameters as doubles — stored next to
    * the codes; `x ≈ mn + q · (mx − mn) / 255`. */
  def quantParams(vec: Column): (Column, Column) = {
    val dbl = transform(vec, _.cast("double"))
    (array_min(dbl), array_max(dbl))
  }

  /** Dequantize codes back to doubles (midpoint-free floor convention:
    * error is bounded by one step, (mx − mn) / 255). */
  def dequantize(codes: Column, mn: Column, mx: Column): Column =
    transform(codes, q => mn + q.cast("double") * (mx - mn) / 255.0)
}
