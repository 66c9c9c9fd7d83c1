package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.types.{MetadataValue, PredicateCondition}

/**
 * Compiles the reference's predicate algebra (protos/predicate.proto:11-56)
 * to a Catalyst `Column` over the store's metadata map column.
 *
 * Semantics pinned to the reference's SCAN path (the ground truth — see
 * SURVEY.md §2.3 divergence note): for entries *lacking* the metadata key,
 * `NotEquals` and `NotIn` MATCH (db/src/engine/store.rs:913-932, 961-986),
 * while `Equals` / `In` do not. Made explicit with `coalesce(..., lit(x))`.
 *
 * And = conjunction, Or = disjunction (predicate.rs:244-268) — Catalyst
 * pushes the resulting tree into the parquet scan, which is the batch
 * equivalent of the reference's inverted predicate index.
 */
object Predicates {

  /** A metadata value as a Catalyst struct literal matching
    * StoreSchema.metadataValueType. */
  def metaLit(v: MetadataValue): Column = v match {
    case MetadataValue.RawString(s) =>
      struct(lit("raw_string").as("kind"), lit(s).as("str"),
        lit(null).cast(BinaryType).as("bin"))
    case MetadataValue.Image(b) =>
      struct(lit("image").as("kind"), lit(null).cast(StringType).as("str"),
        lit(b).as("bin"))
    case MetadataValue.Audio(b) =>
      struct(lit("audio").as("kind"), lit(null).cast(StringType).as("str"),
        lit(b).as("bin"))
  }

  /** Compile a condition tree against the given metadata map column. */
  def toColumn(cond: PredicateCondition, valueCol: Column): Column = {
    import PredicateCondition._
    cond match {
      case Equals(k, v) =>
        coalesce(element_at(valueCol, k) === metaLit(v), lit(false))
      case NotEquals(k, v) =>
        coalesce(element_at(valueCol, k) =!= metaLit(v), lit(true))
      case In(k, vs) =>
        val elem = element_at(valueCol, k)
        val any = vs.toSeq.map(v => elem === metaLit(v))
          .reduceOption(_ || _).getOrElse(lit(false))
        coalesce(any, lit(false))
      case NotIn(k, vs) =>
        val elem = element_at(valueCol, k)
        val all = vs.toSeq.map(v => elem =!= metaLit(v))
          .reduceOption(_ && _).getOrElse(lit(true))
        coalesce(all, lit(true))
      case And(l, r) => toColumn(l, valueCol) && toColumn(r, valueCol)
      case Or(l, r)  => toColumn(l, valueCol) || toColumn(r, valueCol)
    }
  }

  /** JVM-side evaluator (shared by ANN accept-list building and tests);
    * must agree exactly with `toColumn`. */
  def eval(cond: PredicateCondition, value: Map[String, MetadataValue]): Boolean = {
    import PredicateCondition._
    cond match {
      case Equals(k, v)    => value.get(k).contains(v)
      case NotEquals(k, v) => !value.get(k).contains(v)
      case In(k, vs)       => value.get(k).exists(vs.contains)
      case NotIn(k, vs)    => !value.get(k).exists(vs.contains)
      case And(l, r)       => eval(l, value) && eval(r, value)
      case Or(l, r)        => eval(l, value) || eval(r, value)
    }
  }
}
