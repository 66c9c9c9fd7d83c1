package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for LLM training-data pipelines, as pure Catalyst
 * column expressions — whole-stage-codegen'd, no UDFs, shuffle-free per-row
 * transforms that run at scan speed on any corpus size. (These extend the
 * reference's surface per the north-star brief; the reference itself has no
 * text ops — SURVEY.md §2.7.)
 *
 * Determinism discipline: every formula here is expressible in ANSI-ish SQL
 * (DuckDB) with identical semantics, so each operator is oracle-checkable:
 * regex char classes only (no dialect-specific syntax), integer arithmetic
 * for hashes, and double math rounded at 4 decimals for scores.
 */
object TextOps {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters / digits / other-symbols, each
    * with an optional leading space (the GPT-2 pre-tokenizer shape). */
  val BpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"
  def bpeTokenCount(text: Column): Column = {
    // native run-class scan ([[org.apache.spark.sql.graftbridge
    // .BpeRunCount]]) — the regex alternation pass cost ~10 s at 500k
    // docs; [[bpeTokenCountRegex]] keeps the regex twin, count-pinned in
    // TextOpsSpec/KernelFuzzSpec
    import org.apache.spark.sql.graftbridge.{BpeRunCount, ColumnBridge}
    ColumnBridge.column(BpeRunCount(ColumnBridge.expression(text)))
  }

  /** The regex formulation of [[bpeTokenCount]] — the engine-portable
    * reference (mirrors the oracle SQL's regexp_extract_all count). */
  def bpeTokenCountRegex(text: Column): Column =
    regexp_count(text, lit(BpePattern))

  /** Word n-grams (n consecutive whitespace tokens joined by single spaces).
    * Texts shorter than n tokens yield an empty array (guarded explicitly —
    * Spark's sequence(1, 0) would DESCEND, not stop). The token array is
    * LET-BOUND ([[graft.functions.GraftFunctions.bind]]) so the split runs
    * once per row: referenced naively from the slice lambda it re-tokenizes
    * per produced n-gram — measured 8× slower on real documents. */
  def ngrams(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.bind(tokens(text)) { toks =>
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
    }

  // ------------------------------------------------------------ language ID

  /** Stopword vocabularies per marker language — the classic cheap
    * n-gram/stopword heuristic. Counts of these per language vote; argmax
    * wins (ties broken by fixed language order). */
  val LangWordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "con", "por", "del", "se"))

  /** The marker regexes the vocabularies compile to (zh is a Han-block
    * char class, not a word list) — fed verbatim to the DuckDB oracle.
    * \x{..} syntax: valid in BOTH Java and RE2. */
  val LangMarkers: Seq[(String, String)] =
    LangWordSets.map { case (l, ws) => l -> s"\\b(${ws.mkString("|")})\\b" } :+
      ("zh" -> "[\\x{4e00}-\\x{9fff}]")

  def langScore(text: Column, marker: String): Column =
    regexp_count(lower(text), lit(marker))

  /** Predicted language = argmax of marker counts; "und" (undetermined) when
    * every score is zero. The five marker counts come from ONE native byte
    * scan ([[org.apache.spark.sql.graftbridge.LangMarkerCounts]] — the five
    * regexp_count passes of [[langIdRegex]] measured ~5 s at 500k docs,
    * count-pinned in TextOpsSpec/KernelFuzzSpec); the count vector and the
    * max are LET-BOUND so the kernel runs EXACTLY once per row. */
  def langId(text: Column): Column = {
    import graft.functions.GraftFunctions.bind
    import org.apache.spark.sql.graftbridge.{ColumnBridge, LangMarkerCounts}
    bind(ColumnBridge.column(LangMarkerCounts(
      ColumnBridge.expression(text), LangWordSets.map(_._2)))) { sc =>
      bind(array_max(sc)) { best =>
        // first language (in declared order) achieving the max
        LangMarkers.zipWithIndex.foldRight(lit("und")) {
          case (((l, _), i), els) =>
            when(element_at(sc, i + 1) === best && best > 0, lit(l))
              .otherwise(els)
        }
      }
    }
  }

  /** The regexp_count formulation of [[langId]] — the engine-portable
    * reference (the oracle SQL recompiles the same marker patterns).
    * Evaluation discipline: the lowered text, the score vector, and the
    * max are all LET-BOUND, so each marker regex runs EXACTLY once per
    * row — the naive argmax-as-CASE formulation re-evaluates every score
    * per comparison branch (measured ~6× the regex work). */
  def langIdRegex(text: Column): Column = {
    import graft.functions.GraftFunctions.bind
    bind(lower(text)) { lt =>
      bind(array(LangMarkers.map { case (_, m) =>
        regexp_count(lt, lit(m)).cast("long") }: _*)) { sc =>
        bind(array_max(sc)) { best =>
          LangMarkers.zipWithIndex.foldRight(lit("und")) {
            case (((l, _), i), els) =>
              when(element_at(sc, i + 1) === best && best > 0, lit(l))
                .otherwise(els)
          }
        }
      }
    }
  }

  /** C4-style blocklist hit count (Raffel et al. 2020 §2.2 drop any page
    * containing a word from a blocklist; RefinedWeb keeps the same step):
    * occurrences of any listed word in the document, case-insensitive,
    * `\b`-word-bounded — the same one-pass byte scan as [[langId]]
    * ([[org.apache.spark.sql.graftbridge.LangMarkerCounts]] with the
    * blocklist as the single word set). Callers drop on `> 0` or
    * threshold on density. Scope: SINGLE-TOKEN ASCII words (the scan
    * matches maximal `[a-z0-9_]` runs of the lowercased text) — multi-
    * word phrases belong to the n-gram decontamination machinery
    * ([[graft.dedup.Dedup.decontaminate]]), not this filter. */
  def blocklistHits(text: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, LangMarkerCounts}
    val ws = words.map(_.toLowerCase)
    require(ws.nonEmpty && ws.forall(_.matches("[a-z0-9_]+")),
      "blocklist words must be single ASCII word tokens ([a-z0-9_]+); " +
        s"got: ${words.filterNot(_.toLowerCase.matches("[a-z0-9_]+")).take(3).mkString(", ")}")
    element_at(ColumnBridge.column(LangMarkerCounts(
      ColumnBridge.expression(text), Seq(ws))), 1)
  }

  /** The regexp_count formulation of [[blocklistHits]] — the
    * engine-portable reference the oracle SQL mirrors (same
    * `\b(w|…)\b` marker-pattern idiom as [[langIdRegex]]). */
  def blocklistHitsRegex(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text),
      lit(s"\\b(${words.map(_.toLowerCase).mkString("|")})\\b")).cast("long")

  // --------------------------------------------------------- quality signals

  /** Quality components: chars, tokens, mean token length, punctuation
    * ratio, stopword(en) ratio, all-caps-token ratio. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def stopwordRatio(text: Column): Column =
    langScore(text, LangMarkers.head._2).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Unicode NFC normalization (native kernel — Spark has no builtin;
    * [[org.apache.spark.sql.graftbridge.NfcNormalize]]). */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, NfcNormalize}
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
  }

  /** Text canonicalization BEFORE content hashing/dedup: NFC-normalize
    * (composed and decomposed accents must hash identically), lowercase,
    * collapse whitespace runs to single spaces, trim. Exactly this
    * composition in exactly this order — the oracle mirrors it as
    * `trim(regexp_replace(lower(nfc_normalize(t)), '\s+', ' ', 'g'))`
    * — so canonical texts are engine-portable hash inputs. A pure per-row
    * projection; pipelines run it once at ingest and feed the canonical
    * column to [[graft.dedup.Dedup]]'s joins (case/spacing/encoding
    * variants then collapse into the same exact-dup cluster instead of
    * surviving as "near"-dups). */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(lower(nfcNormalize(text)), "\\s+", " "))

  /** Non-whitespace character count — the shared numerator of every
    * mean-word-length signal ([[meanTokenLen]], [[gopherFlags]]). */
  private def nonWsCharCount(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", ""))

  def meanTokenLen(text: Column): Column =
    nonWsCharCount(text).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Composite [0,1]-ish quality score: rewards mid-length docs with modest
    * punctuation and a healthy stopword share — the standard shape of
    * pre-filtering heuristics for web corpora. Deterministic, documented,
    * SQL-mirrorable; not a learned model.
    *
    * The four counts come from ONE pass of the native
    * [[org.apache.spark.sql.graftbridge.TextStats]] kernel (the builtin
    * formulation paid two tokenizations, a match-array regexp_extract_all
    * and a ten-way-alternation regexp_count per row — measured 49.6 s at
    * 500k docs); every ratio/clamp below stays ordinary expression
    * arithmetic on those exact integers. [[qualityScoreRegex]] keeps the
    * builtin formulation, value-pinned in TextOpsSpec. */
  def qualityScore(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, TextStats}
    import graft.functions.GraftFunctions.bind
    val stats = ColumnBridge.column(TextStats(ColumnBridge.expression(text)))
    bind(stats) { st =>
      val toks = element_at(st, 1)
      val lenScore = least(toks.cast("double") / lit(100.0), lit(1.0))
      val punct = element_at(st, 2).cast("double") /
        greatest(element_at(st, 4), lit(1L)).cast("double")
      val stop = least(element_at(st, 3).cast("double") /
        greatest(toks, lit(1L)).cast("double") * lit(5.0), lit(1.0))
      round((lenScore + (lit(1.0) - least(punct * lit(5.0), lit(1.0))) + stop) / lit(3.0), 4)
    }
  }

  /** The all-builtins formulation of [[qualityScore]] — the
    * engine-portable reference (mirrors the oracle SQL; regex- and
    * allocation-bound per row, so prefer the kernel on hot paths). */
  def qualityScoreRegex(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val punct = punctRatio(text)
    val stop = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    round((lenScore + (lit(1.0) - least(punct * lit(5.0), lit(1.0))) + stop) / lit(3.0), 4)
  }

  /** Intra-document repetition: the fraction of the doc's word n-gram
    * occurrences that are repeats of an n-gram already seen in the SAME
    * document — the Gopher/MassiveText boilerplate rule (high repeated-
    * n-gram share ⇒ template/spam text). Shuffle-free per-row expression:
    * 1 − distinct/total over the doc's n-gram array; docs shorter than n
    * tokens score 0.
    *
    * Runs over the [[graft.dedup.Dedup.ngramHashes]] kernel's 64-bit
    * n-gram hashes instead of materialized n-gram strings (one compiled
    * pass + codegen'd array_distinct on longs): distinct/total is
    * identical unless two DISTINCT n-grams of the SAME doc collide in 64
    * bits — P ≈ grams²/2⁶⁵ per doc, far beyond the 4-place rounding. */
  /** Line-shape signals — the LINE-BASED half of the Gopher/C4 rule set
    * that [[gopherFlags]] deliberately omits (its scaladoc notes the
    * omission): per document, (n_lines, frac_bullet, frac_ellipsis_end,
    * frac_terminal). Gopher drops docs with > 90% bullet lines or > 30%
    * ellipsis-ending lines (Rae et al. 2021 §A1.1); C4 KEEPS only lines
    * ending in terminal punctuation (Raffel et al. 2020 §2.2) — so
    * `frac_terminal` is the keep-signal and the other two are
    * drop-signals, reported together so one projection serves both
    * recipes. Shuffle-free per-row projection; fractions round to 4 dp
    * for the cross-engine gate. A no-newline doc is one line.
    *
    * Counters come from ONE native byte scan
    * ([[org.apache.spark.sql.graftbridge.LineSignals]] — the line split
    * plus three interpreted `filter(..., rlike)` passes of
    * [[lineSignalsRegex]] measured 7.0 s at 500k sf1 docs, the last
    * self-documented interpreted hot path in the text family; the kernel
    * is count-pinned to the regex formulation in TextOpsSpec, including
    * the `$`-before-final-\r Java regex edge). */
  def lineSignals(text: Column): Column = {
    import graft.functions.GraftFunctions.bind
    import org.apache.spark.sql.graftbridge.{ColumnBridge, LineSignals}
    val k = ColumnBridge.column(LineSignals(ColumnBridge.expression(text)))
    bind(k) { a =>
      val n = element_at(a, 1)
      def frac(i: Int): Column =
        round(element_at(a, i).cast("double") / n, 4)
      struct(
        n.as("n_lines"),
        frac(2).as("frac_bullet"),
        frac(3).as("frac_ellipsis_end"),
        frac(4).as("frac_terminal"))
    }
  }

  /** The all-builtins formulation of [[lineSignals]] — the
    * engine-portable reference (mirrors the oracle SQL; three regex
    * passes per line, so prefer the kernel on hot paths). */
  def lineSignalsRegex(text: Column): Column = {
    import graft.functions.GraftFunctions.bind
    bind(split(text, "\n")) { ls =>
      val n = size(ls)
      def frac(p: Column => Column): Column =
        round(size(filter(ls, p)).cast("double") / n, 4)
      struct(
        n.cast("long").as("n_lines"),
        frac(l => trim(l).rlike("^[-*•]")).as("frac_bullet"),
        frac(l => rtrim(l).rlike("(\\.\\.\\.|…)$")).as("frac_ellipsis_end"),
        frac(l => rtrim(l).rlike("[.!?\"]$")).as("frac_terminal"))
    }
  }

  def repetitionRatio(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.bind(
        graft.dedup.Dedup.ngramHashes(text, n)) { g =>
      round(when(size(g) <= 0, lit(0.0))
        .otherwise(lit(1.0) -
          size(array_distinct(g)).cast("double") / size(g).cast("double")), 4)
    }

  /** Gopher repetition-signal suite (Rae et al. 2021 §A1.1, the
    * repetitious-text rules that complement [[gopherFlags]]): 13 signals
    * as one native pass per document
    * ([[org.apache.spark.sql.graftbridge.RepSignals]] — no explode, no
    * shuffle; the per-doc count maps are bounded by the document).
    * Struct fields: dup_line_frac, dup_line_char_frac, dup_para_frac,
    * dup_para_char_frac, top{2,3,4}gram_char_frac,
    * dup{5..10}gram_char_frac. The published thresholds (drop when
    * dup_line_frac > 0.30, dup_para_frac > 0.30, char fracs > 0.20,
    * top-gram > 0.20/0.18/0.16, dup-gram > 0.15/0.14/0.13/0.12/0.11/
    * 0.10) are the caller's filter — the signals are the operator. */
  def repetitionSignals(text: Column): Column = {
    import graft.functions.GraftFunctions.bind
    import org.apache.spark.sql.graftbridge.{ColumnBridge, RepSignals}
    val sig = ColumnBridge.column(RepSignals(ColumnBridge.expression(text)))
    val names = Seq("dup_line_frac", "dup_line_char_frac",
      "dup_para_frac", "dup_para_char_frac",
      "top2gram_char_frac", "top3gram_char_frac", "top4gram_char_frac",
      "dup5gram_char_frac", "dup6gram_char_frac", "dup7gram_char_frac",
      "dup8gram_char_frac", "dup9gram_char_frac", "dup10gram_char_frac")
    bind(sig) { f =>
      struct(names.zipWithIndex.map { case (nm, i) =>
        element_at(f, i + 1).as(nm) }: _*)
    }
  }

  /** Gopher quality-rule bundle (Rae et al. 2021, MassiveText §A.1.1) —
    * the published boolean document filters, each surfaced as a flag plus
    * their conjunction:
    *
    *  - `ok_words`:    50 ≤ word count ≤ 100 000
    *  - `ok_mean_len`: 3 ≤ mean word length ≤ 10
    *  - `ok_symbol`:   ≤ 10% of words contain `#` or `...`
    *  - `ok_alpha`:    ≥ 80% of words contain an alphabetic character
    *  - `ok_stop`:     ≥ 2 distinct common English stopwords present
    *
    * Shuffle-free per-row projection (the line-based bullet/ellipsis rules
    * are omitted: the corpus documents are single-line; [[repetitionRatio]]
    * carries the separate repetition rule). Served by the native
    * [[org.apache.spark.sql.graftbridge.GopherFlags]] kernel — one loop
    * over the token array; the higher-order-function formulation
    * ([[gopherFlagsHof]], all-interpreted lambdas, measured ~35 µs/row)
    * is kept as the independent reference it is bit-pinned against in
    * TextOpsSpec. */
  def gopherFlags(text: Column): Column = {
    import graft.functions.GraftFunctions.bind
    import org.apache.spark.sql.graftbridge.{ColumnBridge, GopherFlags}
    val flags = ColumnBridge.column(
      GopherFlags(ColumnBridge.expression(tokens(text))))
    bind(flags) { f =>
      struct(element_at(f, 1).as("ok_words"), element_at(f, 2).as("ok_mean_len"),
        element_at(f, 3).as("ok_symbol"), element_at(f, 4).as("ok_alpha"),
        element_at(f, 5).as("ok_stop"), element_at(f, 6).as("pass"))
    }
  }

  /** The higher-order-function formulation of [[gopherFlags]] — the
    * engine-portable reference (mirrors the oracle SQL shape; every
    * lambda evaluates interpreted, so prefer the kernel on hot paths). */
  def gopherFlagsHof(text: Column): Column = {
    import graft.functions.GraftFunctions.bind
    bind(tokens(text)) { tks =>
      bind(greatest(size(tks), lit(1)).cast("double")) { nw =>
        val okWords = size(tks).between(50, 100000)
        // meanTokenLen(text) would re-tokenize; reuse the bound count
        val okMeanLen =
          (nonWsCharCount(text).cast("double") / nw).between(3.0, 10.0)
        val okSymbol = (size(filter(tks, t =>
          t.contains("#") || t.contains("..."))).cast("double") / nw) <= 0.1
        val okAlpha = (size(filter(tks, t =>
          t.rlike("[A-Za-z]"))).cast("double") / nw) >= 0.8
        val okStop = bind(transform(tks, t => lower(t))) { lw =>
          GopherStopwords.map(s =>
            when(array_contains(lw, s), 1).otherwise(0)).reduce(_ + _) >= 2
        }
        struct(okWords.as("ok_words"), okMeanLen.as("ok_mean_len"),
          okSymbol.as("ok_symbol"), okAlpha.as("ok_alpha"),
          okStop.as("ok_stop"),
          (okWords && okMeanLen && okSymbol && okAlpha && okStop).as("pass"))
      }
    }
  }

  /** The Gopher rule's stopword list (Rae et al. 2021 §A.1.1, verbatim). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  // ----------------------------------------------------------- fingerprints

  /** Polynomial rolling hash over codepoints, mod 1e9+7, init 7 — a
    * content fingerprint reproducible in any engine with a list fold
    * (document fingerprinting primitive). Served by the native codegen'd
    * [[org.apache.spark.sql.graftbridge.PolyHash]] kernel (one pass over
    * the string); [[fingerprintHof]] is the engine-portable formulation it
    * is bit-pinned against in TextOpsSpec. */
  def fingerprint(text: Column): Column =
    graft.functions.GraftFunctions.polyHash(text)

  /** The higher-order-function formulation — kept as the independent
    * reference implementation (mirrors the DuckDB oracle fold verbatim;
    * allocates one single-char string per codepoint, so prefer
    * [[fingerprint]] on hot paths). */
  def fingerprintHof(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(7L),
      (acc, c) => (acc * 31 + c) % 1000000007L)
}
