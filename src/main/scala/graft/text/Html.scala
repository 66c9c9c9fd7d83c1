package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → plain-text extraction — the web-corpus ingest step that
  * precedes every text filter in the published pipelines (C4: Raffel et
  * al. 2020 §2.2 starts from WET plain text produced exactly this way;
  * RefinedWeb: Penedo et al. 2023 §3.1 re-extracts from WARC because
  * extraction quality dominates downstream filter yield). The reference
  * engine stores raw text and has no markup operators; SURVEY §2.7
  * extension from the published pipelines.
  *
  * Scope is the deterministic, engine-portable core: element-block
  * removal, tag stripping, the closed HTML entity set, whitespace
  * collapse. Each rule is one codegen'd builtin regex/replace pass (no
  * kernel, no UDF — the per-row cost is a short chain of
  * `WholeStageCodegen` string expressions), and the DuckDB oracle mirrors
  * the chain pattern-for-pattern. Anything cleverer — DOM parsing,
  * boilerplate-block scoring (trafilatura/jusText), numeric character
  * references, charset sniffing — is out of scope and called out here
  * rather than half-implemented.
  */
object Html {

  /** Element types whose CONTENT is dropped, not just their tags:
    * machine payload (script/style), fallback duplicates (noscript), and
    * inert fragments (template). One pass per name — deliberately no
    * regex backreference, so the exact same pattern strings run under
    * both Java regex (Spark codegen) and RE2 (the DuckDB oracle, which
    * has no backreferences). */
  val DroppedElements: Seq[String] = Seq("script", "style", "noscript", "template")

  /** The closed entity set decoded by [[extractText]], in application
    * order. `&amp;` is deliberately LAST so a double-encoded `&amp;lt;`
    * decodes to the literal text `&lt;` (single-pass semantics), not `<`.
    * `&nbsp;` becomes a plain space — the following collapse pass owns
    * all whitespace anyway. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Plain text from raw HTML. Rules, in order:
    *  1. comments drop (`<!-- ... -->`, dotall);
    *  2. [[DroppedElements]] drop with their content (case-insensitive,
    *     attributes allowed on the open tag; an UNCLOSED block keeps its
    *     content — the open tag still strips in rule 3, leaving the
    *     payload as text for the downstream quality filters to reject,
    *     which is the C4 behavior for malformed pages);
    *  3. every remaining tag becomes a space (tags are word boundaries:
    *     `<p>a</p><p>b</p>` must not fuse to `ab`);
    *  4. [[Entities]] decode;
    *  5. whitespace collapses to single spaces, ends trim.
    * NULL in, NULL out.
    *
    * Native kernel ([[org.apache.spark.sql.graftbridge.HtmlExtract]]):
    * ingest-path strip runs over 100% of the raw corpus bytes, and the
    * builtin formulation below is 14 regex/replace passes per row. The
    * kernel is pinned bit-identical to [[extractTextBuiltins]] in
    * HtmlSpec (case table + differential) and KernelFuzzSpec. */
  def extractText(html: Column): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, HtmlExtract}
    ColumnBridge.column(HtmlExtract(ColumnBridge.expression(html)))
  }

  /** The builtin-chain reference formulation of [[extractText]] — 14
    * sequential codegen'd regex/replace passes. Kept as the semantic
    * spec the kernel is differentially pinned against (it is also the
    * shape the DuckDB oracle mirrors pattern-for-pattern). */
  def extractTextBuiltins(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noBlocks = DroppedElements.foldLeft(noComments)((c, el) =>
      regexp_replace(c, s"(?is)<$el\\b[^>]*>.*?</$el\\s*>", " "))
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to)) // literal, not regex — no escaping
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
