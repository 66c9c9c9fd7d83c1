package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus pipelines — the C4/RefinedWeb ingest steps
  * that precede URL-keyed dedup and per-domain balancing (Raffel et al.
  * 2020 §2.2 dedups by URL; Penedo et al. 2023 §3.1 filters and caps by
  * domain). The reference engine has no URL operators; SURVEY §2.7
  * extension from the published pipelines.
  *
  * Every rule is a deterministic, engine-portable string rewrite (pure
  * builtin regex/split expressions — no kernel needed: the per-row cost
  * is a handful of codegen'd regexes, and the DuckDB oracle mirrors each
  * step function-for-function). The rule set is intentionally closed and
  * documented; anything cleverer (public-suffix lists, punycode, scheme
  * defaulting) is out of scope and called out below.
  */
object UrlOps {

  /** Tracking parameters stripped by [[canonicalizeUrl]]: the google/
    * facebook/ms click ids plus the utm_* family — the set the published
    * crawlers drop before URL-keyed dedup. */
  val TrackingParams = "utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref"

  /** Canonical form for URL-keyed dedup. Rules, in order:
    *  1. trim; inputs without a `scheme://` prefix pass through trimmed
    *     and UNCHANGED (no scheme guessing — relative references and junk
    *     stay distinguishable rather than colliding post-rewrite);
    *  2. scheme and authority lowercase (RFC 3986 §6.2.2.1);
    *  3. default ports drop (`:80` for http, `:443` for https);
    *  4. empty path becomes `/` (RFC 3986 §6.2.3);
    *  5. tracking query params ([[TrackingParams]]) drop, surviving
    *     params keep their original ORDER (no sorting — reordering is a
    *     semantic change some endpoints observe); an all-tracking query
    *     string drops entirely, `?`-included;
    *  6. the fragment drops.
    * Case of path/query is preserved (paths are case-sensitive). NULL in,
    * NULL out. */
  def canonicalizeUrl(url: Column): Column = {
    import graft.functions.GraftFunctions.bind
    bind(trim(url)) { u =>
      val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
      val auth0 = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
      val path0 = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
      val query0 = regexp_extract(u, "^[^#]*?\\?([^#]*)", 1)
      bind(scheme) { sch =>
        val auth = when(sch === "http", regexp_replace(auth0, ":80$", ""))
          .when(sch === "https", regexp_replace(auth0, ":443$", ""))
          .otherwise(auth0)
        val path = when(path0 === "", lit("/")).otherwise(path0)
        // split preserves order; filter drops tracking keys (with or
        // without a value); concat_ws rejoins the survivors
        val kept = filter(split(query0, "&"), p =>
          !p.rlike(s"^($TrackingParams)(=|$$)"))
        val query = when(query0 === "" || size(kept) === 0, lit(""))
          .otherwise(concat(lit("?"), array_join(kept, "&")))
        when(url.isNull, lit(null).cast("string"))
          .when(sch === "", u) // rule 1: no scheme — pass through trimmed
          .otherwise(concat(sch, lit("://"), auth, path, query))
      }
    }
  }

  /** Host of a `scheme://` URL: authority lowercased, port and userinfo
    * stripped. Empty string when the input has no scheme prefix. */
  def urlHost(url: Column): Column = {
    val auth = lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":[0-9]*$", "")
  }

  /** Registrable-domain APPROXIMATION: the last two dot-labels of the
    * host (`a.b.example.com` → `example.com`) — the standard cheap
    * grouping key for per-domain caps. A real public-suffix list would
    * treat `example.co.uk` correctly; that table dependency is
    * deliberately out of scope and this heuristic is documented as such
    * (callers balancing on exact registrable domains should supply their
    * own mapping table and join it). Hosts with fewer than two labels
    * (e.g. `localhost`) pass through whole. */
  def registrableDomain(url: Column): Column = {
    import graft.functions.GraftFunctions.bind
    bind(urlHost(url)) { h =>
      bind(split(h, "\\.")) { ls =>
        when(size(ls) <= 2, h)
          .otherwise(concat_ws(".", element_at(ls, -2), element_at(ls, -1)))
      }
    }
  }
}
