package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL normalization for host-keyed corpus curation: real crawls cap,
  * dedupe, and mix on the HOST parsed from messy URLs (mixed case,
  * explicit default ports, fragments, userinfo), not on a clean label
  * column. This operator canonicalizes once so every downstream
  * host-keyed step ([[Sampling.domainCap]], per-host mixing, robots
  * accounting) keys on the same string.
  *
  * Parsing uses regexes shared VERBATIM with the DuckDB oracle (the
  * scrub_pii discipline — a subset on which Java regex and RE2 agree)
  * rather than Spark's built-in `parse_url`: parse_url follows
  * java.net.URI's grammar, which has no RE2-expressible oracle twin, and
  * its per-part calls re-parse the URL each time. The regex chain is one
  * codegen'd row-local projection with bit-identical cross-engine
  * semantics.
  *
  * Normalization contract (RFC 3986 §6 syntax-based normalization, the
  * safe subset): scheme and host lowercase; default ports (http:80,
  * https:443) dropped, any other explicit port kept; userinfo stripped
  * from the host; empty path becomes "/"; query kept as-is (reordering
  * parameters changes semantics on real sites, so we don't); fragment
  * dropped (never sent to the server). A row with no parseable scheme or
  * host gets a NULL `url_norm` — callers filter or quarantine, the
  * operator never invents a host.
  *
  * Scale shape: pure row-local codegen'd projection, no shuffle; scales
  * embarrassingly.
  */
object Url {

  /** Shared with the DuckDB oracle — no backreferences, no lookaround. */
  val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  // the '?' must occur BEFORE any '#': a '?' inside the fragment (SPA
  // routes like /#/search?q=x) is part of the dropped fragment, not a
  // query — the lazy [^#]*? prefix cannot cross a '#' to find one
  val QueryRe = "^[^#]*?\\?([^#]*)"
  val UserinfoRe = "^[^@]*@"
  val PortRe = ":([0-9]+)$"

  /** Adds `scheme`, `host`, `path`, `url_norm` parsed/normalized from
    * `urlCol` (kept). Unparseable rows keep their parts empty and get a
    * NULL url_norm.
    */
  def normalize(pages: DataFrame, urlCol: String = "url"): DataFrame = {
    val scheme = lower(regexp_extract(col(urlCol), SchemeRe, 1))
    val hostPort =
      regexp_replace(regexp_extract(col(urlCol), AuthorityRe, 1), UserinfoRe, "")
    val host = lower(regexp_replace(hostPort, PortRe, ""))
    val port = regexp_extract(hostPort, PortRe, 1)
    val keptPort = when((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443") || port === "", lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(col(urlCol), PathRe, 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val query = regexp_extract(col(urlCol), QueryRe, 1)
    val urlNorm = when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, keptPort, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
    pages.withColumn("scheme", scheme).withColumn("host", host)
      .withColumn("path", path).withColumn("url_norm", urlNorm)
  }

  /** Shared verbatim with the DuckDB oracle (double-quoted href values —
    * the form the html_extract fixtures emit; a production crawl adds the
    * single-quoted twin the same way).
    */
  val HrefRe = "href=\"([^\"]*)\""

  /** Link extraction — the crawl-graph step between markup extraction and
    * the graph operators: every `href` in a page's HTML becomes a row
    * (doc_id, pos, href), then [[normalize]] canonicalizes each target so
    * downstream host-graph edges ([[graft.operators.Graph]] pageRank over
    * host→host links, [[hostCap]] frontier budgeting) key on the same
    * canonical string. Relative links have no scheme/host and surface
    * with NULL `url_norm` — resolution against the page's base URL is a
    * caller decision, not invented here. Row-local regexp + explode, no
    * shuffle beyond the presentation sort; fan-out is links-per-page.
    */
  def extractLinks(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    val links = pages.select(col("doc_id"),
      posexplode(regexp_extract_all(col(htmlCol), lit(HrefRe), lit(1)))
        .as(Seq("pos", "href")))
    normalize(links, "href")
      .select(col("doc_id"), col("pos"), col("href"), col("host"),
        col("url_norm"))
  }

  /** Host-keyed per-domain cap: [[normalize]] then route
    * [[Sampling.domainCap]]'s salted two-phase exact rank over the parsed
    * host — the de-skewed rank is reused unchanged, only the key column
    * differs. A hot host (every crawl has one) ranks CapSalts-way
    * parallel in phase 1; phase 2 sees at most cap x CapSalts rows per
    * host. Rows with no parseable host (NULL `url_norm`) cannot be
    * host-capped and are dropped — the quarantine path, not a silent
    * ""-host bucket.
    */
  def hostCap(pages: DataFrame, maxPerHost: Int = 10,
      urlCol: String = "url"): DataFrame =
    Sampling.domainCap(
      normalize(pages, urlCol).filter(col("url_norm").isNotNull),
      "host", maxPerHost)
}
