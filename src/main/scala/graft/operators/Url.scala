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
  /** ANY scheme'd reference (RFC 3986 §4.1) — authority-less schemes
    * (mailto:, tel:, javascript:, data:) included. [[SchemeRe]] requires
    * "://" and is right for parsing AUTHORITY URLs; using it to decide
    * "is this href relative?" silently merges mailto: links onto the
    * base directory, fabricating same-host crawl edges. Scheme'd
    * references are used as-is, and the authority-less ones then land
    * in [[normalize]]'s NULL-host quarantine — no mailto edges.
    */
  val AnySchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):"

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

  /** Shared verbatim with the DuckDB oracle: BOTH quote styles — the
    * captured value keeps its quotes (RE2 has no branch-dependent group
    * numbering worth relying on), stripped by one substring afterwards.
    * Unquoted href values remain outside the contract (rare, and
    * ambiguous against trailing attributes without lookahead).
    */
  val HrefRe = "href=(\"[^\"]*\"|'[^']*')"

  /** Dot-segment removal as an ordered regexp_replace pass list, shared
    * verbatim with the oracle — the string-expressible subset of
    * RFC 3986 §5.2.4: "/./" and "<segment>/../" rewrites with a BOUNDED
    * unroll (chains deeper than 4 are outside the contract, as are
    * segments consisting only of dots and queries containing
    * "/../"-shaped text). Each pass is a global replace on both engines.
    */
  val DotSegmentPasses: Seq[(String, String)] =
    Seq.fill(4)("/\\./" -> "/") ++ Seq("/\\.$" -> "/") ++
      Seq.fill(4)("/[^/]*[^/.][^/]*/\\.\\./" -> "/") ++
      Seq("/[^/]*[^/.][^/]*/\\.\\.$" -> "/") ++
      Seq.fill(2)("^/\\.\\./" -> "/") ++ Seq("^/\\.\\.$" -> "/")

  private[graft] def removeDotSegments(c: org.apache.spark.sql.Column) =
    DotSegmentPasses.foldLeft(c) { case (acc, (p, r)) =>
      regexp_replace(acc, p, r)
    }

  /** Link extraction — the crawl-graph step between markup extraction and
    * the graph operators: every `href` in a page's HTML becomes a row
    * (doc_id, pos, href), then [[normalize]] canonicalizes each target so
    * downstream host-graph edges ([[graft.operators.Graph]] pageRank over
    * host→host links, [[hostCap]] frontier budgeting) key on the same
    * canonical string. Relative links have no scheme/host and surface
    * with NULL `url_norm` — [[resolveLinks]] is the base-URL-aware form
    * that resolves them. Row-local regexp + explode, no shuffle beyond
    * the presentation sort; fan-out is links-per-page.
    */
  def extractLinks(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    val links = pages.select(col("doc_id"),
        posexplode(regexp_extract_all(col(htmlCol), lit(HrefRe), lit(1)))
          .as(Seq("pos", "qhref")))
      .withColumn("href",
        expr("substring(qhref, 2, length(qhref) - 2)")).drop("qhref")
    normalize(links, "href")
      .select(col("doc_id"), col("pos"), col("href"), col("host"),
        col("url_norm"))
  }

  /** Base-URL reference resolution (RFC 3986 §5.2, the string-expressible
    * subset — oracle-shared): each extracted href resolves against the
    * page's `baseCol` URL before [[normalize]] canonicalizes it, so
    * RELATIVE links — most of a real crawl graph — land on real hosts
    * instead of the NULL quarantine:
    *   - a scheme'd reference ([[AnySchemeRe]] — mailto:/tel:/data:
    *     included) is used as-is (authority-less ones then quarantine);
    *   - "//host/..." (protocol-relative) takes the base's scheme;
    *   - "/abs/path" takes the base's scheme://host;
    *   - "?query" keeps the base's path, replaces its query (RFC 3986
    *     §5.3 — the pagination link);
    *   - "" and "#frag" resolve to the base document itself, base query
    *     included;
    *   - anything else merges onto the base's directory (path up to the
    *     last "/") with [[DotSegmentPasses]] dot-segment removal.
    * Scale shape: identical to [[extractLinks]] — row-local regexp chain,
    * no shuffle; the added resolution is a constant-depth CASE over
    * columns already in flight.
    */
  def resolveLinks(pages: DataFrame, htmlCol: String = "html",
      baseCol: String = "base_url"): DataFrame = {
    val links = pages.select(col("doc_id"), col(baseCol),
        posexplode(regexp_extract_all(col(htmlCol), lit(HrefRe), lit(1)))
          .as(Seq("pos", "qhref")))
      .withColumn("href",
        expr("substring(qhref, 2, length(qhref) - 2)")).drop("qhref")
    val bScheme = lower(regexp_extract(col(baseCol), SchemeRe, 1))
    val bHostPort = regexp_replace(
      regexp_extract(col(baseCol), AuthorityRe, 1), UserinfoRe, "")
    val bPathRaw = regexp_extract(col(baseCol), PathRe, 1)
    val bPath = when(bPathRaw === "", lit("/")).otherwise(bPathRaw)
    val bDir = regexp_replace(bPath, "[^/]*$", "")
    val bq = regexp_extract(col(baseCol), QueryRe, 1)
    val bQuery = when(bq =!= "", concat(lit("?"), bq)).otherwise(lit(""))
    val hasScheme = regexp_extract(col("href"), AnySchemeRe, 1) =!= ""
    val abs =
      when(hasScheme, col("href"))
        .when(col("href").startsWith("//"),
          concat(bScheme, lit(":"), col("href")))
        .when(col("href").startsWith("/"),
          concat(bScheme, lit("://"), bHostPort, col("href")))
        .when(col("href").startsWith("?"),
          concat(bScheme, lit("://"), bHostPort, bPath, col("href")))
        .when(col("href") === "" || col("href").startsWith("#"),
          concat(bScheme, lit("://"), bHostPort, bPath, bQuery))
        .otherwise(concat(bScheme, lit("://"), bHostPort,
          removeDotSegments(concat(bDir, col("href")))))
    normalize(links.withColumn("abs_url", abs), "abs_url")
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
