package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup a web pipeline runs: the SAME
  * page is crawled under many spellings (case-shifted scheme/host,
  * explicit default ports, fragments, tracking parameters, shuffled
  * query order), and canonical-URL grouping collapses them BEFORE any
  * content hash is computed, so the expensive content passes see one
  * row per page. The rule set is the common core of the public
  * canonicalizers (Common Crawl's URL index, C4's dedup key):
  *
  *  1. scheme and host lowercased (RFC 3986 §6.2.2.1 — case-insensitive
  *     components);
  *  2. default port stripped (`:80` for http, `:443` for https —
  *     §6.2.3);
  *  3. fragment dropped (never sent to the server);
  *  4. empty path → `/` (§6.2.3);
  *  5. tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
  *     `msclkid` — the industry-standard strip list);
  *  6. remaining query parameters SORTED (order never reaches the
  *     resource for the overwhelming majority of servers; sorting makes
  *     the key order-insensitive) and an emptied query's `?` dropped.
  *
  * Everything is `regexp_*`, `split`/`filter`/`array_sort`/
  * `array_join` — pure Column operators inside whole-stage codegen, no
  * UDF, no shuffle; the canonical key then feeds the ordinary exact
  * dedup machinery ([[Dedup.exact]]'s groupBy-min shape). Patterns stay
  * in the Java∩RE2 common subset so the oracle replays them in DuckDB.
  */
object Urls {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)"

  /** The canonical spelling of `url` under rules 1-6 above. Input must
    * be an absolute http(s) URL; anything else passes through with only
    * the generic rules applied (no scheme-specific port strip). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val path0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query0 = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = filter(split(query0, "&"),
      p => !(p.rlike(TrackingParam) || p === ""))
    val query = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), auth, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Canonical-URL dedup audit: one row per input with its canonical
    * key and the group keeper (min id per canonical URL — the
    * [[Dedup.exact]] convention on the URL key instead of the content
    * fingerprint). One hash shuffle on the canonical key. */
  def canonicalDedup(df: org.apache.spark.sql.DataFrame, urlCol: Column,
                     idCol: Column): org.apache.spark.sql.DataFrame = {
    val canon = df.withColumn("url_canon", canonicalizeUrl(urlCol))
    canon.join(
      canon.groupBy(col("url_canon").as("uc"))
        .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_spellings")),
      col("url_canon") === col("uc"))
      .drop("uc")
  }

  /** Host-blocklist filtering with DOMAIN-SUFFIX semantics — the standard
    * web-pipeline URL gate (CCNet and RefinedWeb both filter against the
    * UT1/"blocklists" host lists; C4 against an internal one): a rule
    * `bad.example` blocks the host itself AND every subdomain
    * (`ads.bad.example`), because blocklists are maintained at the
    * registrable-domain level while crawls see arbitrary subdomain
    * spellings.
    *
    * Mechanics: each host explodes to its dot-suffix chain (`a.b.c` →
    * `a.b.c`, `b.c`, `c` — bounded by label count, ≤ ~6 in practice),
    * which equi-joins the rule list; a host matching several rules
    * reports the lexicographically smallest (deterministic). The rule
    * list is eval-set-sized (UT1 is ~3M lines ≈ tens of MB) → broadcast;
    * the corpus side is one explode + one broadcast join + one
    * doc-keyed aggregate of the ≤labels match rows, all corpus-linear,
    * and column pruning keeps document text out of the join entirely.
    *
    * Output: one row per input doc — (…, host, blocked, rule) with
    * rule null for clean hosts. */
  def blocklistFilter(docs: org.apache.spark.sql.DataFrame, hostCol: Column,
                      idCol: Column,
                      rules: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val parts = split(hostCol, "\\.")
    val sufs = transform(sequence(lit(0), size(parts) - 1),
      i => array_join(slice(parts, i + 1, size(parts)), "."))
    val hits = docs
      .select(idCol.as("_bid"), explode(sufs).as("suffix"))
      .join(broadcast(rules.select(col("rule").as("suffix"))), "suffix")
      .groupBy("_bid").agg(min("suffix").as("rule"))
    docs.join(hits, idCol === col("_bid"), "left")
      .withColumn("blocked", col("rule").isNotNull)
      .drop("_bid")
  }
}
