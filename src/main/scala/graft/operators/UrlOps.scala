package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL curation: canonicalization, host/registered-domain
  * extraction, canonical-URL dedup, and per-domain document caps — the
  * Common-Crawl-style hygiene stages that run BEFORE content dedup in a
  * large-scale training-data pipeline.
  *
  * Scale design (100 TB crawl):
  *  - canonicalization and host extraction are row-local regex chains
  *    over built-in `regexp_replace`/`regexp_extract` — whole-stage
  *    codegen, no UDF, no shuffle;
  *  - canonical dedup is one hash aggregation on the canonical string
  *    (same shape as [[Dedup.exactDedup]]);
  *  - the per-domain cap is one window over (host) — a single shuffle
  *    on the host key, skew-safe because the rank predicate truncates
  *    each partition's output at the cap (WindowGroupLimit pushes the
  *    limit into the sort at Spark 4).
  *
  * The rules are deliberately regex-expressible so the same logic runs
  * verbatim in any engine (the DuckDB oracles mirror each step):
  * fragment stripped, scheme+host lowercased, default ports (:80/:443)
  * dropped, a leading `www.` removed, and tracking parameters
  * (`utm_*`, `gclid`, `fbclid`) deleted with the query string tidied.
  * Path and non-tracking query parameters keep their case and order —
  * reordering parameters changes semantics on some sites, so a
  * conservative canonicalizer must not sort them.
  */
object UrlOps {

  /** scheme://host[:port] prefix of a URL (case preserved). */
  private def prefixOf(u: Column): Column =
    regexp_extract(u, "^[^/]*//[^/?#]*", 0)

  /** Canonical form of `url` per the rules above. Row-local. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val pfx = prefixOf(noFrag)
    // scheme+host lowercased, default port and leading www. dropped
    val pfx2 = regexp_replace(
      regexp_replace(lower(pfx), ":(80|443)$", ""),
      "^(https?://)www\\.", "$1")
    // tracking params deleted, then '&&'/'?&'/trailing separators tidied
    val restRaw = noFrag.substr(length(pfx) + 1, lit(Integer.MAX_VALUE))
    val rest2 = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(restRaw, "(utm_[a-z]+|gclid|fbclid)=[^&#]*", ""),
          "&&+", "&"),
        "\\?&", "?"),
      "[?&]+$", "")
    concat(pfx2, rest2)
  }

  /** Host of a CANONICAL url (already lowercased by canonicalizeUrl). */
  def hostOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z]+://([^/:?#]+)", 1)

  /** Registered-domain heuristic: the last two dot-labels of the host.
    * A public-suffix list would refine multi-label TLDs (`co.uk`); the
    * heuristic is deterministic and dependency-free, and the column is
    * advisory (caps key on the full host, which never over-merges).
    */
  def registeredDomainOf(host: Column): Column =
    regexp_extract(host, "[^.]+\\.[^.]+$", 0)

  /** url → (canon_url, host, domain) columns appended. */
  def withCanonicalUrl(df: DataFrame, urlCol: String): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    df.withColumn("canon_url", canon)
      .withColumn("host", hostOf(col("canon_url")))
      .withColumn("domain", registeredDomainOf(col("host")))
  }

  /** Canonical-URL dedup: one surviving row per canonical URL — the
    * minimum id wins (same keeper rule as exact content dedup, so crawl
    * re-fetches of the same page collapse before any text is hashed).
    * One hash aggregation on the canonical string.
    */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String,
                          idCol: String): DataFrame =
    df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("fetch_count"))

  /** Per-host document cap: rank each host's documents by a quality
    * ordering (`orderBy` columns, best first) and keep the top
    * `maxPerHost`. The standard defense against a single boilerplate
    * domain flooding the corpus. Output keeps (id, host, host_rank).
    *
    * One shuffle on host; Spark 4's WindowGroupLimit truncates each
    * host's sort at the cap, so a 10M-page domain costs a top-N
    * per partition, not a full sort.
    */
  def capPerHost(df: DataFrame, hostCol: String, idCol: String,
                 maxPerHost: Int, orderBy: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hostCol)).orderBy(orderBy: _*)
    df.withColumn("host_rank", row_number().over(w).cast("long"))
      .where(col("host_rank") <= maxPerHost)
  }
}
