"""URL / domain rule-based quality filtering — the standard first stage of a
web-scale pretraining curation pipeline (C4's blocklist filter, RefinedWeb's
URL scoring: Raffel et al. 2020 §2.2, Penedo et al. 2023 §3.1). Documents
arrive with a source URL; rules over the URL alone (scheme, registered
domain, TLD, path tokens, query shape, length) reject spam/adult/boilerplate
hosts before any text is even read — the cheapest filter in the stack, so it
runs first.

The reference app has no curation surface (this is part of the mandated
LLM-pipeline extension, SURVEY.md §2.11); the semantics here follow the
public C4/RefinedWeb descriptions.

Scale shape: every rule is a map-only JVM column expression (regexp_extract
/ string length / set membership against literal arrays) — zero shuffles for
the per-document labels, one partial-agged shuffle for the summaries. At
100 TB this is scan-bound, exactly what a first-stage filter must be.

Determinism/oracle contract: all parsing is anchored regexes and string
arithmetic expressible identically in DuckDB (no java.net.URL, no locale);
shares are single correctly-rounded int64/int64 double divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Rule constants — the registered queries AND the DuckDB oracles both read
# these, so thresholds can never drift between the two sides.
ALLOWED_SCHEMES = ("http", "https")
BLOCKED_DOMAINS = ("site3.com", "site7.xyz", "site12.net", "site33.top")
SPAM_TLDS = ("xyz", "top", "click", "loan", "work")
# path segments that mark ads/tracking/login/gambling boilerplate; matched
# as whole segments (between slashes) so 'gadsden' doesn't trip 'ads'
BLOCKED_PATH_RE = r"/(ads|tracker|wp-login|casino|popup)(/|$)"
MAX_URL_LEN = 2048
MAX_QUERY_PARAMS = 8
MAX_HOST_LABELS = 4

# anchored parse regexes (Java regex == RE2-safe subset, portable to DuckDB)
_RE_SCHEME = r"^([a-z][a-z0-9+.-]*)://"
_RE_HOST = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_RE_PATH = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
_RE_QUERY = r"\?([^#]*)"
_RE_TLD = r"\.([a-z0-9-]+)$"
_RE_DOMAIN = r"([a-z0-9-]+\.[a-z0-9-]+)$"


def url_parts(url) -> dict[str, F.Column]:
    """Decompose a URL column into named part expressions (all map-only):
    scheme, host, registered domain (last two labels — the public-suffix
    approximation; a production run swaps in the PSL table as a broadcast
    join), tld, path, query, host label count, query param count."""
    host = F.regexp_extract(url, _RE_HOST, 1)
    query = F.regexp_extract(url, _RE_QUERY, 1)
    return {
        "scheme": F.regexp_extract(url, _RE_SCHEME, 1),
        "host": host,
        "domain": F.regexp_extract(host, _RE_DOMAIN, 1),
        "tld": F.regexp_extract(host, _RE_TLD, 1),
        "path": F.regexp_extract(url, _RE_PATH, 1),
        "query": query,
        "host_labels": (
            F.length(host) - F.length(F.replace(host, F.lit("."), F.lit("")))
            + F.lit(1)
        ),
        "query_params": F.when(query == "", F.lit(0)).otherwise(
            F.length(query)
            - F.length(F.replace(query, F.lit("&"), F.lit("")))
            + F.lit(1)
        ),
    }


def url_rule_filter(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document URL verdict: (id, url, host, domain, tld, reason, keep).

    `reason` is the FIRST failing rule in fixed precedence order (cheap
    and decisive rules first, mirroring how C4-style pipelines report a
    single reject reason per document):

      bad_scheme > blocked_domain > spam_tld > blocked_path >
      deep_subdomain > query_heavy > too_long > keep
    """
    url = F.col(url_col)
    p = url_parts(url)
    reason = (
        F.when(~p["scheme"].isin(*ALLOWED_SCHEMES), F.lit("bad_scheme"))
        .when(p["domain"].isin(*BLOCKED_DOMAINS), F.lit("blocked_domain"))
        .when(p["tld"].isin(*SPAM_TLDS), F.lit("spam_tld"))
        .when(p["path"].rlike(BLOCKED_PATH_RE), F.lit("blocked_path"))
        .when(p["host_labels"] > MAX_HOST_LABELS, F.lit("deep_subdomain"))
        .when(p["query_params"] > MAX_QUERY_PARAMS, F.lit("query_heavy"))
        .when(F.length(url) > MAX_URL_LEN, F.lit("too_long"))
        .otherwise(F.lit("keep"))
    )
    return df.select(
        F.col(id_col),
        url.alias("url"),
        p["host"].alias("host"),
        p["domain"].alias("domain"),
        p["tld"].alias("tld"),
        reason.alias("reason"),
        (reason == "keep").alias("keep"),
    )


def url_filter_summary(labeled: DataFrame) -> DataFrame:
    """Reject-reason spectrum: (reason, n_docs, share). One partial-agged
    shuffle to reason cardinality (≤8 rows), then the 1-row total rides a
    broadcast cross join — share is a single int64/int64 double division,
    bit-identical across engines."""
    counts = labeled.groupBy("reason").agg(F.count(F.lit(1)).alias("n_docs"))
    total = labeled.agg(F.count(F.lit(1)).alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "reason",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("_total").cast("double")).alias(
            "share"
        ),
    )


def domain_reject_rate(labeled: DataFrame) -> DataFrame:
    """Per-registered-domain health: (domain, n_docs, n_rejected,
    reject_rate) — the table a crawl operator reads to decide which hosts
    to stop fetching. One shuffle at domain cardinality; reject counts are
    map-side partial sums."""
    return (
        labeled.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((~F.col("keep")).cast("long")).alias("n_rejected"),
        )
        .select(
            "domain",
            "n_docs",
            "n_rejected",
            (
                F.col("n_rejected").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("reject_rate"),
        )
    )
