"""URL/domain rule filter: planted URLs covering every rule, precedence
order, part parsing, and the summary/report aggregations."""

from __future__ import annotations

from cdc_stream_processor_spark.operators import urlrules as U


def _label(spark, urls):
    """doc_id -> labeled row, doc_id = position in `urls`."""
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return {r["doc_id"]: r for r in U.url_rule_filter(df).collect()}


def test_each_rule_fires_on_its_planted_url(spark):
    out = _label(
        spark,
        [
            "ftp://site1.com/file",                          # bad_scheme
            "https://site3.com/fine",                        # blocked_domain
            "https://site9.xyz/fine",                        # spam_tld
            "https://site1.com/ads/banner",                  # blocked_path
            "https://a.b.c.site1.com/fine",                  # deep_subdomain (5 labels)
            "https://site1.com/p?" + "&".join(f"k{i}=1" for i in range(9)),  # query_heavy
            "https://site1.com/" + "x" * 2100,               # too_long
            "https://www.site1.com/article?a=1",             # keep
        ],
    )
    expect = [
        "bad_scheme", "blocked_domain", "spam_tld", "blocked_path",
        "deep_subdomain", "query_heavy", "too_long", "keep",
    ]
    assert [out[i]["reason"] for i in range(8)] == expect
    assert out[7]["keep"] and not any(out[i]["keep"] for i in range(7))


def test_precedence_first_matching_rule_wins(spark):
    # a URL violating scheme AND domain AND tld AND path reports bad_scheme;
    # fixing the scheme surfaces blocked_domain; and so on down the cascade
    out = _label(
        spark,
        [
            "ftp://site7.xyz/ads/x",     # scheme beats domain/tld/path
            "https://site7.xyz/ads/x",   # domain (site7.xyz blocked) beats tld
            "https://other.xyz/ads/x",   # tld beats path
            "https://other.com/ads/x",   # path is the first failure left
        ],
    )
    assert [out[i]["reason"] for i in range(4)] == [
        "bad_scheme", "blocked_domain", "spam_tld", "blocked_path",
    ]


def test_path_tokens_match_whole_segments_only(spark):
    out = _label(
        spark,
        [
            "https://site1.com/gadsden/history",  # 'ads' inside a word: keep
            "https://site1.com/ads",              # terminal segment: blocked
            "https://site1.com/a/tracker/b",      # mid-path segment: blocked
        ],
    )
    assert [out[i]["reason"] for i in range(3)] == [
        "keep", "blocked_path", "blocked_path",
    ]


def test_part_parsing(spark):
    r = _label(spark, ["https://www.site5.org/a/b?x=1&y=2"])[0]
    assert r["host"] == "www.site5.org"
    assert r["domain"] == "site5.org"
    assert r["tld"] == "org"


def test_summary_and_domain_report_aggregate_exactly(spark):
    df = spark.createDataFrame(
        [
            (1, "https://site1.com/a"),
            (2, "https://site1.com/ads/b"),
            (3, "https://www.site2.net/c"),
            (4, "ftp://site2.net/d"),
        ],
        "doc_id long, url string",
    )
    labeled = U.url_rule_filter(df)
    summary = {r["reason"]: r for r in U.url_filter_summary(labeled).collect()}
    assert summary["keep"]["n_docs"] == 2
    assert summary["blocked_path"]["n_docs"] == 1
    assert summary["bad_scheme"]["n_docs"] == 1
    assert abs(summary["keep"]["share"] - 0.5) < 1e-15

    report = {r["domain"]: r for r in U.domain_reject_rate(labeled).collect()}
    assert report["site1.com"]["n_docs"] == 2
    assert report["site1.com"]["n_rejected"] == 1
    assert report["site2.net"]["n_rejected"] == 1


def _py_reason(url: str) -> str:
    """Pure-Python reference of the rule cascade (same anchored regexes,
    via `re`) — the differential oracle for the Spark expressions."""
    import re

    scheme = (re.match(r"^([a-z][a-z0-9+.-]*)://", url) or [None, ""])[1]
    mh = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]+)", url)
    host = mh.group(1) if mh else ""
    mp = re.match(r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", url)
    path = mp.group(1) if mp else ""
    mq = re.search(r"\?([^#]*)", url)
    query = mq.group(1) if mq else ""
    md = re.search(r"([a-z0-9-]+\.[a-z0-9-]+)$", host)
    domain = md.group(1) if md else ""
    mt = re.search(r"\.([a-z0-9-]+)$", host)
    tld = mt.group(1) if mt else ""
    host_labels = host.count(".") + 1
    n_params = 0 if query == "" else query.count("&") + 1
    if scheme not in U.ALLOWED_SCHEMES:
        return "bad_scheme"
    if domain in U.BLOCKED_DOMAINS:
        return "blocked_domain"
    if tld in U.SPAM_TLDS:
        return "spam_tld"
    if re.search(U.BLOCKED_PATH_RE, path):
        return "blocked_path"
    if host_labels > U.MAX_HOST_LABELS:
        return "deep_subdomain"
    if n_params > U.MAX_QUERY_PARAMS:
        return "query_heavy"
    if len(url) > U.MAX_URL_LEN:
        return "too_long"
    return "keep"


def test_differential_random_urls_match_python_reference(spark):
    """300 seeded-random URLs (random scheme/subdomain depth/domain/tld/
    path segments/query arity/length) through ONE Spark job vs the
    pure-Python cascade — catches any Spark-expression vs reference
    drift across the whole rule space at once."""
    import random

    rng = random.Random(42)
    schemes = ["https", "http", "ftp", "gopher"]
    tlds = list(U.SPAM_TLDS) + ["com", "org", "net", "io"]
    segs = ["ads", "tracker", "wp-login", "article", "item", "gadsden",
            "casino", "news", "a", "b"]
    urls = []
    for _ in range(300):
        sub = ".".join(f"s{rng.randrange(5)}" for _ in range(rng.randrange(0, 5)))
        host = (sub + "." if sub else "") + f"site{rng.randrange(50)}.{rng.choice(tlds)}"
        path = "".join(f"/{rng.choice(segs)}" for _ in range(rng.randrange(0, 4)))
        q = "&".join(f"k{i}=1" for i in range(rng.randrange(0, 12)))
        url = f"{rng.choice(schemes)}://{host}{path}"
        if q:
            url += "?" + q
        if rng.random() < 0.03:
            url += "/x" * 1200
        urls.append(url)
    # guarantee every reason appears regardless of the random draw
    urls += [
        "ftp://site1.com/file",
        "https://site3.com/fine",
        "https://site9.xyz/fine",
        "https://site1.com/ads/banner",
        "https://a.b.c.site1.com/fine",
        "https://site1.com/p?" + "&".join(f"k{i}=1" for i in range(9)),
        "https://site1.com/" + "x" * 2100,
        "https://www.site1.com/article?a=1",
    ]
    out = _label(spark, urls)
    mismatches = [
        (urls[i], out[i]["reason"], _py_reason(urls[i]))
        for i in range(len(urls))
        if out[i]["reason"] != _py_reason(urls[i])
    ]
    assert mismatches == []
    # the random space must actually exercise every reason
    assert {r["reason"] for r in out.values()} == {
        "bad_scheme", "blocked_domain", "spam_tld", "blocked_path",
        "deep_subdomain", "query_heavy", "too_long", "keep",
    }


def test_registered_labels_plan_is_map_only(spark, sf_dir):
    """Scale tripwire: the per-doc labeling must stay a single map-only
    scan — no Exchange in the plan (the first-stage filter at 100 TB is
    scan-bound by design)."""
    from cdc_stream_processor_spark.queries_curation import q_url_filter_labels

    plan = (
        q_url_filter_labels(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
