"""Degenerate-row stress audit: run EVERY registered query against a tiny
fixture whose rows are degenerate — empty/NULL/short texts, empty and
all-zero embeddings, zero-weight docs, customer names without '#',
zero-price orders — the realistic web-scale hazard the generated
testdata never carries (its rows are uniformly well-formed, so the
driver's correctness gate can never surface this crash class).

This is the audit that caught the r10 batch of row-level crashes:
the sequence-reversal family (shingles / bigram_lift / rp_project),
ANSI DIVIDE_BY_ZERO in ratio outputs (gini, recall, priority sampling,
fold cosine), getItem past a split array, and the embedding_dim
first-row bail that disabled embedding_health_audit exactly when it
was needed.

CONTRACT (the allowed failures): the fixed-dim embedding kernels
(kNN/IVF/LSH/gram/k-means/PQ and their graph consumers) fail loudly on
RAGGED embedding arrays — mixed lengths are a schema violation, and
``embedding_health_audit`` (which tolerates them) is the audit a
pipeline runs first. ``ppr_related_vectors`` raises its tested
empty-seed ValueError when the corpus is smaller than the query
stride. Everything else must complete.

Usage::

    python tools/degenerate_stress.py            # ragged fixture (contract mode)
    python tools/degenerate_stress.py --fixed    # fixed-dim fixture: NOTHING may
                                                 # crash except ppr's seed guard
    python tools/degenerate_stress.py --unicode  # adversarial TEXT fixture
                                                 # (astral emoji+ZWJ, RTL+bidi,
                                                 # zalgo stacks, zero-width chars
                                                 # inside words, control chars,
                                                 # NFC/NFD pairs, CJK without
                                                 # spaces, a base64 mega-token)
                                                 # over well-formed shapes:
                                                 # NOTHING may crash except
                                                 # ppr's seed guard

Exit status 1 if any non-contract query crashes.
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys
import tempfile

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)

# Queries ALLOWED to fail on the ragged fixture: every consumer of the
# fixed-dim embedding kernels (np.vstack over per-row vectors). Kept in
# sync by this tool failing when the set drifts.
RAGGED_CONTRACT = {
    "centroid_assign",
    "community_conductance",
    "dbscan_labels",
    "diversity_sample",
    "embedding_gram",
    "embedding_near_dup",
    "embedding_near_dup_pairs",
    "ivf_ann_topk",
    "ivf_recall_eval",
    "kcenter_sample",
    "kmeans_labels",
    "knn_assortativity",
    "knn_clustering_coeff",
    "knn_communities",
    "knn_graph",
    "knn_hubness",
    "knn_label_agreement",
    "knn_pagerank",
    "knn_triangles",
    "lsh_ann_topk",
    "ppr_related_vectors",
    "semdedup",
    "silhouette_by_label",
}
# Allowed on BOTH fixtures: documented, unit-tested guard (empty seed set
# when the corpus is smaller than the query stride).
ALWAYS_CONTRACT = {"ppr_related_vectors"}

# Numeric-pathology mode: queries ALLOWED to fail loudly on NaN/Inf
# money/metric columns — the DELIBERATE exact-money / integer-grid
# contract (corrupt money must never pass silently). Triaged r11: every
# name below fails loudly on the DuckDB twin too (the LOUD class in
# divergence_stress --mode numeric, which enforces that parity).
# Two sub-classes:
# - DECIMAL money sums: Inf/1e308 amounts overflow DECIMAL(18,4)/(38,x)
#   under ANSI on Spark and DuckDB alike.
# - integer-grid kernels: NaN/Inf -> BIGINT grid casts raise on both
#   (embedding/value quantization); embedding_health_audit n_nonfinite
#   is the audit that flags these rows FIRST, and is itself NaN-proof.
NUMERIC_CONTRACT: set[str] = {
    "balance_recon", "basket_size_distribution", "benford_digits",
    "centroid_assign", "centroid_pair_sim", "daily_ohlc",
    "daily_timeseries", "diversity_sample", "embedding_centroids",
    "embedding_outliers", "event_analytics", "grouping_sets_revenue",
    "hopping_event_counts", "important_parts", "json_props_rollup",
    "kmeans_labels", "profile_events", "promo_revenue",
    "quantize_embeddings", "retraction_aggregate", "rolling_anomalies",
    "rollup_revenue", "semdedup", "silhouette_by_label",
    "sketch_quantiles", "user_sessions", "value_histogram",
}

# Temporal-pathology mode: queries ALLOWED to fail on timestamps outside
# python datetime's year 1..9999 range (PySpark's client row
# deserializer — types.py fromInternal — cannot materialize them; the
# PLANS execute, verified by count()), plus the two calendar-span-bound
# operators whose cost is quadratic/heavy-linear in the day span (a
# year-1..9999 spine is 3.65M days; kendall_tau_types' documented
# O(days^2) pair join never finishes, seasonal_by_type's triple window
# over span x types may exceed the budget). timestamp_health_audit is
# the ingest-side detector for exactly these rows.
TEMPORAL_CONTRACT: set[str] = {
    "cdc_parse", "dormancy", "scd2_user_history",
    "point_in_time_user_state", "skyline_orders", "dynamic_sessions",
    "kendall_tau_types", "seasonal_by_type",
}

# NULLs rarely crash (they silently diverge — that's the divergence
# audit's job); a loud failure on the nulls fixture is a finding unless
# listed here with a triaged reason. A NULL embedding is the SAME
# contract violation as a ragged one for the Arrow kernels (numpy can't
# stack None among fixed-dim rows; embedding_health_audit counts
# n_null as the pre-flight), so the ragged contract carries over. The
# fixture's first run also caught ONE real crash outside it:
# temperature_sample's driver-side sorted() died comparing None < str
# on a NULL stratum — fixed with a NULLS-LAST key mirroring the
# oracle's list(w ORDER BY lang).
NULLS_CONTRACT: set[str] = set(RAGGED_CONTRACT)


def build_fixture(out: str, ragged_embeddings: bool) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = lambda s: dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731

    def w(name, data, schema):
        pq.write_table(
            pa.table(data, schema=pa.schema(schema)), f"{out}/{name}.parquet"
        )

    w("region", {"r_regionkey": [0, 1], "r_name": ["", "AMERICA"]},
      [("r_regionkey", pa.int32()), ("r_name", pa.string())])
    w("nation", {"n_nationkey": [0, 1], "n_name": ["A", ""],
                 "n_regionkey": [0, 1]},
      [("n_nationkey", pa.int32()), ("n_name", pa.string()),
       ("n_regionkey", pa.int32())])
    w("customer", {"c_custkey": [1, 2, 3], "c_name": ["", "x", "Customer#1"],
                   "c_nationkey": [0, 0, 1],
                   "c_acctbal": [0.0, -1.0, 9999.99],
                   "c_mktsegment": ["", "BUILDING", "BUILDING"]},
      [("c_custkey", pa.int64()), ("c_name", pa.string()),
       ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
       ("c_mktsegment", pa.string())])
    w("supplier", {"s_suppkey": [1, 2], "s_name": ["", "S"],
                   "s_nationkey": [0, 1], "s_acctbal": [0.0, 1.0]},
      [("s_suppkey", pa.int64()), ("s_name", pa.string()),
       ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())])
    w("part", {"p_partkey": [1, 2], "p_name": ["", "p"], "p_brand": ["B", ""],
               "p_type": ["", "t"], "p_size": [0, 1],
               "p_retailprice": [0.0, 1.0]},
      [("p_partkey", pa.int64()), ("p_name", pa.string()),
       ("p_brand", pa.string()), ("p_type", pa.string()),
       ("p_size", pa.int32()), ("p_retailprice", pa.float64())])
    w("orders", {"o_orderkey": [1, 2, 3], "o_custkey": [1, 2, 3],
                 "o_orderstatus": ["F", "O", "F"],
                 "o_totalprice": [0.0, 1.5, 2.5],
                 "o_orderdate": [ts(0), ts(86400), ts(86400 * 40)],
                 "o_orderpriority": ["", "1-URGENT", "2-HIGH"]},
      [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
       ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
       ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())])
    w("lineitem", {"l_orderkey": [1, 1, 2], "l_partkey": [1, 2, 1],
                   "l_suppkey": [1, 2, 1], "l_linenumber": [1, 2, 1],
                   "l_quantity": [0.0, 1.0, 2.0],
                   "l_extendedprice": [0.0, 10.0, 20.0],
                   "l_discount": [0.0, 0.1, 1.0], "l_tax": [0.0, 0.0, 0.1],
                   "l_returnflag": ["A", "N", "R"],
                   "l_linestatus": ["F", "O", "F"],
                   "l_shipdate": [ts(0), ts(3600), ts(86400 * 10)]},
      [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
       ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
       ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
       ("l_discount", pa.float64()), ("l_tax", pa.float64()),
       ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
       ("l_shipdate", pa.timestamp("us"))])
    w("events", {"event_id": [1, 2, 3, 4],
                 "ts": [ts(0), ts(1), ts(7200), ts(86400 * 35)],
                 "user_id": [1, 1, 2, 2],
                 "event_type": ["view", "", "purchase", "view"],
                 "value": [0.0, -1.0, 100.0, 1e-9],
                 "props": ["{}", "", '{"k":1}', ""]},
      [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
       ("user_id", pa.int64()), ("event_type", pa.string()),
       ("value", pa.float64()), ("props", pa.string())])
    w("documents", {"doc_id": [1, 2, 3, 4, 5, 6, 7],
                    "text": ["", "a", "a b", None,
                             "the quick brown fox jumps over the lazy dog",
                             "the quick brown fox jumps over the lazy dog",
                             "x\n\nx\nx"],
                    "lang": ["en", "", "en", "de", "en", "en", ""],
                    "source": ["s1", "s1", "", "s2", "s2", "s1", "s2"],
                    "n_chars": [0, 1, 3, 0, 44, 44, 7]},
      [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
       ("source", pa.string()), ("n_chars", pa.int64())])
    if ragged_embeddings:
        emb = [[], [0.0, 0.0, 0.0, 0.0], [1.0, 2.0, 3.0, 4.0],
               [1.0, 2.0, 3.0, 4.0], [-1.0, -2.0, -3.0, -4.0]]
    else:
        emb = [[0.0] * 4, [0.0] * 4, [1.0, 2.0, 3.0, 4.0],
               [1.0, 2.0, 3.0, 4.0], [-1.0, -2.0, -3.0, -4.0]]
    w("embeddings", {"vec_id": [1, 2, 3, 4, 5], "embedding": emb,
                     "label": [0, 0, 1, 1, 0]},
      [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
       ("label", pa.int32())])


# Adversarial text rows: every string column a 100 TB web corpus can
# throw at a tokenizer/hasher/regex — astral-plane emoji joined with
# ZWJ, RTL scripts with explicit bidi controls, combining-mark stacks
# (zalgo), zero-width space/joiner INSIDE words, NBSP, C0 control chars
# (including NUL), composed-vs-decomposed normalization pairs, CJK with
# no space boundaries, Turkish dotted/dotless i case pairs, and a
# base64-blob mega-token (one 2000-char "word"). Embeddings stay
# fixed-dim valid so only the text paths are stressed.
ZWJ_FAMILY = "\U0001F469\u200D\U0001F469\u200D\U0001F467\u200D\U0001F466"
UNICODE_TEXTS = [
    ZWJ_FAMILY + " holds the family together " + ZWJ_FAMILY,
    "\u202B\u0627\u0644\u0633\u0644\u0627\u0645 \u0639\u0644\u064A\u0643\u0645\u202C mixed with english words",
    "z\u0301\u0302\u0303\u0304\u0305a\u0316\u0317\u0318lgo stack survives tokenizing",
    "zero\u200Bwidth\u200Cspace\u200Dinside words and nbsp\u00A0here",
    "control\x00chars\x01and\x1Ftabs\there but the doc goes on",
    "caf\u00E9 versus cafe\u0301 normalization pair",
    "\u65E5\u672C\u8A9E\u306E\u6587\u7AE0\u306B\u306F\u30B9\u30DA\u30FC\u30B9\u304C\u306A\u3044",
    "I\u0131stanbul TITLE case pa\u0130rs",
    "b64blob " + "QUJDREVGR0hJSktMTU5PUFFSU1RVVldYWVo0NTY3ODkrLw==" * 40 + " tail",
    "\U0001F600\U0001F601\U0001F602" * 50,
]


def build_unicode_fixture(out: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    build_fixture(out, ragged_embeddings=False)  # well-formed base shapes

    n = len(UNICODE_TEXTS)
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(1, n + 1)),
                "text": UNICODE_TEXTS,
                "lang": ["en", "ar", "en", "en", "en", "fr", "ja", "tr",
                         "en", "und"][:n],
                "source": ["s1", "s2"] * (n // 2),
                "n_chars": [len(t) for t in UNICODE_TEXTS],
            },
            schema=pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string()),
                 ("lang", pa.string()), ("source", pa.string()),
                 ("n_chars", pa.int64())]
            ),
        ),
        f"{out}/documents.parquet",
    )
    # adversarial strings in the relational/event string columns too
    pq.write_table(
        pa.table(
            {
                "c_custkey": [1, 2, 3],
                "c_name": ["Customer#" + ZWJ_FAMILY, "\u202Ename\u202C",
                           "Customer#1"],
                "c_nationkey": [0, 0, 1],
                "c_acctbal": [0.0, 1.0, 9999.99],
                "c_mktsegment": ["BUILDING", "B\u200BUILDING", "BUILDING"],
            },
            schema=pa.schema(
                [("c_custkey", pa.int64()), ("c_name", pa.string()),
                 ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                 ("c_mktsegment", pa.string())]
            ),
        ),
        f"{out}/customer.parquet",
    )
    import datetime as _dt

    ts = lambda s: _dt.datetime(2025, 1, 1) + _dt.timedelta(seconds=s)  # noqa: E731
    pq.write_table(
        pa.table(
            {
                "event_id": [1, 2, 3, 4],
                "ts": [ts(0), ts(1), ts(7200), ts(86400 * 35)],
                "user_id": [1, 1, 2, 2],
                "event_type": ["view", ZWJ_FAMILY, "purch\u0301ase",
                               "vi\u200Dew"],
                "value": [0.0, 1.0, 100.0, 2.0],
                "props": ["{}", '{"k":"' + ZWJ_FAMILY + '"}',
                          '{"k":"\u202B\u0639\u202C"}', "{"],
            },
            schema=pa.schema(
                [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                 ("user_id", pa.int64()), ("event_type", pa.string()),
                 ("value", pa.float64()), ("props", pa.string())]
            ),
        ),
        f"{out}/events.parquet",
    )


def build_numeric_fixture(out: str) -> None:
    """Well-formed shapes; every numeric column carries IEEE pathology.

    NaN / +-Inf / -0.0 / denormals / near-max magnitudes are what a
    100 TB corpus's failed embeds, corrupt amounts, and unit-confused
    feeds actually deliver. Shapes and texts stay valid so only the
    NUMERIC paths are stressed. Embeddings are float32 on disk, so the
    magnitudes are float32-pathological (3e38 squares past f32 max;
    1e-45 is the f32 denormal floor).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    build_fixture(out, ragged_embeddings=False)  # well-formed base shapes

    def w(name, data, schema):
        pq.write_table(
            pa.table(data, schema=pa.schema(schema)), f"{out}/{name}.parquet"
        )

    # Beyond per-row NaN/Inf/-0.0: whole GROUPS that aggregate to exactly
    # 0.0 (an all-zero-price month, an all-zero-value day, an all-zero
    # lineitem flag group). Per-row pathology can never produce a zero
    # GROUP sum — which is why this fixture missed the r11
    # revenue_mom_growth lag(revenue)=0 DIVIDE_BY_ZERO — so any
    # ratio/growth/share whose denominator is a group aggregate is now
    # exercised at zero.
    nan, inf = float("nan"), float("inf")
    w("embeddings",
      {"vec_id": [1, 2, 3, 4, 5, 6, 7, 8],
       "embedding": [[nan, 1.0, 2.0, 3.0], [inf, 1.0, 2.0, 3.0],
                     [-inf, 1.0, 2.0, 3.0], [3e38, 3e38, 3e38, 3e38],
                     [1e-45, 0.0, 0.0, 0.0], [-0.0, 0.0, -0.0, 0.0],
                     [1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0]],
       "label": [0, 0, 1, 1, 0, 1, 0, 1]},
      [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
       ("label", pa.int32())])
    ts = lambda s: dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    w("events",
      {"event_id": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11],
       "ts": [ts(i * 3600) for i in range(8)]
       + [ts(86400 * 5 + i * 3600) for i in range(3)],
       "user_id": [1, 1, 1, 2, 2, 2, 1, 2, 3, 3, 3],
       "event_type": ["view", "view", "purchase", "view", "view",
                      "purchase", "view", "view",
                      # user 3 / day 6: every value exactly 0.0 — zero
                      # group sum, zero variance, zero per-user total
                      "view", "view", "view"],
       "value": [nan, inf, -inf, 1e308, -1e308, -0.0, 5e-324, 1.0,
                 0.0, 0.0, 0.0],
       "props": ["{}"] * 11},
      [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
       ("user_id", pa.int64()), ("event_type", pa.string()),
       ("value", pa.float64()), ("props", pa.string())])
    w("customer",
      {"c_custkey": [1, 2, 3], "c_name": ["Customer#1", "Customer#2",
                                          "Customer#3"],
       "c_nationkey": [0, 0, 1], "c_acctbal": [nan, inf, 9999.99],
       "c_mktsegment": ["BUILDING", "BUILDING", "AUTOMOBILE"]},
      [("c_custkey", pa.int64()), ("c_name", pa.string()),
       ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
       ("c_mktsegment", pa.string())])
    w("supplier", {"s_suppkey": [1, 2], "s_name": ["S1", "S2"],
                   "s_nationkey": [0, 1], "s_acctbal": [inf, 1.0]},
      [("s_suppkey", pa.int64()), ("s_name", pa.string()),
       ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())])
    w("part", {"p_partkey": [1, 2], "p_name": ["part one", "part two"],
               "p_brand": ["B1", "B2"], "p_type": ["t1", "t2"],
               "p_size": [1, 2], "p_retailprice": [nan, 1.0]},
      [("p_partkey", pa.int64()), ("p_name", pa.string()),
       ("p_brand", pa.string()), ("p_type", pa.string()),
       ("p_size", pa.int32()), ("p_retailprice", pa.float64())])
    w("orders", {"o_orderkey": [1, 2, 3, 4, 5, 6],
                 "o_custkey": [1, 2, 3, 1, 2, 3],
                 "o_orderstatus": ["F", "O", "F", "F", "F", "O"],
                 # March 2025 sums to exactly 0.0; April then divides by
                 # the zero lag (the r11 revenue_mom_growth class)
                 "o_totalprice": [nan, inf, 2.5, 0.0, 0.0, 7.5],
                 "o_orderdate": [ts(0), ts(86400), ts(86400 * 40),
                                 ts(86400 * 60), ts(86400 * 61),
                                 ts(86400 * 92)],
                 "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH",
                                     "3-MEDIUM", "3-MEDIUM", "2-HIGH"]},
      [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
       ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
       ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())])
    w("lineitem", {"l_orderkey": [1, 1, 2, 3, 4, 4],
                   "l_partkey": [1, 2, 1, 2, 1, 2],
                   "l_suppkey": [1, 2, 1, 2, 1, 1],
                   "l_linenumber": [1, 2, 1, 1, 1, 2],
                   # the (R, O) flag group is all-zero: zero quantity,
                   # price, discount, tax — zero group sums everywhere
                   "l_quantity": [inf, 1.0, 2.0, 3.0, 0.0, 0.0],
                   "l_extendedprice": [1e308, 1e308, 20.0, 30.0, 0.0, 0.0],
                   "l_discount": [nan, 1.5, -0.0, 0.1, 0.0, 0.0],
                   "l_tax": [0.0, 0.0, 0.1, nan, 0.0, 0.0],
                   "l_returnflag": ["A", "N", "R", "N", "R", "R"],
                   "l_linestatus": ["F", "O", "F", "O", "O", "O"],
                   "l_shipdate": [ts(0), ts(3600), ts(86400 * 10),
                                  ts(86400 * 20), ts(86400 * 30),
                                  ts(86400 * 31)]},
      [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
       ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
       ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
       ("l_discount", pa.float64()), ("l_tax", pa.float64()),
       ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
       ("l_shipdate", pa.timestamp("us"))])
    w("documents",
      {"doc_id": [1, 2, 3, 4],
       "text": ["the quick brown fox jumps over the lazy dog",
                "pack my box with five dozen liquor jugs",
                "the quick brown fox jumps over the lazy dog",
                "sphinx of black quartz judge my vow"],
       "lang": ["en", "en", "en", "en"],
       "source": ["s1", "s2", "s1", "s2"],
       "n_chars": [44, 39, 44, 35]},
      [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
       ("source", pa.string()), ("n_chars", pa.int64())])


def build_temporal_fixture(out: str) -> None:
    """Well-formed shapes; every timestamp column carries pathology.

    Epoch 0, pre-1970 (negative epoch), the pandas datetime64[ns]
    ceiling (2262-04-11) and a row PAST it, and year 9999 — the
    unit-confused (s-as-ms-as-us) corrupt timestamps any real CDC feed
    eventually delivers. The past-2262 rows are the live hazard for
    every Arrow/pandas exchange (pandas ns range is narrower than
    Spark's us range).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    build_fixture(out, ragged_embeddings=False)  # well-formed base shapes

    def w(name, data, schema):
        pq.write_table(
            pa.table(data, schema=pa.schema(schema)), f"{out}/{name}.parquet"
        )

    T = [
        dt.datetime(1970, 1, 1, 0, 0, 0),            # epoch 0
        dt.datetime(1865, 7, 4, 12, 0, 0),           # pre-epoch (negative us)
        dt.datetime(2262, 4, 11, 23, 47, 16, 854775),  # pandas ns max edge
        dt.datetime(2300, 1, 1, 0, 0, 0),            # PAST pandas ns range
        dt.datetime(9999, 12, 31, 23, 59, 59, 999999),  # Spark/SQL max
        dt.datetime(1, 1, 1, 0, 0, 0),               # proleptic minimum
    ]
    w("events",
      {"event_id": [1, 2, 3, 4, 5, 6],
       "ts": T,
       "user_id": [1, 1, 2, 2, 1, 2],
       "event_type": ["view", "purchase", "view", "view", "purchase",
                      "view"],
       "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
       "props": ["{}"] * 6},
      [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
       ("user_id", pa.int64()), ("event_type", pa.string()),
       ("value", pa.float64()), ("props", pa.string())])
    w("orders", {"o_orderkey": [1, 2, 3, 4, 5, 6],
                 "o_custkey": [1, 2, 3, 1, 2, 3],
                 "o_orderstatus": ["F", "O", "F", "O", "F", "O"],
                 "o_totalprice": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
                 "o_orderdate": T,
                 "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT",
                                     "2-HIGH", "1-URGENT", "2-HIGH"]},
      [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
       ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
       ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())])
    w("lineitem", {"l_orderkey": [1, 1, 2, 3, 4, 5],
                   "l_partkey": [1, 2, 1, 2, 1, 2],
                   "l_suppkey": [1, 2, 1, 2, 1, 2],
                   "l_linenumber": [1, 2, 1, 1, 1, 1],
                   "l_quantity": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
                   "l_extendedprice": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
                   "l_discount": [0.0, 0.1, 0.0, 0.1, 0.0, 0.1],
                   "l_tax": [0.0, 0.0, 0.1, 0.0, 0.1, 0.0],
                   "l_returnflag": ["A", "N", "R", "N", "A", "R"],
                   "l_linestatus": ["F", "O", "F", "O", "F", "O"],
                   "l_shipdate": T},
      [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
       ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
       ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
       ("l_discount", pa.float64()), ("l_tax", pa.float64()),
       ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
       ("l_shipdate", pa.timestamp("us"))])


def build_nulls_fixture(out: str) -> None:
    """Well-formed shapes; every NULLABLE column carries NULL somewhere.

    NULL is the pathology a 100 TB lakehouse ships MOST of: missed CDC
    columns, late-arriving dimensions, schema-evolved history. NULLs
    rarely crash — they silently diverge, and always in the same two
    ways: (1) ORDER BY a nullable computed column (Spark ASC default is
    NULLS FIRST, DuckDB's is NULLS LAST — the embedding_outliers class
    the r11 ADVICE found by hand), (2) NULL-propagation asymmetries in
    string/list builtins (split_part, list() over zero rows). This
    fixture plants NULL join keys, NULL group keys, NULL timestamps,
    NULL money, NULL text, and a NULL embedding over otherwise valid
    rows so every ranked/joined/bucketed query meets a NULL it must
    order, drop, or group identically on both engines.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    build_fixture(out, ragged_embeddings=False)  # well-formed base shapes

    def w(name, data, schema):
        pq.write_table(
            pa.table(data, schema=pa.schema(schema)), f"{out}/{name}.parquet"
        )

    ts = lambda s: dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    w("region", {"r_regionkey": [0, 1, 2], "r_name": ["", "AMERICA", None]},
      [("r_regionkey", pa.int32()), ("r_name", pa.string())])
    w("nation", {"n_nationkey": [0, 1, 2], "n_name": ["A", "", None],
                 "n_regionkey": [0, 1, None]},
      [("n_nationkey", pa.int32()), ("n_name", pa.string()),
       ("n_regionkey", pa.int32())])
    w("customer",
      {"c_custkey": [1, 2, 3, 4],
       "c_name": ["", "x", "Customer#1", None],
       "c_nationkey": [0, 0, 1, None],
       "c_acctbal": [0.0, -1.0, 9999.99, None],
       "c_mktsegment": ["", "BUILDING", "BUILDING", None]},
      [("c_custkey", pa.int64()), ("c_name", pa.string()),
       ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
       ("c_mktsegment", pa.string())])
    w("supplier",
      {"s_suppkey": [1, 2, 3], "s_name": ["", "S", None],
       "s_nationkey": [0, 1, None], "s_acctbal": [0.0, 1.0, None]},
      [("s_suppkey", pa.int64()), ("s_name", pa.string()),
       ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())])
    w("part",
      {"p_partkey": [1, 2, 3], "p_name": ["", "p", None],
       "p_brand": ["B", "", None], "p_type": ["", "t", None],
       "p_size": [0, 1, None], "p_retailprice": [0.0, 1.0, None]},
      [("p_partkey", pa.int64()), ("p_name", pa.string()),
       ("p_brand", pa.string()), ("p_type", pa.string()),
       ("p_size", pa.int32()), ("p_retailprice", pa.float64())])
    w("orders",
      {"o_orderkey": [1, 2, 3, 4],
       "o_custkey": [1, 2, 3, None],          # NULL join key
       "o_orderstatus": ["F", "O", "F", None],
       "o_totalprice": [0.0, 1.5, 2.5, None],  # NULL money
       "o_orderdate": [ts(0), ts(86400), ts(86400 * 40), None],  # NULL ts
       "o_orderpriority": ["", "1-URGENT", "2-HIGH", None]},
      [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
       ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
       ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())])
    w("lineitem",
      {"l_orderkey": [1, 1, 2, 3, None],      # NULL join key
       "l_partkey": [1, 2, 1, None, 1],
       "l_suppkey": [1, 2, 1, None, 1],
       "l_linenumber": [1, 2, 1, 1, 1],
       "l_quantity": [0.0, 1.0, 2.0, None, 1.0],
       "l_extendedprice": [0.0, 10.0, 20.0, None, 5.0],
       "l_discount": [0.0, 0.1, 1.0, None, 0.0],
       "l_tax": [0.0, 0.0, 0.1, None, 0.0],
       "l_returnflag": ["A", "N", "R", None, "N"],
       "l_linestatus": ["F", "O", "F", None, "O"],
       "l_shipdate": [ts(0), ts(3600), ts(86400 * 10), None,
                      ts(86400 * 20)]},
      [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
       ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
       ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
       ("l_discount", pa.float64()), ("l_tax", pa.float64()),
       ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
       ("l_shipdate", pa.timestamp("us"))])
    w("events",
      {"event_id": [1, 2, 3, 4, 5, 6],
       "ts": [ts(0), ts(1), ts(7200), ts(86400 * 35), None, ts(9000)],
       "user_id": [1, 1, 2, 2, None, 3],      # NULL group key
       "event_type": ["view", "", "purchase", "view", None, "view"],
       "value": [0.0, -1.0, 100.0, 1e-9, None, None],  # NULL metric
       "props": ["{}", "", '{"k":1}', "", None, None]},
      [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
       ("user_id", pa.int64()), ("event_type", pa.string()),
       ("value", pa.float64()), ("props", pa.string())])
    w("documents",
      {"doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
       "text": ["", "a", "a b", None,
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",
                "x\n\nx\nx", None],
       "lang": ["en", "", "en", "de", "en", "en", "", None],
       "source": ["s1", "s1", "", "s2", "s2", "s1", "s2", None],
       "n_chars": [0, 1, 3, 0, 44, 44, 7, None]},
      [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
       ("source", pa.string()), ("n_chars", pa.int64())])
    w("embeddings",
      {"vec_id": [1, 2, 3, 4, 5, 6],
       "embedding": [[0.0] * 4, [0.0] * 4, [1.0, 2.0, 3.0, 4.0],
                     [1.0, 2.0, 3.0, 4.0], [-1.0, -2.0, -3.0, -4.0],
                     None],                     # NULL vector
       "label": [0, 0, 1, 1, 0, None]},
      [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
       ("label", pa.int32())])


class QueryTimeout(Exception):
    """A query exceeded the per-query budget — a HANG is a finding too.

    The temporal fixture proved crashes aren't the only job-killer: one
    corrupt year-9999 timestamp turns kendall_tau_types' documented
    O(days^2) day-pair join (sane calendar: ~7M pairs) into 1.3e13
    pairs — the job never crashes, it just never finishes.
    """


def _run_with_timeout(spark, fn, tmp, name, seconds):
    """collect() under a watchdog: the query runs in an InheritableThread
    with its own job group; on timeout the group is cancelled (kills the
    running stages) and QueryTimeout is raised."""
    from pyspark import InheritableThread

    box: dict[str, object] = {}

    def work():
        spark.sparkContext.setJobGroup(f"stress-{name}", name,
                                       interruptOnCancel=True)
        try:
            box["rows"] = fn(spark, tmp).collect()
        except Exception as ex:  # noqa: BLE001 — reported by the caller
            box["err"] = ex
        finally:
            spark.sparkContext.setJobGroup("", "")

    t = InheritableThread(target=work, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(f"stress-{name}")
        t.join(30)
        raise QueryTimeout(f"no result within {seconds}s (job group cancelled)")
    if "err" in box:
        raise box["err"]  # type: ignore[misc]
    return box["rows"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=120.0,
                    help="per-query wall budget in seconds; exceeding it is "
                         "a finding (hangs kill 100 TB jobs as surely as "
                         "crashes)")
    # One fixture per run: the contract table is keyed by mode, so two
    # mode flags together would pair one mode's fixture with the other's
    # contract and misreport failures against the wrong allowlist.
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument("--fixed", action="store_true",
                      help="fixed-dim embeddings (zero vectors, no ragged "
                           "rows)")
    mode.add_argument("--unicode", action="store_true",
                      help="adversarial unicode/pathological-token text "
                           "fixture")
    mode.add_argument("--numeric", action="store_true",
                      help="NaN/Inf/-0.0/denormal/huge in every numeric "
                           "column")
    mode.add_argument("--temporal", action="store_true",
                      help="pathological timestamps (epoch 0, pre-1970, "
                           "past-pandas-ns, year 9999)")
    mode.add_argument("--nulls", action="store_true",
                      help="NULL in every nullable column (join keys, "
                           "group keys, timestamps, money, text, vector)")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from cdc_stream_processor_spark.session import get_spark

    spark = get_spark("degenerate-stress", shuffle_partitions=4)
    contract = (
        RAGGED_CONTRACT
        if not (args.fixed or args.unicode or args.numeric or args.temporal
                or args.nulls)
        else ALWAYS_CONTRACT
    )
    if args.numeric:
        contract = ALWAYS_CONTRACT | NUMERIC_CONTRACT
    if args.temporal:
        contract = ALWAYS_CONTRACT | TEMPORAL_CONTRACT
    if args.nulls:
        contract = ALWAYS_CONTRACT | NULLS_CONTRACT

    with tempfile.TemporaryDirectory(prefix="degensf_") as tmp:
        if args.unicode:
            build_unicode_fixture(tmp)
        elif args.numeric:
            build_numeric_fixture(tmp)
        elif args.temporal:
            build_temporal_fixture(tmp)
        elif args.nulls:
            build_nulls_fixture(tmp)
        else:
            build_fixture(tmp, ragged_embeddings=not args.fixed)
        bad = []
        contract_hits = []
        qs = entrymod.queries()
        for name, fn in qs.items():
            try:
                _run_with_timeout(spark, fn, tmp, name, args.timeout)
            except Exception as ex:  # noqa: BLE001 — audit, report everything
                line = str(ex).split("\n")[0][:100]
                if name in contract:
                    contract_hits.append(name)
                    print(f"contract {name}: {type(ex).__name__} {line}")
                else:
                    bad.append(name)
                    print(f"CRASH {name}: {type(ex).__name__} {line}")
    print(f"queries: {len(qs)}, contract failures: {len(contract_hits)}, "
          f"unexpected crashes: {len(bad)}")
    if bad:
        print("unexpected:", sorted(bad))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
