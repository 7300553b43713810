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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixed", action="store_true",
                    help="fixed-dim embeddings (zero vectors, no ragged rows)")
    ap.add_argument("--unicode", action="store_true",
                    help="adversarial unicode/pathological-token text fixture")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from cdc_stream_processor_spark.session import get_spark

    spark = get_spark("degenerate-stress", shuffle_partitions=4)
    contract = (
        ALWAYS_CONTRACT if (args.fixed or args.unicode) else RAGGED_CONTRACT
    )

    with tempfile.TemporaryDirectory(prefix="degensf_") as tmp:
        if args.unicode:
            build_unicode_fixture(tmp)
        else:
            build_fixture(tmp, ragged_embeddings=not args.fixed)
        bad = []
        contract_hits = []
        qs = entrymod.queries()
        for name, fn in qs.items():
            try:
                fn(spark, tmp).collect()
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
