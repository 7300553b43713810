"""Planted-case tests for the evaluation & audit family (round-7
session 4): AMS F2, simplified silhouette, 1-NN label agreement, DBSCAN,
TextRank, audio segmentation, k-anonymity, LSH recall evaluation.

Each test hand-computes the expected values (or replays the operator's
exact hash arithmetic in Python) — the same contract as the rest of the
suite: the driver oracle proves engine parity; these prove the SEMANTICS
on inputs where the right answer is known by construction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cdc_stream_processor_spark.operators import clustereval as CE
from cdc_stream_processor_spark.operators import frequency as FR
from cdc_stream_processor_spark.operators import multimodal as M
from cdc_stream_processor_spark.operators import profiling as PF
from cdc_stream_processor_spark.operators import text as X


# --- AMS F2 --------------------------------------------------------------------


def _ams_sign_py(j: int, k: str) -> int:
    h = int(hashlib.md5(f"{j}|{k}".encode()).hexdigest()[:8], 16)
    return (h % 2) * 2 - 1


def test_ams_f2_matches_hand_computation(spark):
    # stream: a x3, b x2, c x1  ->  F2 = 9 + 4 + 1 = 14
    rows = [("a",)] * 3 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "key string")
    out = {
        r["estimator"]: r for r in FR.ams_f2(df, key_col="key").collect()
    }
    assert len(out) == FR.AMS_ESTIMATORS
    freqs = {"a": 3, "b": 2, "c": 1}
    for j in range(FR.AMS_ESTIMATORS):
        expected_sum = sum(_ams_sign_py(j, k) * f for k, f in freqs.items())
        r = out[j]
        assert r["signed_sum"] == expected_sum
        assert r["f2_estimate"] == expected_sum * expected_sum
        assert r["f2_exact"] == 14


def test_ams_f2_single_key_is_exact(spark):
    # one key: every estimator's |signed_sum| = f, so estimate == F2 exactly
    df = spark.createDataFrame([("x",)] * 7, "key string")
    for r in FR.ams_f2(df, key_col="key").collect():
        assert r["f2_estimate"] == 49 == r["f2_exact"]


# --- simplified silhouette -------------------------------------------------------


def test_silhouette_tight_separated_clusters_near_one(spark):
    # two orthogonal tight clusters: a != b within cluster so points are
    # not ON the centroid, but cross-cluster similarity ~ 0
    rows = [
        (1, [1.0, 0.02], 0),
        (2, [1.0, -0.02], 0),
        (3, [0.02, 1.0], 1),
        (4, [-0.02, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["label"]: r for r in CE.silhouette_by_label(df).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["n_vecs"] == 2
        assert r["mean_silhouette"] > 0.9


def test_silhouette_mislabeled_point_drags_mean_negative(spark):
    # label 1's second member actually sits in label 0's direction ->
    # its own-centroid distance exceeds the other-centroid distance
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.01], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.98, 0.02], 1),  # mislabeled
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["label"]: r for r in CE.silhouette_by_label(df).collect()}
    # the mislabeled point's strongly negative score drags label 1 down
    assert out[1]["mean_silhouette"] < out[0]["mean_silhouette"]
    assert out[1]["mean_silhouette"] < 0.3


# --- 1-NN label agreement --------------------------------------------------------


def test_knn_label_agreement_counts(spark):
    # 1<->2 mutual NN (label a), 3<->4 mutual NN (label b): agreement 1.0;
    # then flip 4's label -> 3 and 4 both disagree with their NN
    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [0.999, 0.01], "a"),
        (3, [0.0, 1.0], "b"),
        (4, [0.01, 0.999], "b"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {r["label"]: r for r in CE.knn_label_agreement(df, graph_k=1).collect()}
    assert out["a"]["n_matched"] == 2 and out["a"]["agreement"] == 1.0
    assert out["b"]["n_matched"] == 2 and out["b"]["agreement"] == 1.0

    rows_flipped = rows[:3] + [(4, [0.01, 0.999], "c")]
    df2 = spark.createDataFrame(
        rows_flipped, "vec_id long, embedding array<double>, label string"
    )
    out2 = {
        r["label"]: r for r in CE.knn_label_agreement(df2, graph_k=1).collect()
    }
    assert out2["b"]["n_matched"] == 0  # 3's NN is now labeled c
    assert out2["c"]["n_matched"] == 0  # 4's NN is labeled b


def test_knn_label_agreement_rank1_of_k5_graph_same_result(spark):
    rows = [
        (i, [1.0 + 0.001 * i, 0.01 * (i % 3)], "l" + str(i % 2))
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    a = sorted(
        map(tuple, CE.knn_label_agreement(df, graph_k=1).collect())
    )
    b = sorted(
        map(tuple, CE.knn_label_agreement(df, graph_k=5).collect())
    )
    assert a == b


# --- DBSCAN ----------------------------------------------------------------------


def test_dbscan_core_border_noise_roles(spark):
    # pair graph: triangle {1,2,3} (each deg 2 -> cores at min_pts=2),
    # node 4 hangs off node 1 (deg 1 -> border), node 5 isolated (noise)
    vecs = spark.createDataFrame([(i,) for i in range(1, 6)], "vec_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "vec_a long, vec_b long"
    )
    out = {
        r["vec_id"]: r
        for r in CE.dbscan_from_pairs(vecs, pairs, min_pts=2).collect()
    }
    assert len(out) == 5
    for core in (1, 2, 3):
        assert out[core]["role"] == "core" and out[core]["cluster"] == 1
    assert out[4]["role"] == "border" and out[4]["cluster"] == 1
    assert out[5]["role"] == "noise" and out[5]["cluster"] is None


def test_dbscan_isolated_core_pair_forms_own_cluster(spark):
    # two dense components; border adjacent to both takes the SMALLER rep
    vecs = spark.createDataFrame([(i,) for i in range(1, 8)], "vec_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (5, 6), (5, 7), (6, 7), (3, 4), (4, 5)],
        "vec_a long, vec_b long",
    )
    # min_pts=2: all of 1,2,3,5,6,7 are cores; 4 has deg 2 -> ALSO core,
    # bridging the components into one cluster rep=1
    out = {
        r["vec_id"]: r
        for r in CE.dbscan_from_pairs(vecs, pairs, min_pts=2).collect()
    }
    assert all(out[i]["cluster"] == 1 for i in range(1, 8))
    # min_pts=3: only the triangles stay... nodes 1,3 have deg 3;
    # 2,5,6,7 deg 2; 4 deg 2 -> cores {1,3} (+5 deg 3? no: 5 has 6,7,4 = 3)
    out3 = {
        r["vec_id"]: r
        for r in CE.dbscan_from_pairs(vecs, pairs, min_pts=3).collect()
    }
    # cores: 1 (2,3,4... deg: 1-{2,3}=2) recompute: deg(1)=2, deg(2)=2,
    # deg(3)=3, deg(4)=2, deg(5)=3, deg(6)=2, deg(7)=2 -> cores {3, 5}
    assert out3[3]["role"] == "core" and out3[5]["role"] == "core"
    # 3 and 5 are NOT adjacent (path via 4) -> two singleton-core clusters
    assert out3[3]["cluster"] == 3 and out3[5]["cluster"] == 5
    # 4 borders both core clusters -> smallest rep wins (3)
    assert out3[4]["role"] == "border" and out3[4]["cluster"] == 3


# --- TextRank --------------------------------------------------------------------


def test_textrank_hub_token_ranks_first(spark):
    # 'hub' co-occurs with every spoke (>= min_cooc each); spokes only
    # ever touch the hub -> hub collects rank mass from all spokes
    docs = []
    for spoke in ("aa", "bb", "cc", "dd"):
        docs += [(f"hub {spoke} hub {spoke} hub {spoke}",)] * 2
    df = spark.createDataFrame(docs, "text string")
    out = X.textrank_keywords(df, top_k=5, min_cooc=3, n_iter=3).collect()
    assert out[0]["token"] == "hub"
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    # spokes are symmetric: identical pr_q
    spoke_ranks = {r["token"]: r["pr_q"] for r in out if r["token"] != "hub"}
    assert len(set(spoke_ranks.values())) == 1


def test_textrank_min_cooc_prunes_rare_edges(spark):
    df = spark.createDataFrame(
        [("x y x y x y",), ("p q",)], "text string"
    )
    out = X.textrank_keywords(df, top_k=10, min_cooc=3, n_iter=2).collect()
    toks = {r["token"] for r in out}
    assert toks == {"x", "y"}  # p-q seen once < min_cooc


# --- audio chunks ----------------------------------------------------------------


def test_audio_chunks_boundaries_and_sha(spark):
    text = "hello audio payload"
    payload = text.encode()
    digest = hashlib.sha256(payload).digest()
    duration_us = 1_000_000 + digest[1] * 62_500
    n_chunks = -(-duration_us // M.AUDIO_CHUNK_US)
    media = spark.createDataFrame(
        [(7, "audio", "audio/wav", bytearray(payload))],
        "media_id long, kind string, mime string, payload binary",
    )
    rows = sorted(
        M.audio_chunks(media).collect(), key=lambda r: r["chunk_idx"]
    )
    assert len(rows) == n_chunks
    for i, r in enumerate(rows):
        assert r["chunk_idx"] == i
        assert r["start_us"] == i * M.AUDIO_CHUNK_US
        assert r["end_us"] == min((i + 1) * M.AUDIO_CHUNK_US, duration_us)
        assert r["duration_us"] == duration_us
        expected_sha = hashlib.sha256(payload + f":{i}".encode()).hexdigest()
        assert r["chunk_sha"] == expected_sha
    assert rows[-1]["end_us"] == duration_us


def test_audio_chunks_only_audio_kind(spark):
    media = spark.createDataFrame(
        [
            (1, "video", "video/mp4", bytearray(b"v")),
            (2, "audio", "audio/wav", bytearray(b"a")),
            (3, "image", "image/png", bytearray(b"i")),
        ],
        "media_id long, kind string, mime string, payload binary",
    )
    assert {
        r["media_id"] for r in M.audio_chunks(media).collect()
    } == {2}


# --- k-anonymity -----------------------------------------------------------------


def test_k_anonymity_spectrum(spark):
    rows = (
        [("ng", "A")] * 5  # one 5-group
        + [("ng", "B")] * 3  # one 3-group
        + [("gh", "A")]  # two singletons
        + [("gh", "B")]
    )
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = {
        r["group_size"]: r
        for r in PF.k_anonymity(
            df, [F.col("nation"), F.col("seg")], k=5
        ).collect()
    }
    assert out[1]["n_groups"] == 2 and out[1]["n_rows"] == 2
    assert out[1]["at_risk"] is True
    assert out[3]["n_groups"] == 1 and out[3]["at_risk"] is True
    assert out[5]["n_groups"] == 1 and out[5]["at_risk"] is False


# --- LSH recall eval --------------------------------------------------------------


def test_lsh_recall_eval_exact_dups_fully_recalled(spark, sf_dir):
    # identical docs agree on EVERY band, so LSH must recover the pair:
    # n_missed == 0 and recall == 1.0 on a planted exact-dup corpus
    from cdc_stream_processor_spark.queries_quality import q_lsh_recall_eval
    from cdc_stream_processor_spark.sources import batch as B

    r = q_lsh_recall_eval(spark, sf_dir).collect()[0]
    assert r["n_lsh"] + r["n_missed"] == r["n_union"]
    # the banded generator on this corpus recalls everything (the oracle
    # re-proves this each gate run); keep a >= bound so testdata
    # regeneration can't silently flip the assertion's meaning
    assert r["recall_lower_bound"] >= 0.9


# --- second batch: minhash calibration, hubness, ER entities, streaming AMS -------


def test_minhash_est_vs_exact_identical_docs(spark):
    # identical docs: all 32 signature components agree -> est_milli 1000,
    # exact jaccard 1.0; a disjoint doc pairs with nothing
    from cdc_stream_processor_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    rows = D.minhash_estimate_vs_exact(docs).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(1, 2)}
    r = rows[0]
    assert r["sig_matches"] == D.N_MINHASH
    assert r["est_milli"] == 1000
    assert r["jaccard"] == 1.0


def test_in_degree_spectrum_includes_zero_degree_nodes(spark):
    from cdc_stream_processor_spark.operators.graph import in_degree_spectrum

    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 2), (2, 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    out = {r["in_degree"]: r["n_nodes"] for r in
           in_degree_spectrum(edges, nodes).collect()}
    # node 2 has in-degree 3, node 1 has 1, nodes 3/4/5 have 0
    assert out == {3: 1, 1: 1, 0: 3}


def test_er_entities_transitive_closure_and_canonical(spark):
    # three records matching pairwise via name typos within one block ->
    # one entity rooted at the smallest key; an unrelated record stands alone
    from cdc_stream_processor_spark.operators import linkage as L

    rows = [
        (10, "Customer#000000010", 5, 100.0, "BUILDING"),
        (11, "Customer#000000011", 5, 150.0, "BUILDING"),  # dist 1, bal close
        (12, "Customer#000000012", 5, 120.0, "BUILDING"),  # dist 1 to both
        (99, "Totally Different Name", 5, 99999.0, "BUILDING"),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    out = {r["c_custkey"]: r for r in L.er_entities(df).collect()}
    assert out[10]["entity_id"] == 10 and out[10]["is_canonical"]
    assert out[11]["entity_id"] == 10 and not out[11]["is_canonical"]
    assert out[12]["entity_id"] == 10
    assert out[99]["entity_id"] == 99 and out[99]["is_canonical"]


def test_ams_stream_single_batch_parity_and_accumulation(spark, tmp_path):
    from cdc_stream_processor_spark.operators import frequency as FR
    from cdc_stream_processor_spark.streaming import pipelines as SP
    from cdc_stream_processor_spark.streaming import sketch as SK

    src = f"{tmp_path}/ams_src"
    ckpt = f"{tmp_path}/ams_ckpt"
    all_keys: list[str] = []

    def write_file(keys):
        all_keys.extend(keys)
        spark.createDataFrame(
            [(k,) for k in keys], "key string"
        ).coalesce(1).write.mode("append").parquet(src)

    def run(name):
        stream = spark.readStream.schema("key string").parquet(src)
        q = SP.start_pipeline(
            SK.ams_stream(stream, key_col="key"),
            name, ckpt,
            output_mode="update", sink_format="memory",
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        rows = spark.sql(f"select * from {name}").collect()
        out: dict[int, int] = {}
        for r in rows:  # update mode may emit a cell per batch; sums are
            out[r.estimator] = r.signed_sum  # latest wins (single batch here)
        return out

    def batch_sums(keys):
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        return {
            r["estimator"]: r["signed_sum"]
            for r in FR.ams_f2(df, key_col="key").collect()
        }

    write_file(["x"] * 4 + ["y"] * 2 + ["z"])
    assert run("ams_m1") == batch_sums(all_keys)

    # second run on the same checkpoint: signed sums must ACCUMULATE
    write_file(["x"] * 3 + ["w"] * 5)
    out2 = run("ams_m2")
    expected = batch_sums(all_keys)
    # every emitted cell must equal the full-stream batch value
    assert out2 and all(expected[j] == v for j, v in out2.items())


def test_l_diversity_homogeneous_class_flagged(spark):
    # class (ng, A): 4 rows ALL sensitive=1 -> l=1 at-risk even though
    # k-anonymity (k<=4) would pass it; class (gh, B): 3 distinct values
    rows = [
        ("ng", "A", 1), ("ng", "A", 1), ("ng", "A", 1), ("ng", "A", 1),
        ("gh", "B", 1), ("gh", "B", 2), ("gh", "B", 3),
    ]
    df = spark.createDataFrame(rows, "nation string, seg string, s int")
    out = {
        r["l_distinct"]: r
        for r in PF.l_diversity(
            df, [F.col("nation"), F.col("seg")], F.col("s"), l_threshold=3
        ).collect()
    }
    assert out[1]["n_groups"] == 1 and out[1]["n_rows"] == 4
    assert out[1]["at_risk"] is True
    assert out[3]["n_groups"] == 1 and out[3]["at_risk"] is False


def test_clustering_coefficients_triangle_path_isolated(spark):
    from cdc_stream_processor_spark.operators.graph import (
        clustering_coefficients,
    )

    # triangle {1,2,3} + pendant 4 on 1 + isolated 5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    out = {
        r["node"]: r
        for r in clustering_coefficients(edges, nodes).collect()
    }
    # node 1: deg 3, 1 triangle -> cc = 2/(3*2) = 1/3
    assert out[1]["degree"] == 3 and out[1]["n_triangles"] == 1
    assert abs(out[1]["clustering_coeff"] - 1 / 3) < 1e-12
    # nodes 2, 3: deg 2, 1 triangle -> cc = 1.0
    assert out[2]["clustering_coeff"] == 1.0
    assert out[3]["clustering_coeff"] == 1.0
    # pendant and isolated: degree < 2 -> cc NULL
    assert out[4]["degree"] == 1 and out[4]["clustering_coeff"] is None
    assert out[5]["degree"] == 0 and out[5]["clustering_coeff"] is None


# --- batch 5: sequential patterns, Theil-Sen, datasheet ----------------------------


def test_frequent_event_sequences_support_and_occurrences(spark):
    from datetime import datetime

    from cdc_stream_processor_spark.operators import relational as R

    def ev(eid, uid, i, typ):
        return (eid, datetime(2026, 1, 1, 0, i), uid, typ)

    rows = (
        [ev(i, 1, i, t) for i, t in enumerate(["a", "b", "c", "d"])]
        + [ev(10 + i, 2, i, t) for i, t in enumerate(["a", "b", "c"])]
        # u3: a b c a b c -> a>b>c occurs TWICE for one user
        + [ev(20 + i, 3, i, t) for i, t in enumerate("abcabc")]
        + [ev(30, 4, 0, "z")]  # too short: contributes nothing
    )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["pattern"]: r
        for r in R.frequent_event_sequences(df, top_k=10).collect()
    }
    assert out["a>b>c"]["n_users"] == 3
    assert out["a>b>c"]["n_occurrences"] == 4  # 1 + 1 + 2
    assert out["b>c>d"]["n_users"] == 1
    assert "z" not in "".join(out)  # the length-1 journey emitted no gram
    ranks = sorted((r["rank"], p) for p, r in out.items())
    assert ranks[0][1] == "a>b>c"  # highest support first


def test_theil_sen_median_slope_hand_computed(spark):
    from datetime import datetime, timedelta

    from cdc_stream_processor_spark.operators import relational as R

    # day counts: d0=1, d1=2, d2=3, d3=10
    rows = []
    eid = 0
    for d, cnt in [(0, 1), (1, 2), (2, 3), (3, 10)]:
        for _ in range(cnt):
            rows.append(
                (eid, datetime(2026, 1, 1) + timedelta(days=d), 1, "x")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = R.theil_sen_daily(df).collect()[0]
    # slopes: (0,1)=1 (0,2)=1 (0,3)=3 (1,2)=1 (1,3)=4 (2,3)=7
    # sorted: 1,1,1,3,4,7 -> rn=(6+1)//2=3 -> median 1.0
    assert r["n_days"] == 4 and r["n_pairs"] == 6
    assert r["ts_slope_per_day"] == 1.0


def test_corpus_datasheet_hand_computed(spark):
    from cdc_stream_processor_spark.queries_quality import q_corpus_datasheet

    docs = spark.createDataFrame(
        [
            (1, "hello world", "en", "web", 11),
            (2, "  Hello   World ", "en", "web", 16),  # normalized dup of 1
            (3, "bonjour le monde", "fr", "book", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import cdc_stream_processor_spark.sources.batch as B

    orig = B.load_table
    try:
        B.load_table = lambda spark, sf, name: docs
        r = q_corpus_datasheet(spark, "unused").collect()[0]
    finally:
        B.load_table = orig
    assert r["n_docs"] == 3
    assert r["total_tokens"] == 2 + 2 + 3
    assert r["vocab_size"] == 5  # hello world bonjour le monde
    assert r["n_sources"] == 2 and r["n_langs"] == 2
    assert r["n_dup_docs"] == 1
    assert abs(r["avg_chars"] - (11 + 16 + 16) / 3) < 1e-9


def test_ivf_recall_eval_bounds(spark, sf_dir):
    from cdc_stream_processor_spark.queries_quality import q_ivf_recall_eval

    r = q_ivf_recall_eval(spark, sf_dir).collect()[0]
    assert 0 < r["n_queries"]
    assert 0 <= r["n_hits"] <= r["n_queries"] * r["k"]
    assert 0.0 <= r["recall"] <= 1.0
    # the probe parameterization is tuned for >= 0.8 on this corpus
    # (same bound the ivf unit test pins)
    assert r["recall"] >= 0.8


def test_watermark_slack_audit_hand_computed(spark):
    from datetime import datetime

    # GLOBAL arrival order (col k) — the watermark is global across keys:
    # user 2's events are each IN ORDER per-key but arrive after user 1
    # advanced the global event-time max to 10:05, so a real watermark
    # would drop them; the audit must count them late (the per-key
    # running max would report 0 for both — the exact undersizing the
    # r7 ADVICE flagged).
    rows = [
        (1, 1, datetime(2026, 1, 1, 10, 0)),
        (2, 1, datetime(2026, 1, 1, 10, 2)),
        (3, 1, datetime(2026, 1, 1, 10, 1)),   # 60 s behind run-max 10:02
        (4, 1, datetime(2026, 1, 1, 10, 5)),
        (5, 2, datetime(2026, 1, 1, 9, 0)),    # 65 min behind 10:05
        (6, 2, datetime(2026, 1, 1, 9, 30)),   # 35 min behind 10:05
    ]
    df = spark.createDataFrame(rows, "k long, user_id long, ts timestamp")
    r = PF.watermark_slack_audit(df, F.col("k")).collect()[0]
    assert r["n_events"] == 6
    assert r["n_late"] == 3
    assert r["max_lateness_us"] == 65 * 60_000_000
    assert r["sum_lateness_us"] == (1 + 65 + 35) * 60_000_000

    # bucket-boundary robustness: the distributed prefix scan must give
    # the same answer whatever the bucket count (1 bucket = one global
    # window; 2 and 7 force cross-bucket prefix merges on 6 rows)
    for nb in (1, 2, 7):
        rb = PF.watermark_slack_audit(df, F.col("k"), n_buckets=nb).collect()[0]
        assert rb["n_late"] == 3
        assert rb["sum_lateness_us"] == (1 + 65 + 35) * 60_000_000


def test_watermark_slack_audit_null_arrival_excluded(spark):
    from datetime import datetime

    # A NULL arrival key has no replay position; before the r8-ADVICE
    # guard, F.least silently dropped it into the LAST bucket (nulls-first
    # window order) and it polluted the running max. Contract: excluded.
    rows = [
        (1, datetime(2026, 1, 1, 10, 0)),
        (None, datetime(2026, 1, 1, 23, 59)),  # would poison run-max if kept
        (2, datetime(2026, 1, 1, 10, 2)),
        (3, datetime(2026, 1, 1, 10, 1)),  # 60 s behind run-max 10:02
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    r = PF.watermark_slack_audit(df, F.col("k")).collect()[0]
    assert r["n_events"] == 3  # NULL-key row excluded from the audit
    assert r["n_late"] == 1
    assert r["sum_lateness_us"] == 60_000_000


def test_watermark_slack_audit_differential_random_streams(spark):
    """Seeded-random streams vs a brute-force Python replay: sort by
    arrival key, fold the global running max, accumulate lateness — the
    distributed bucket/prefix scan must agree exactly on every statistic,
    whatever the stream size, timestamp ties, or bucket count."""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(7)
    base = datetime(2026, 1, 1)
    for size, nb in ((1, 4096), (50, 3), (50, 17), (400, 4096), (400, 1)):
        aks = rng.sample(range(10 * size), size)  # unique arrival keys
        rows = [
            (ak, rng.randrange(5), base + timedelta(seconds=rng.randrange(size * 3)))
            for ak in aks
        ]
        df = spark.createDataFrame(rows, "k long, user_id long, ts timestamp")
        got = PF.watermark_slack_audit(df, F.col("k"), n_buckets=nb).collect()[0]
        run_max, n_late, mx, sm = None, 0, 0, 0
        for _, _, ts in sorted(rows, key=lambda r: r[0]):
            us = int(ts.timestamp() * 1_000_000)
            run_max = us if run_max is None else max(run_max, us)
            late = run_max - us
            n_late += late > 0
            mx = max(mx, late)
            sm += late
        assert got["n_events"] == size
        assert got["n_late"] == n_late, (size, nb)
        assert got["max_lateness_us"] == mx, (size, nb)
        assert got["sum_lateness_us"] == sm, (size, nb)


def test_embedding_health_audit_planted_defects(spark):
    from cdc_stream_processor_spark.operators import similarity as S

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 0.0], 0),        # zero vector
        (3, [1.0, 2.0, 3.0], 0),   # wrong dim
        (4, [float("nan"), 1.0], 1),
        (5, [0.5, 0.5], 1),
        (6, None, 1),              # NULL vector (failed embed job)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {
        r["label"]: r
        for r in S.embedding_health_audit(df, expected_dim=2).collect()
    }
    assert out[0]["n_vecs"] == 3
    assert out[0]["n_zero"] == 1
    assert out[0]["n_wrong_dim"] == 1
    assert out[0]["n_nonfinite"] == 0
    assert out[0]["n_null"] == 0
    assert out[1]["n_nonfinite"] == 1
    # the NULL vector counts ONLY under n_null — it is not wrong-dim,
    # not zero, not non-finite, and its NULL norm2 stays out of min/max
    assert out[1]["n_vecs"] == 3 and out[1]["n_null"] == 1
    assert out[1]["n_wrong_dim"] == 0 and out[1]["n_zero"] == 0
    # norm2 on the 1e-6 grid: [0.5, 0.5] -> 2 * 500000^2
    assert out[1]["min_norm2_scaled"] <= 2 * 500_000**2
    assert out[1]["min_norm2_scaled"] is not None


def test_watermark_audit_prediction_controls_streaming_drops(spark, tmp_path):
    """End-to-end: a 0-second watermark (the reference's no-grace
    semantics) DROPS a late event once the watermark has advanced, and a
    watermark sized from the audit's max_lateness_us keeps it. Empirical
    Spark semantics encoded here: since the multi-stateful-operator
    change (3.4+), the LATE-INPUT filter uses the eviction watermark
    delayed by one micro-batch (the executed plan prints both:
    `StateStoreSave ... Update, <lateEvents>, <eviction>`), so the late
    file arrives two batches after the watermark-advancing file, with a
    filler batch between. Files are pinned to (mtime, path) order —
    FileStreamSource batches by exactly that."""
    import glob as globmod
    import os
    import shutil
    from datetime import datetime

    from cdc_stream_processor_spark.operators import profiling as PF
    from cdc_stream_processor_spark.streaming import pipelines as SP

    src = f"{tmp_path}/wm_src"
    os.makedirs(src)
    files = [
        [(1, 1, datetime(2026, 1, 1, 10, 0)),
         (2, 1, datetime(2026, 1, 1, 10, 10))],
        [(9, 1, datetime(2026, 1, 1, 10, 11))],  # filler: wm already 10:10
        [(3, 1, datetime(2026, 1, 1, 10, 1))],   # 9 min late, 2 batches on
    ]
    for i, rows in enumerate(files):
        tmp = f"{tmp_path}/wm_tmp{i}"
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = f"{src}/{chr(ord('a') + i)}.parquet"
        shutil.copy(globmod.glob(f"{tmp}/part-*.parquet")[0], dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)

    # the audit on the arrival-ordered batch replay predicts the slack
    batch = spark.read.parquet(src)
    audit = PF.watermark_slack_audit(batch, F.col("event_id")).collect()[0]
    assert audit["n_late"] == 1
    lateness_s = audit["max_lateness_us"] // 1_000_000
    assert lateness_s == 9 * 60

    def windowed_total(delay: str, name: str):
        stream = (
            spark.readStream
            .schema("event_id long, user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", delay)
            .groupBy(F.window("ts", "5 minutes"), F.col("user_id"))
            .count()
        )
        q = SP.start_pipeline(
            agg, name, f"{tmp_path}/ck_{name}",
            output_mode="update", sink_format="memory",
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        latest = {}
        for r in spark.sql(f"select * from {name}").collect():
            latest[(str(r["window"]), r["user_id"])] = r["count"]
        return sum(latest.values())

    # no-grace: the late event is dropped -> 3 of 4 events counted
    assert windowed_total("0 seconds", "wm_strict") == 3
    # watermark = audit max lateness: every event survives
    assert windowed_total(f"{lateness_s} seconds", "wm_sized") == 4


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    from cdc_stream_processor_spark.operators.graph import (
        personalized_pagerank,
    )

    # two disconnected triangles; seed in the first one -> ALL rank mass
    # stays there, the other triangle gets exactly zero
    tri = lambda base: [
        (base, base + 1), (base + 1, base + 2), (base + 2, base),
        (base + 1, base), (base + 2, base + 1), (base, base + 2),
    ]
    edges = spark.createDataFrame(tri(1) + tri(10), "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {
        r["node"]: r for r in personalized_pagerank(edges, seeds).collect()
    }
    assert out[1]["is_seed"] and not out[2]["is_seed"]
    assert out[1]["pr_q"] > out[2]["pr_q"] > 0  # seed holds teleport mass
    for far in (10, 11, 12):
        assert out[far]["pr_q"] == 0


def test_personalized_pagerank_rejects_empty_seeds(spark):
    import pytest as _pytest

    from cdc_stream_processor_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    no_seeds = spark.createDataFrame([], "node long")
    with _pytest.raises(ValueError, match="seeds must be non-empty"):
        personalized_pagerank(edges, no_seeds)


def test_degree_assortativity_star_is_negative(spark):
    from cdc_stream_processor_spark.operators.graph import (
        degree_assortativity,
    )

    # star: hub 1 with 4 leaves -> every edge joins deg 4 with deg 1 ->
    # perfectly disassortative (r = -1)
    star = spark.createDataFrame(
        [(1, i) for i in range(2, 6)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 4
    assert abs(r["assortativity"] - (-1.0)) < 1e-12

    # regular ring: every node deg 2 -> zero variance -> NULL
    ring = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    r2 = degree_assortativity(ring).collect()[0]
    assert r2["assortativity"] is None


def test_community_conductance_hand_computed(spark):
    from cdc_stream_processor_spark.operators.graph import (
        community_conductance,
    )

    # two triangles bridged by one edge; communities = the triangles
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)],
        "src long, dst long",
    )
    comms = spark.createDataFrame(
        [(i, 1 if i <= 3 else 4) for i in range(1, 7)],
        "node long, community long",
    )
    out = {
        r["community"]: r
        for r in community_conductance(edges, comms).collect()
    }
    for c in (1, 4):
        assert out[c]["n_nodes"] == 3
        assert out[c]["internal_edges"] == 3
        assert out[c]["cut_edges"] == 1
        # phi = 1 / (2*3 + 1)
        assert abs(out[c]["conductance"] - 1 / 7) < 1e-12


def test_pagerank_empty_graph_returns_empty(spark):
    """Regression: an empty edge list (or a graph pruned empty upstream,
    e.g. textrank's min_cooc on a tiny corpus) must yield the empty rank
    vector, not a driver-side ZeroDivisionError in the teleport term."""
    from cdc_stream_processor_spark.operators.graph import pagerank
    from cdc_stream_processor_spark.operators.text import textrank_keywords

    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(edges, n_iter=2)
    assert out.columns == ["node", "pr_q", "pagerank"]
    assert out.count() == 0

    # end-to-end: a corpus whose co-occurrence graph prunes empty
    docs = spark.createDataFrame(
        [(1, "hello hello hello"), (2, "")], "doc_id long, text string"
    )
    assert textrank_keywords(docs, min_cooc=3).count() == 0


def test_degenerate_row_guards(spark, tmp_path):
    """Regression battery for the degenerate-row stress audit: empty/short
    texts, zero-weight docs, zero vectors, zero-total groups, and names
    without '#' must not crash their queries under ANSI mode, and each
    guard must carry the DuckDB-parity semantics (float/0 -> NULL)."""
    from pyspark.sql import functions as F

    from cdc_stream_processor_spark.operators import corpus as C
    from cdc_stream_processor_spark.operators import similarity as S
    from cdc_stream_processor_spark.operators.text import bigram_lift_topk

    # bigram_lift_topk: sub-2-token docs contribute unigrams only
    docs = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, None), (4, "b c b c")],
        "doc_id long, text string",
    )
    lifts = {
        (r.w1, r.w2) for r in bigram_lift_topk(docs, min_count=1).collect()
    }
    assert ("b", "c") in lifts

    # fold cosine: zero-norm side -> NULL (DuckDB semantics), not a crash
    pair = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = pair.select(S.cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert got[0].c is None and got[1].c == 1.0

    # weighted_sample: zero-weight rows are excluded, never a crash
    wdocs = spark.createDataFrame(
        [(1, 0), (2, 10), (3, 5)], "doc_id long, n_chars long"
    )
    ids = {
        r.doc_id for r in C.weighted_priority_sample(wdocs, k=5).collect()
    }
    assert ids == {2, 3}

    # cdc_sim name split: a c_name without '#' enriches with empty last name
    from cdc_stream_processor_spark.sources import cdc_sim

    cust = spark.createDataFrame(
        [(1, "NoHash", 0, 1.0, "B"), (2, "Customer#42", 0, 2.0, "B")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    env = cdc_sim.customers_envelopes_from_customers(cust)
    names = {
        r.customer_id: (r.first_name, r.last_name)
        for r in env.select(
            F.col("after.CUSTOMER_ID").cast("long").alias("customer_id"),
            F.col("after.FIRST_NAME").alias("first_name"),
            F.col("after.LAST_NAME").alias("last_name"),
        ).collect()
    }
    assert names[1] == ("NoHash", "") and names[2] == ("Customer", "42")

    # embedding_dim: an empty leading vector must not mask a fixed-dim table
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path / "embeddings.parquet"
    pq.write_table(
        pa.table(
            {"vec_id": [1, 2], "embedding": [[], [1.0, 2.0, 3.0]]},
            schema=pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
            ),
        ),
        str(p),
    )
    from cdc_stream_processor_spark.sources.batch import embedding_dim

    assert embedding_dim(str(tmp_path)) == 3


# --- r11 ADVICE parity batteries ----------------------------------------------


def _write_embeddings(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    vec_ids, embs, labels = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "vec_id": list(vec_ids),
                "embedding": list(embs),
                "label": list(labels),
            },
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32()),
                ]
            ),
        ),
        str(tmp_path / "embeddings.parquet"),
    )


def test_embedding_outliers_zero_vector_parity(spark, tmp_path):
    """A zero-norm vector's centroid_sim is NULL (r10 fold-cosine guard).
    Spark's plain asc() is NULLS FIRST; the DuckDB oracle's ASC default is
    NULLS LAST — pre-r11 the zero vector ranked FIRST in Spark and LAST in
    the oracle, silently diverging top-k membership. With asc_nulls_last
    both engines must exclude it from the top-5 of a 6-member label and
    agree on every (label, vec_id, rank)."""
    import math

    import duckdb

    import __spark_entry__ as E

    # label 0: five distinct non-zero vectors + ONE zero vector
    rows = [(i, [float(i + 1), float(2 * i + 1)], 0) for i in range(5)]
    rows.append((5, [0.0, 0.0], 0))
    _write_embeddings(tmp_path, rows)

    got = {
        (r.label, r.vec_id, r.rank): r.centroid_sim
        for r in E.queries()["embedding_outliers"](
            spark, str(tmp_path)
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    want = {
        (lab, vid, rank): sim
        for lab, vid, sim, rank in con.sql(
            E.oracle_sql()["embedding_outliers"]
        ).fetchall()
    }
    assert set(got) == set(want)
    for key, sim in want.items():
        if sim is None:
            assert got[key] is None
        else:
            assert got[key] is not None
            assert math.isclose(got[key], sim, abs_tol=1e-9)
    # the zero vector is OUT of the top-5 in both engines
    assert not any(vid == 5 for (_, vid, _) in got)


def test_rp_project_degenerate(spark):
    """NULL and empty embeddings both project to the all-zero vector in
    BOTH engines: Spark's otherwise(0.0) catches NULL v (size(NULL) > 0 is
    NULL), and the DuckDB twin's list_prepend(0.0, NULL) yields [0.0] so
    list_reduce returns the 0.0 seed (probed r11 — the twin does NOT
    propagate NULL). A normal row must agree elementwise across engines."""
    import duckdb

    from cdc_stream_processor_spark.operators import similarity as S
    from cdc_stream_processor_spark.queries_extensions import (
        _rp_project_sql,
    )

    vecs = spark.createDataFrame(
        [(1, [0.5, -1.25, 2.0]), (2, []), (3, None)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.proj
        for r in S.rp_project(vecs, id_col="vec_id").collect()
    }
    assert got[2] == [0.0] * S.RP_DIMS
    assert got[3] == [0.0] * S.RP_DIMS

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(1, [0.5::FLOAT, -1.25::FLOAT, 2.0::FLOAT]), "
        "(2, []::FLOAT[]), (3, NULL::FLOAT[])) t(vec_id, embedding)"
    )
    for vid, *ps in con.sql(
        _rp_project_sql() + " ORDER BY vec_id"
    ).fetchall():
        assert len(ps) == S.RP_DIMS
        for j, p in enumerate(ps):
            assert p is not None, (vid, j)
            assert abs(got[vid][j] - p) < 1e-9, (vid, j)


def test_shingles_sql_null_parity(spark):
    """shingles() and SHINGLES_SQL agree on the COLUMN VALUES — not just
    explode-equivalence — for NULL, sub-k-token, and normal text: both
    yield the EMPTY array for NULL/short docs (DuckDB's greatest() ignores
    NULL arguments, so the twin never propagates the NULL token list)."""
    import duckdb

    from cdc_stream_processor_spark.functions import texthash as TH

    texts = [(1, None), (2, "alpha beta"), (3, "alpha beta gamma delta")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: sorted(r.s)
        for r in docs.select(
            "doc_id", TH.shingles(F.col("text"), 3).alias("s")
        ).collect()
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW docs AS SELECT * FROM (VALUES "
        "(1, NULL::VARCHAR), (2, 'alpha beta'), "
        "(3, 'alpha beta gamma delta')) t(doc_id, text)"
    )
    toks = TH.TOKENS_SQL.format(text="text")
    want = {
        did: sorted(s)
        for did, s in con.sql(
            f"SELECT doc_id, {TH.SHINGLES_SQL('t', 3)} AS s "
            f"FROM (SELECT doc_id, {toks} AS t FROM docs)"
        ).fetchall()
    }
    assert got == want
    assert got[1] == [] and got[2] == []
    assert got[3] == ["alpha beta gamma", "beta gamma delta"]
