"""Operator-quality tests (SURVEY.md §5.4/§5.5) — the assertions the
oracle can't express: sketch error bounds, LSH recall vs exact ground
truth, as-of edge semantics, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"
SF_TINY = "/root/testdata/sf0.001"


class TestMinHashLSH:
    def test_lsh_matches_exact_ground_truth(self, spark):
        """LSH(threshold .8) must find exactly the exact-Jaccard pairs —
        verification keeps precision at 1.0; banding (r=3,b=8) keeps
        recall ≈1.0 at j≥0.8."""
        from fact_hive_custom_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs
        from fact_hive_custom_spark.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        exact = {(r.doc_a, r.doc_b) for r in jaccard_pairs(docs, 0.8).collect()}
        lsh = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, 0.8).collect()}
        assert exact, "fixture should contain seeded near-duplicates"
        assert lsh == exact

    def test_simhash_separates_dups_from_random_pairs(self, spark):
        from fact_hive_custom_spark.operators.dedup import jaccard_pairs, simhash_64
        from fact_hive_custom_spark.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        fp = {r.doc_id: r.simhash for r in simhash_64(docs).collect()}
        dup_pairs = [(r.doc_a, r.doc_b) for r in jaccard_pairs(docs, 0.8).collect()]

        def hamming(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        dup_d = [hamming(fp[a], fp[b]) for a, b in dup_pairs]
        ids = sorted(fp)[:40]
        rand_d = [hamming(fp[a], fp[b]) for a in ids[:20] for b in ids[20:40]]
        # The fixture vocabulary is tiny (~40 shared words) so even random
        # pairs are token-wise similar — the margin, not the absolute
        # distance, is the signal.
        assert max(dup_d) < 12, f"near-dups should be close in simhash space: {dup_d}"
        mean_rand = sum(rand_d) / len(rand_d)
        mean_dup = sum(dup_d) / len(dup_d)
        assert mean_rand > mean_dup + 8, f"dup/random separation too small: {mean_dup} vs {mean_rand}"


class TestSimilarity:
    def test_signlsh_recall_vs_exact(self, spark):
        """Sign-LSH top-5 must recover most exact top-5 neighbors."""
        from fact_hive_custom_spark.operators.similarity import cosine_topk, signlsh_topk
        from fact_hive_custom_spark.tables import load_table

        emb = load_table(spark, SF_TINY, "embeddings")
        probes = emb.filter(F.col("vec_id") < 10)
        exact = {(r.probe_id, r.neighbor_id) for r in cosine_topk(probes, emb, k=5).collect()}
        # Fixture embeddings are near-random (top-5 cosine ≈ 0.3 → θ/π ≈ 0.4):
        # few planes, many tables is the right operating point.
        approx = {
            (r.probe_id, r.neighbor_id)
            for r in signlsh_topk(probes, emb, k=5, num_planes=4, num_tables=8).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5, f"sign-LSH recall too low: {recall}"

    def test_ivf_recall_vs_exact_and_graceful_degradation(self, spark):
        """IVF top-5: decent recall at nprobe=4/16, and EXACT results
        when probing every cluster (nprobe == num_pivots ⇒ the candidate
        set is the whole corpus — brute force with extra steps)."""
        from fact_hive_custom_spark.operators.similarity import cosine_topk, ivf_topk
        from fact_hive_custom_spark.tables import load_table

        emb = load_table(spark, SF_TINY, "embeddings")
        probes = emb.filter(F.col("vec_id") < 10)
        exact = {(r.probe_id, r.neighbor_id) for r in cosine_topk(probes, emb, k=5).collect()}

        approx = {
            (r.probe_id, r.neighbor_id)
            for r in ivf_topk(probes, emb, k=5, num_pivots=16, nprobe=4).collect()
        }
        recall = len(exact & approx) / len(exact)
        # near-random fixture embeddings are the IVF worst case (clusters
        # carry little signal) — still must beat the nprobe/num_pivots=25%
        # random-candidate floor by a wide margin
        assert recall >= 0.4, f"IVF recall too low: {recall}"

        full = {
            (r.probe_id, r.neighbor_id)
            for r in ivf_topk(probes, emb, k=5, num_pivots=16, nprobe=16).collect()
        }
        assert full == exact, "nprobe=num_pivots must equal exact brute force"

    def test_ivf_refined_codebook_still_valid_index(self, spark):
        """refine_rounds>0 (spherical-k-means pivot training) must keep
        every index invariant: k results per probe, results drawn from
        real corpus ids, and nprobe=num_pivots still EXACTLY equals
        brute force (training moves cluster boundaries, never drops
        candidates when every cluster is probed). Recall itself is a
        data property — measured, not asserted, in ANN_RECALL.md."""
        from fact_hive_custom_spark.operators.similarity import cosine_topk, ivf_topk
        from fact_hive_custom_spark.tables import load_table

        emb = load_table(spark, SF_TINY, "embeddings")
        probes = emb.filter(F.col("vec_id") < 10)
        exact = {(r.probe_id, r.neighbor_id) for r in cosine_topk(probes, emb, k=5).collect()}

        rows = ivf_topk(
            probes, emb, k=5, num_pivots=16, nprobe=4, refine_rounds=2
        ).collect()
        per_probe: dict = {}
        for r in rows:
            per_probe.setdefault(r.probe_id, set()).add(r.neighbor_id)
        assert all(len(v) == 5 for v in per_probe.values()), per_probe
        assert len(per_probe) == 10

        full = {
            (r.probe_id, r.neighbor_id)
            for r in ivf_topk(
                probes, emb, k=5, num_pivots=16, nprobe=16, refine_rounds=2
            ).collect()
        }
        assert full == exact, "refined nprobe=num_pivots must stay exact"

    def test_cosine_self_similarity_is_one(self, spark):
        from fact_hive_custom_spark.operators.similarity import cosine

        df = spark.createDataFrame([Row(v=[1.0, 2.0, 3.0])])
        val = df.select(F.round(cosine(F.col("v"), F.col("v")), 9).alias("c")).collect()[0].c
        assert val == 1.0


class TestAsof:
    def test_strict_excludes_same_instant(self, spark):
        from fact_hive_custom_spark.operators.asof import asof_join_backward

        left = spark.createDataFrame(
            [Row(k="u", ts=10, event_id=100), Row(k="u", ts=20, event_id=101)]
        ).select("k", "ts", "event_id")
        right = spark.createDataFrame(
            [Row(k="u", ts=10, event_id=1, val="same-instant"), Row(k="u", ts=15, event_id=2, val="between")]
        ).select("k", "ts", "event_id", "val")

        strict = {
            r.event_id: r.asof_val
            for r in asof_join_backward(
                left, right, by=["k"], ts="ts", tiebreak="event_id", carry=["val"], strict=True
            ).collect()
        }
        # at ts=10 the same-instant right row must NOT be visible
        assert strict[100] is None
        assert strict[101] == "between"

        inclusive = {
            r.event_id: r.asof_val
            for r in asof_join_backward(
                left, right, by=["k"], ts="ts", tiebreak="event_id", carry=["val"], strict=False
            ).collect()
        }
        assert inclusive[100] == "same-instant"

    def test_no_preceding_right_row_yields_null(self, spark):
        from fact_hive_custom_spark.operators.asof import asof_join_backward

        left = spark.createDataFrame([Row(k="u", ts=5, event_id=100)])
        right = spark.createDataFrame([Row(k="u", ts=9, event_id=1, val="later")])
        out = asof_join_backward(
            left, right, by=["k"], ts="ts", tiebreak="event_id", carry=["val"], strict=True
        ).collect()
        assert out[0].asof_val is None

    def test_forward_same_instant_and_no_follower(self, spark):
        from fact_hive_custom_spark.operators.asof import asof_join_forward

        left = spark.createDataFrame(
            [Row(k="u", ts=10, event_id=100), Row(k="u", ts=30, event_id=101)]
        ).select("k", "ts", "event_id")
        right = spark.createDataFrame(
            [Row(k="u", ts=10, event_id=1, val="same-instant"), Row(k="u", ts=20, event_id=2, val="after")]
        ).select("k", "ts", "event_id", "val")

        strict = {
            r.event_id: r.asof_val
            for r in asof_join_forward(
                left, right, by=["k"], ts="ts", tiebreak="event_id", carry=["val"], strict=True
            ).collect()
        }
        # ts=10: same-instant excluded, next is ts=20; ts=30: no follower
        assert strict[100] == "after"
        assert strict[101] is None

        inclusive = {
            r.event_id: r.asof_val
            for r in asof_join_forward(
                left, right, by=["k"], ts="ts", tiebreak="event_id", carry=["val"], strict=False
            ).collect()
        }
        assert inclusive[100] == "same-instant"

    def test_forward_equal_ts_takes_smallest_tiebreak(self, spark):
        from fact_hive_custom_spark.operators.asof import asof_join_forward

        left = spark.createDataFrame([Row(k="u", ts=5, event_id=100)])
        right = spark.createDataFrame(
            [Row(k="u", ts=9, event_id=2, val="b"), Row(k="u", ts=9, event_id=1, val="a")]
        )
        out = asof_join_forward(
            left, right, by=["k"], ts="ts", tiebreak="event_id", carry=["val"], strict=True
        ).collect()
        assert out[0].asof_val == "a"

    def test_nearest_picks_closer_side_and_ties_backward(self, spark):
        from fact_hive_custom_spark.operators.asof import asof_join_nearest

        left = spark.createDataFrame(
            [
                Row(k="u", ts=10, event_id=100),  # back at 7 (d=3), fwd at 11 (d=1) → fwd
                Row(k="u", ts=20, event_id=101),  # back at 17 (d=3), fwd at 23 (d=3) → tie → back
                Row(k="u", ts=40, event_id=102),  # only back exists (d=17)
            ]
        ).select("k", "ts", "event_id")
        right = spark.createDataFrame(
            [
                Row(k="u", ts=7, event_id=1, val="b7"),
                Row(k="u", ts=11, event_id=2, val="f11"),
                Row(k="u", ts=17, event_id=3, val="b17"),
                Row(k="u", ts=23, event_id=4, val="f23"),
            ]
        ).select("k", "ts", "event_id", "val")
        got = {
            r.event_id: r.asof_val
            for r in asof_join_nearest(
                left, right, by=["k"], ts="ts", tiebreak="event_id", carry=["val"]
            ).collect()
        }
        assert got == {100: "f11", 101: "b17", 102: "f23"}

    def test_nearest_no_right_rows_yields_null(self, spark):
        from fact_hive_custom_spark.operators.asof import asof_join_nearest

        left = spark.createDataFrame([Row(k="u", ts=5, event_id=100)])
        right = spark.createDataFrame([Row(k="z", ts=9, event_id=1, val="other-key")])
        out = asof_join_nearest(
            left, right, by=["k"], ts="ts", tiebreak="event_id", carry=["val"]
        ).collect()
        assert out[0].asof_val is None


class TestSketches:
    def test_hll_error_bound(self, spark):
        from fact_hive_custom_spark.tables import load_table

        e = load_table(spark, SF_DIR, "events")
        approx = {
            r.event_type: r.n
            for r in e.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", 0.01).alias("n"))
            .collect()
        }
        exact = {
            r.event_type: r.n
            for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
        }
        for k in exact:
            assert abs(approx[k] - exact[k]) / exact[k] < 0.05

    def test_approx_percentile_bound(self, spark):
        from fact_hive_custom_spark.tables import load_table

        o = load_table(spark, SF_DIR, "orders")
        approx = o.agg(
            F.approx_percentile("o_totalprice", F.lit(0.95), F.lit(10000)).alias("p")
        ).collect()[0].p
        exact = o.agg(F.percentile("o_totalprice", F.lit(0.95)).alias("p")).collect()[0].p
        assert abs(approx - exact) / exact < 0.02


class TestMultimodal:
    def _media(self, spark):
        from fact_hive_custom_spark.operators.multimodal import MEDIA_SCHEMA

        rows = [
            (1, "image", b"\x89PNG-fake-bytes", "image/png", 64, 64, None),
            (2, "image", b"", "image/png", 0, 0, None),
            (3, "audio", b"RIFF-fake", "audio/wav", None, None, 2500),
            (4, "video", b"mp4-fake", "video/mp4", 320, 240, 3500),
            (5, "image", None, "image/png", None, None, None),
        ]
        return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    def test_feature_extraction_schema_and_determinism(self, spark):
        from fact_hive_custom_spark.operators.multimodal import extract_features

        out1 = extract_features(self._media(spark)).orderBy("media_id").collect()
        out2 = extract_features(self._media(spark)).orderBy("media_id").collect()
        assert [r.asDict() for r in out1] == [r.asDict() for r in out2]
        assert out1[0].n_bytes == 15 and len(out1[0].feature) == 8
        assert out1[4].feature == []  # null payload
        # identical payloads share a hash (media exact-dedup key)
        assert out1[0].payload_hash != out1[2].payload_hash

    def test_injected_decoder_is_used(self, spark):
        """The decode seam: a custom callable replaces the stub without
        touching the operator body."""
        from fact_hive_custom_spark.operators.multimodal import extract_features

        # nested function: cloudpickle ships it by VALUE, like a real
        # injected decoder defined in user code would be
        def len_decoder(payload):
            return [] if payload is None else [float(len(payload))]

        out = (
            extract_features(self._media(spark), decode=len_decoder)
            .orderBy("media_id")
            .collect()
        )
        assert out[0].feature == [15.0]
        assert out[4].feature == []  # null payload handled by the decoder

    def test_frame_sampling(self, spark):
        from fact_hive_custom_spark.operators.multimodal import sample_frames

        frames = sample_frames(self._media(spark), every_ms=1000).collect()
        assert [f.frame_ms for f in frames] == [0, 1000, 2000, 3000]


class TestPythonDataSource:
    def test_partitioned_read_parallelism(self, spark):
        """The custom source must expose its splits to the scheduler:
        8 requested InputPartitions -> 8 RDD partitions, all non-empty,
        and the union of strides covers every row exactly once."""
        from fact_hive_custom_spark.sources.python_datasource import (
            SyntheticEventsDataSource,
        )

        spark.dataSource.register(SyntheticEventsDataSource)
        df = (
            spark.read.format("fhcs_synthetic")
            .option("n", 1000)
            .option("partitions", 8)
            .load()
        )
        assert df.rdd.getNumPartitions() == 8
        sizes = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
        assert len(sizes) == 8 and all(s == 125 for s in sizes)
        ids = [r.id for r in df.collect()]
        assert sorted(ids) == list(range(1000))


class TestMerge:
    def test_upsert_updates_win_and_rest_survive(self, spark):
        from fact_hive_custom_spark.operators.merge import upsert

        target = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], schema="k long, v string"
        )
        updates = spark.createDataFrame([(2, "B!"), (4, "d")], schema="k long, v string")
        got = {r.k: r.v for r in upsert(target, updates, key=["k"]).collect()}
        assert got == {1: "a", 2: "B!", 3: "c", 4: "d"}

    def test_scd2_closes_current_and_appends(self, spark):
        from fact_hive_custom_spark.operators.merge import scd2_close

        target = spark.createDataFrame(
            [(1, "v1", 1, False), (1, "v2", 2, True), (2, "x1", 1, True)],
            schema="k long, v string, version int, is_current boolean",
        )
        updates = spark.createDataFrame([(1, "v3", 3)], schema="k long, v string, version int")
        rows = scd2_close(target, updates, key=["k"], version_col="version").collect()
        by_kv = {(r.k, r.version): r.is_current for r in rows}
        assert len(rows) == 4  # full history kept
        assert by_kv[(1, 1)] is False and by_kv[(1, 2)] is False  # closed
        assert by_kv[(1, 3)] is True  # new current
        assert by_kv[(2, 1)] is True  # untouched key stays current


class TestBucketedJoin:
    def test_bucketed_tables_join_without_shuffle(self, spark):
        """The SCALING.md claim, demonstrated: two tables bucketed on the
        join key sort-merge-join with NO Exchange on either side."""
        from fact_hive_custom_spark.tables import load_table

        o = load_table(spark, SF_TINY, "orders")
        c = load_table(spark, SF_TINY, "customer")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
        import shutil
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        for t in ("b_orders", "b_customer"):
            shutil.rmtree(f"{warehouse.removeprefix('file:')}/{t}", ignore_errors=True)
        o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable("b_orders")
        c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode("overwrite").saveAsTable("b_customer")

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.sql(
                """SELECT o.o_orderkey, c.c_name FROM b_orders o
                   JOIN b_customer c ON o.o_custkey = c.c_custkey"""
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, "bucketed join must not shuffle"
            assert joined.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


class TestSampling:
    def test_seeded_sample_fraction_and_determinism(self, spark):
        from fact_hive_custom_spark.tables import load_table

        li = load_table(spark, SF_DIR, "lineitem")
        a = li.sample(fraction=0.1, seed=42).count()
        b = li.sample(fraction=0.1, seed=42).count()
        assert a == b, "fixed seed + fixed layout must be deterministic"
        assert 0.07 < a / li.count() < 0.13, f"~10% expected, got {a}"


class TestSkewOperators:
    def _skewed(self, spark):
        # 90% of rows share key=1 (the hot key), the rest spread over 2-10
        rows = [(1, i) for i in range(900)] + [(k, i) for k in range(2, 11) for i in range(10)]
        return spark.createDataFrame(rows, schema="k long, v long")

    def test_salted_join_equals_plain_join(self, spark):
        from fact_hive_custom_spark.operators.skew import salted_join

        big = self._skewed(spark)
        dim = spark.createDataFrame([(k, f"name{k}") for k in range(1, 11)], schema="k long, name string")
        plain = sorted(map(tuple, big.join(dim, ["k"]).collect()))
        salted = sorted(map(tuple, salted_join(big, dim, on=["k"], salt=8).collect()))
        assert salted == plain

    def test_salted_join_spreads_hot_key(self, spark):
        from fact_hive_custom_spark.operators.skew import _salt_col
        from pyspark.sql import functions as F

        big = self._skewed(spark)
        salts = (
            big.filter(F.col("k") == 1)
            .withColumn("s", _salt_col(big, 8, ["v"]))
            .select("s").distinct().count()
        )
        assert salts == 8, "hot key must spread over all salt buckets"

    def test_salted_aggregate_equals_plain(self, spark):
        from fact_hive_custom_spark.operators.skew import salted_aggregate
        from pyspark.sql import functions as F

        df = self._skewed(spark)
        plain = {
            (r.k): (r.s, r.n, r.mx)
            for r in df.groupBy("k").agg(
                F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx")
            ).collect()
        }
        salted = {
            (r.k): (r.s, r.n, r.mx)
            for r in salted_aggregate(
                df, key=["k"], salt=8, s=("v", "sum"), n=("v", "count"), mx=("v", "max")
            ).collect()
        }
        assert salted == plain

    def test_salted_aggregate_rejects_non_algebraic(self, spark):
        from fact_hive_custom_spark.operators.skew import salted_aggregate
        import pytest as pt

        with pt.raises(ValueError, match="non-algebraic"):
            salted_aggregate(self._skewed(spark), key=["k"], m=("v", "median"))


class TestRound2Hardening:
    """Round-2 fixes: hot-shingle cap, exact pivot-blocked cosine pairs,
    salted-join how restriction, SCD2 version semantics."""

    def test_jaccard_hot_shingle_cap_leaves_fixture_unchanged(self, spark):
        from fact_hive_custom_spark.operators.dedup import jaccard_pairs
        from fact_hive_custom_spark.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        capped = sorted(map(tuple, jaccard_pairs(docs, 0.8, max_doc_freq=1000).collect()))
        uncapped = sorted(map(tuple, jaccard_pairs(docs, 0.8, max_doc_freq=None).collect()))
        assert capped == uncapped and capped

    def test_jaccard_hot_shingle_cap_bounds_adversarial_join(self, spark):
        """Every doc shares one stop-phrase shingle: uncapped, the shingle
        self-join is O(n²); capped, the hot shingle drops out and only the
        genuinely-similar pair survives."""
        from fact_hive_custom_spark.operators.dedup import jaccard_pairs, shingles

        n = 60
        hot = "the quick fox"  # one 3-shingle shared by ALL docs
        rows = [(i, f"{hot} unique{i} word{i} tail{i}") for i in range(n)]
        rows.append((n, f"{hot} unique0 word0 tail0"))  # true near-dup of doc 0
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        sh = shingles(docs, k=3)
        hot_df = (
            sh.groupBy("shingle").count().filter(F.col("count") > 10).count()
        )
        assert hot_df >= 1  # the adversarial shingle is genuinely hot

        pairs = jaccard_pairs(docs, threshold=0.5, max_doc_freq=10).collect()
        got = {(r.doc_a, r.doc_b) for r in pairs}
        assert got == {(0, n)}
        # And the capped intersection join cannot have touched the hot
        # shingle: every doc has 4 shingles, 1 hot → ≤ 3 cold shingles,
        # doc 0 and doc n share all 3 → jaccard 1.0 on the capped space.
        j = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
        assert j[(0, n)] == 1.0

    def test_cosine_pairs_equals_bruteforce_on_fixture(self, spark):
        from fact_hive_custom_spark.operators.similarity import cosine_pairs
        from fact_hive_custom_spark.functions.vectors import cosine
        from fact_hive_custom_spark.tables import load_table

        emb = load_table(spark, SF_TINY, "embeddings")
        got = sorted(map(tuple, cosine_pairs(emb, 0.5).collect()))
        a, b = emb.alias("a"), emb.alias("b")
        brute = (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cosine"),
            )
            .filter(F.col("cosine") >= 0.5)
            .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
        )
        assert got == sorted(map(tuple, brute.collect()))

    def test_cosine_pairs_prunes_clustered_corpus(self, spark):
        """Two tight antipodal clusters: the angular triangle-inequality
        bound must eliminate cross-cluster blocks entirely."""
        import math

        from fact_hive_custom_spark.operators.similarity import _pivot_blocks, cosine_pairs

        dim = 8
        rows = []
        for i in range(40):
            eps = 0.01 * (i % 5)
            up = [1.0 + eps] + [eps] * (dim - 1)
            down = [-1.0 - eps] + [eps] * (dim - 1)
            rows.append((2 * i, up))
            rows.append((2 * i + 1, down))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        assigned, cluster_pairs = _pivot_blocks(
            emb, threshold=0.9, id_col="vec_id", vec_col="embedding", num_pivots=4, seed=7
        )
        kept = cluster_pairs.count()
        clusters = [r.cluster for r in assigned.select("cluster").distinct().collect()]
        total = len(clusters) ** 2
        assert kept < total, f"no pruning: kept {kept} of {total} cluster pairs"

        # Exactness survives the pruning: every within-cluster pair is
        # found (cos ≈ 1 inside a cluster), none across (cos ≈ -1).
        out = cosine_pairs(emb, 0.9, num_pivots=4).collect()
        assert len(out) == 2 * (40 * 39) // 2
        assert all((r.vec_a % 2) == (r.vec_b % 2) for r in out)

    def test_salted_join_rejects_small_side_preserving_types(self, spark):
        from fact_hive_custom_spark.operators.skew import salted_join

        big = spark.createDataFrame([(1, "x")], "k long, v string")
        dim = spark.createDataFrame([(1, "d")], "k long, d string")
        for how in ("right", "full", "full_outer", "rightouter"):
            with pytest.raises(ValueError):
                salted_join(big, dim, on=["k"], how=how)

    def test_salted_join_left_preserves_unmatched_skewed_rows(self, spark):
        from fact_hive_custom_spark.operators.skew import salted_join

        big = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c"), (9, "no-match")], "k long, v string"
        )
        dim = spark.createDataFrame([(1, "d1"), (2, "d2")], "k long, d string")
        plain = sorted(map(tuple, big.join(dim, ["k"], "left").collect()))
        salted = sorted(map(tuple, salted_join(big, dim, on=["k"], salt=4, how="left").collect()))
        assert salted == plain

    def test_scd2_stale_update_is_dropped(self, spark):
        from fact_hive_custom_spark.operators.merge import scd2_close

        target = spark.createDataFrame(
            [(1, "v2", 2, True)], "k long, v string, version int, is_current boolean"
        )
        stale = spark.createDataFrame([(1, "old", 1)], "k long, v string, version int")
        rows = scd2_close(target, stale, key=["k"], version_col="version").collect()
        assert len(rows) == 1
        assert rows[0].version == 2 and rows[0].is_current

    def test_scd2_latest_of_batch_wins_and_end_version_stamped(self, spark):
        from fact_hive_custom_spark.operators.merge import scd2_close

        target = spark.createDataFrame(
            [(1, "v1", 1, True)], "k long, v string, version int, is_current boolean"
        )
        updates = spark.createDataFrame(
            [(1, "v2", 2), (1, "v3", 3)], "k long, v string, version int"
        )
        rows = scd2_close(
            target, updates, key=["k"], version_col="version", end_version_col="end_version"
        ).collect()
        by_v = {r.version: r for r in rows}
        assert set(by_v) == {1, 3}  # v2 superseded within the batch
        assert by_v[1].is_current is False and by_v[1].end_version == 3
        assert by_v[3].is_current is True and by_v[3].end_version is None

    def test_scd2_two_batch_history_end_versions_survive(self, spark):
        """Chained applies: batch 2 must NOT wipe the end_version stamps
        batch 1 wrote onto now-history rows (round-2 advice item)."""
        from fact_hive_custom_spark.operators.merge import scd2_close

        target = spark.createDataFrame(
            [(1, "v1", 1, True), (2, "x1", 1, True)],
            "k long, v string, version int, is_current boolean",
        )
        batch1 = spark.createDataFrame([(1, "v2", 2)], "k long, v string, version int")
        after1 = scd2_close(
            target, batch1, key=["k"], version_col="version", end_version_col="end_version"
        )
        batch2 = spark.createDataFrame([(1, "v3", 3)], "k long, v string, version int")
        after2 = scd2_close(
            after1, batch2, key=["k"], version_col="version", end_version_col="end_version"
        ).collect()
        by_kv = {(r.k, r.version): r for r in after2}
        assert len(after2) == 4
        # batch-1 stamp survives on the history row
        assert by_kv[(1, 1)].end_version == 2 and by_kv[(1, 1)].is_current is False
        # batch-2 closes v2 with the superseding version
        assert by_kv[(1, 2)].end_version == 3 and by_kv[(1, 2)].is_current is False
        # new current row open-ended; untouched key unchanged
        assert by_kv[(1, 3)].end_version is None and by_kv[(1, 3)].is_current is True
        assert by_kv[(2, 1)].end_version is None and by_kv[(2, 1)].is_current is True


class TestConnectedComponentsScale:
    def test_long_chain_converges_logarithmically(self, spark):
        """A 16384-node path graph is the worst case for naive label
        propagation (diameter = n); large-star/small-star must still
        converge inside the default max_iter=25 ≈ O(log n) bound and
        label every node with the chain's minimum."""
        from fact_hive_custom_spark.operators.graph import connected_components

        n = 16384
        edges = spark.range(n - 1).selectExpr("id AS a", "id + 1 AS b")
        cc = connected_components(edges, "a", "b")
        comps = cc.selectExpr("count(*) AS nodes", "count(distinct component) AS comps",
                              "max(component) AS mx").collect()[0]
        assert comps.nodes == n
        assert comps.comps == 1
        assert comps.mx == 0


class TestChunkingInvariants:
    def test_chunks_tile_every_document_exactly(self, spark):
        """Independent semantic check (the DuckDB oracle shares the
        formulation, so it can't catch a shared spec bug): chunk starts
        are 0, 15, 30, ... per doc, the last chunk ends exactly at the
        doc's token count, and consecutive chunks overlap by
        window - stride tokens."""
        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.tables import load_table

        chunks = QUERIES["q_llm_chunk_docs"](spark, SF_DIR)
        per_doc = (
            chunks.withColumn("start", F.col("chunk_id") * 15)
            .groupBy("doc_id")
            .agg(
                F.min("chunk_id").alias("first_id"),
                F.max("chunk_id").alias("last_id"),
                F.count(F.lit(1)).alias("n_chunks"),
                F.max(F.col("start") + F.col("chunk_tokens")).alias("covered_to"),
            )
        )
        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        )
        j = per_doc.join(docs, "doc_id")
        bad = j.filter(
            (F.col("first_id") != 0)
            | (F.col("covered_to") != F.col("n_tokens"))
            | (F.col("last_id") != F.col("n_chunks") - 1)
            | (F.col("n_chunks") != F.floor((F.col("n_tokens") - 1) / 15) + 1)
        )
        assert bad.count() == 0, bad.limit(5).collect()


class TestRound5Properties:
    """Behavioral invariants of the round-5 operators, beyond oracle
    parity: bijective Z-order locality, PageRank mass bounds, weighted
    median against a brute-force reference, survivor policy."""

    @pytest.fixture(autouse=True)
    def _registry(self):
        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.tables import load_table

        global QUERIES_R5, load_table_r5
        QUERIES_R5 = QUERIES
        load_table_r5 = load_table

    def test_zorder_key_is_bijective_and_local(self, spark):
        rows = QUERIES_R5["q_zorder_key"](spark, SF_DIR).collect()
        # 4+4 bits → every (dx,dy) cell maps to exactly ONE z bucket,
        # so each bucket's min==max in BOTH dims (perfect locality)
        # and all 256 cells appear on a fixture with full key coverage.
        assert len(rows) == 256
        seen = set()
        for r in rows:
            assert r["min_dx"] == r["max_dx"] and r["min_dy"] == r["max_dy"], r
            cell = (r["min_dx"], r["min_dy"])
            assert cell not in seen, f"two z buckets map to {cell}"
            seen.add(cell)

    def test_pagerank_mass_bounds(self, spark):
        rows = QUERIES_R5["q_graph_pagerank"](spark, SF_DIR).collect()
        n = len(rows)
        scale = 1_000_000
        for r in rows:
            # every node keeps at least the teleport mass; no node can
            # exceed the whole graph's mass
            assert 150_000 <= r["rank_ppm"] <= n * scale, r
        # total mass ≤ n·SCALE (dangling/rounding only ever LEAK mass)
        assert sum(r["rank_ppm"] for r in rows) <= n * scale

    def test_weighted_median_matches_bruteforce(self, spark):
        import collections

        rows = QUERIES_R5["q_agg_weighted_median"](spark, SF_DIR).collect()
        li = (
            load_table_r5(spark, SF_DIR, "lineitem")
            .selectExpr(
                "l_returnflag AS flag",
                "CAST(round(l_extendedprice * 100) AS BIGINT) AS px",
                "CAST(round(l_quantity) AS BIGINT) AS q",
            )
            .collect()
        )
        acc: dict[str, collections.Counter] = {}
        for r in li:
            acc.setdefault(r["flag"], collections.Counter())[r["px"]] += r["q"]
        for out in rows:
            weights = acc[out["flag"]]
            tot = sum(weights.values())
            cum = 0
            expect = None
            for px in sorted(weights):
                cum += weights[px]
                if 2 * cum >= tot:
                    expect = px
                    break
            assert out["wmedian_cents"] == expect, (out, expect)

    def test_survivor_has_max_content(self, spark):
        surv = QUERIES_R5["q_llm_dedup_survivor"](spark, SF_DIR)
        docs = load_table_r5(spark, SF_DIR, "documents").select(
            "doc_id", "n_chars"
        )
        joined = (
            surv.join(
                docs.withColumnsRenamed(
                    {"doc_id": "s_id", "n_chars": "s_chars"}
                ),
                surv["survivor_id"] == F.col("s_id"),
            )
            .join(docs, "doc_id")
            .collect()
        )
        assert joined, "fixture should contain fingerprint clusters"
        for r in joined:
            # survivor never has less content than the doc it replaces;
            # equal content ⇒ survivor has the smaller id
            assert (r["s_chars"], -r["s_id"]) >= (r["n_chars"], -r["doc_id"]), r
            assert r["survivor_id"] != r["doc_id"]


class TestCompaction:
    def test_compacted_file_count_bounded(self, spark, tmp_path):
        """q_sink_compact must leave ≤4 data files (plus metadata) in
        its compacted directory — verified by re-running the staging
        steps it performs."""
        import glob
        import os

        from fact_hive_custom_spark.sources.io import stage_dir
        from fact_hive_custom_spark.tables import load_table as lt

        e = lt(spark, SF_DIR, "events")
        frag = str(tmp_path / "frag")
        e.repartition(64).write.mode("overwrite").parquet(frag)
        n_frag = len(glob.glob(os.path.join(frag, "part-*.parquet")))
        out = str(tmp_path / "compacted")
        spark.read.parquet(frag).repartition(4).write.mode(
            "overwrite"
        ).parquet(out)
        n_out = len(glob.glob(os.path.join(out, "part-*.parquet")))
        assert n_frag == 64
        assert n_out == 4
        assert (
            spark.read.parquet(out).count()
            == spark.read.parquet(frag).count()
        )


class TestRound8bOperators:
    def test_welch_t2_matches_float_formula(self, spark):
        """The integer-ppm t² must track the textbook float Welch
        statistic to ≤0.1% (cents quantization + fixed-divisor
        truncation) for a well-separated pair."""
        import duckdb

        from fact_hive_custom_spark.queries import QUERIES

        row = (
            QUERIES["q_stat_ttest_welch"](spark, SF_DIR)
            .filter("type_a = 'click' AND type_b = 'purchase'")
            .collect()[0]
        )
        t = duckdb.sql(
            f"""
            WITH e AS (SELECT event_type, value
                       FROM '{SF_DIR}/events.parquet' WHERE value IS NOT NULL)
            SELECT (a.m - b.m) / sqrt(a.v/a.n + b.v/b.n)
            FROM (SELECT avg(value) m, var_samp(value) v, count(*) n
                  FROM e WHERE event_type='click') a,
                 (SELECT avg(value) m, var_samp(value) v, count(*) n
                  FROM e WHERE event_type='purchase') b
            """
        ).fetchall()[0][0]
        assert abs(row.t2_ppm / 1e6 - t * t) <= 0.001 * t * t
        assert row.t_sign == (1 if t >= 0 else -1)

    def test_bpe_rank_is_dense_and_positive(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_llm_bpe_pairs"](spark, SF_DIR).collect()
        assert [r.merge_rank for r in rows] == list(range(1, 21))
        counts = [r.pair_count for r in rows]
        assert counts == sorted(counts, reverse=True)
        assert all(len(r.pair) == 2 and r.pair[0] == r.left_sym for r in rows)

    def test_url_canonicalization_collapses_all_four_noise_forms(self, spark):
        """Every canonical URL at sf0.01 must absorb exactly the 4
        deterministic raw variants — the collapse the canonicalizer
        exists to perform (a regression to 1 form means the variant
        keying went vacuous again; see the doc_id%4 trap in corpus.py)."""
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_llm_url_canonical"](spark, SF_DIR).collect()
        assert len(rows) == 40
        assert {r.n_raw_forms for r in rows} == {4}
        assert all(
            r.canonical_url.startswith("https://corpus.example/p/")
            and "utm" not in r.canonical_url
            and "#" not in r.canonical_url
            and ":443" not in r.canonical_url
            for r in rows
        )

    def test_dedup_eval_agrees_with_operator_ground_truth(self, spark):
        from fact_hive_custom_spark.operators.dedup import jaccard_pairs
        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.tables import load_table

        row = QUERIES["q_llm_dedup_eval"](spark, SF_DIR).collect()[0]
        exact = jaccard_pairs(
            load_table(spark, SF_DIR, "documents"), 0.8, max_doc_freq=None
        ).count()
        assert (row.tp, row.fp, row.fn) == (exact, 0, 0)
        assert row.precision_ppm == row.recall_ppm == 1_000_000

    def test_bpe_train_first_merge_is_bpe_pairs_top_rank(self, spark):
        """Round 1 of the trainer must elect exactly q_llm_bpe_pairs'
        rank-1 pair (same counting, same tie rule); later rounds must
        emit distinct merges with positive counts, and the leftmost-
        non-overlapping replace semantics both engines rely on must
        hold on the canonical overlap cases."""
        from fact_hive_custom_spark.queries import QUERIES

        train = QUERIES["q_llm_bpe_train"](spark, SF_DIR).collect()
        top = QUERIES["q_llm_bpe_pairs"](spark, SF_DIR).collect()[0]
        assert [r.merge_round for r in train] == [1, 2, 3]
        assert (train[0].merge_a, train[0].merge_b, train[0].pair_count) == (
            top.left_sym,
            top.right_sym,
            top.pair_count,
        )
        merges = {(r.merge_a, r.merge_b) for r in train}
        assert len(merges) == 3
        assert all(r.pair_count > 0 for r in train)
        row = spark.sql(
            "SELECT replace('e~~e~~e', 'e~~e', 'ee') AS a,"
            " replace('a~~b~~a~~b~~a~~b', 'a~~b', 'ab') AS b"
        ).collect()[0]
        assert (row.a, row.b) == ("ee~~e", "ab~~ab~~ab")

    def test_pq_codes_centroids_self_code_and_distortion_bounds(self, spark):
        """The 16 centroid vectors must PQ-encode to themselves with
        zero distortion; every other vector gets codes drawn from the
        centroid id set with positive distortion bounded by the int8
        grid's worst case (8 subspaces × 8 dims × 254²)."""
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_llm_pq_codes"](spark, SF_DIR).collect()
        cent_ids = set(range(16))
        code_cols = [f"code_{m}" for m in range(1, 9)]
        for r in rows:
            codes = [r[c] for c in code_cols]
            assert set(codes) <= cent_ids, r
            if r.vec_id in cent_ids:
                assert codes == [r.vec_id] * 8 and r.distortion == 0, r
            else:
                assert 0 < r.distortion <= 8 * 8 * 254 * 254, r

    def test_media_dedup_finds_every_planted_reencode(self, spark):
        """Planted-duplicate recall = 1.0: every re-encoded asset
        (vec_id % 20 == 0, features × 0.97) must pair with its
        original within Hamming radius 7 — the pigeonhole guarantee
        says the banded join cannot miss a true pair, and the hash
        must be stable under the 3% lossy-transcode drift. Also: the
        survivor (keep_id) is always the original (min-id policy),
        and no pair is an original-original false positive at radius
        ≤ 1 (near-random fixture vectors sit at Hamming ~32)."""
        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.tables import load_embeddings

        rows = QUERIES["q_llm_media_dedup"](spark, SF_DIR).collect()
        planted = {
            r.vec_id
            for r in load_embeddings(spark, SF_DIR)
            .select("vec_id")
            .collect()
            if r.vec_id % 20 == 0
        }
        found = {
            (r.keep_id, r.drop_id) for r in rows if r.drop_id >= 1000000
        }
        assert {(v, v + 1000000) for v in planted} <= found
        for r in rows:
            assert r.keep_id < r.drop_id, r
            assert 0 <= r.hamming <= 7, r


class TestRound10Invariants:
    """Algebraic guarantees of the round-10 operators — properties the
    parity oracle can't express (they hold by CONSTRUCTION, so a
    violation means the operator itself is wrong, not a fixture)."""

    SF = "/root/testdata/sf0.01"

    def test_cms_never_undercounts(self, spark):
        """Count–min guarantee: est ≥ exact for every probe (collisions
        only ADD mass), and the estimate of the heaviest token is
        finite (every probe hits d populated cells)."""
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_agg_cms_estimate"](spark, self.SF).collect()
        assert rows, "no probes returned"
        for r in rows:
            assert r.cms_est >= r.exact_cnt, r
            assert r.overcount == r.cms_est - r.exact_cnt, r

    def test_bloom_has_zero_false_negatives(self, spark):
        """Bloom guarantee: every true member is flagged — the flagged
        count is at least the true-member count, and false positives
        are exactly the surplus of flagged over true flagged."""
        from fact_hive_custom_spark.queries import QUERIES

        row = QUERIES["q_llm_bloom_vocab"](spark, self.SF).collect()[0]
        assert row.n_flagged >= row.n_true_members, row
        assert row.n_false_pos == row.n_flagged - row.n_true_members, row
        assert 0 < row.n_bits_set <= 1024, row

    def test_auc_in_unit_range_and_gini_consistent(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        row = QUERIES["q_stat_auc_roc"](spark, self.SF).collect()[0]
        assert 0 <= row.auc_e6 <= 1_000_000, row
        assert row.gini_e6 == 2 * row.auc_e6 - 1_000_000, row

    def test_mutual_info_nonnegative_and_theil_u_unit_range(self, spark):
        """MI ≥ 0 up to the per-cell e6 floor slack (± #cells); Theil's
        U = MI/H(X) lands in [0, 1e6] with the same slack."""
        from fact_hive_custom_spark.queries import QUERIES

        mi_rows = QUERIES["q_stat_mutual_info"](spark, self.SF).collect()
        n_cells = len(mi_rows)
        assert mi_rows[0].mi_e6 >= -n_cells
        u = QUERIES["q_stat_theil_u"](spark, self.SF).collect()[0]
        assert -n_cells <= u.theil_u_ppm <= 1_000_000 + n_cells, u

    def test_reservoir_sample_is_stable_and_k_bounded(self, spark):
        """The md5-keyed sample is a deterministic function of the
        data: two independent evaluations pick identical doc ids, and
        no source exceeds k=5."""
        from collections import Counter

        from fact_hive_custom_spark.queries import QUERIES

        a = {(r.source, r.doc_id) for r in QUERIES["q_llm_reservoir_sample"](spark, self.SF).collect()}
        b = {(r.source, r.doc_id) for r in QUERIES["q_llm_reservoir_sample"](spark, self.SF).collect()}
        assert a == b and a
        per_source = Counter(s for s, _ in a)
        assert max(per_source.values()) <= 5

    def test_minhash_estimator_is_unbiased_enough(self, spark):
        """Estimator sanity at H=16: the mean absolute error over the
        calibrated pairs stays under two signature slots (2/16 =
        125000 ppm) — far tighter than chance, loose enough for the
        fixture's pair count."""
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_llm_minhash_est"](spark, self.SF).collect()
        assert rows
        mean_err = sum(r.abs_err_ppm for r in rows) / len(rows)
        assert mean_err <= 125_000, mean_err

    def test_label_prop_rounds_only_coarsen(self, spark):
        """Min-label propagation invariant: member counts sum to the
        node count and every community label is one of its own nodes'
        ids (min over a connected 3-hop ball)."""
        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.queries.analytics import (
            _cooccurrence_edges,
        )

        comm = QUERIES["q_graph_label_prop"](spark, self.SF).collect()
        edges = _cooccurrence_edges(spark, self.SF)
        n_nodes = (
            edges.selectExpr("u AS node")
            .union(edges.selectExpr("v AS node"))
            .distinct()
            .count()
        )
        assert sum(r.n_members for r in comm) == n_nodes

    def test_markov_mass_conserved_up_to_floors(self, spark):
        """Power iteration loses at most |types|² units of mass per
        round to the per-edge floors; shares sum to ~1e6."""
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_event_markov_stationary"](spark, self.SF).collect()
        k = len(rows)
        total_share = sum(r.share_ppm for r in rows)
        assert 1_000_000 - k <= total_share <= 1_000_000, total_share
        start_mass = k * 10**12
        assert sum(r.mass for r in rows) <= start_mass

    def test_rolling_median_between_window_extremes(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_ts_rolling_median"](spark, self.SF).collect()
        for r in rows:
            assert 1 <= r.n_win <= 7, r
            # med2 = lower+upper middle: bounded by 2·min..2·max of
            # the window, which itself brackets the day's own count
            assert r.med2 >= 2, r


class TestQuantileSketch:
    """q_agg_quantile_sketch: mergeability must be EXACT (bottom-k of
    unioned shard bottom-ks == direct global bottom-k) and the
    estimates must hold the sample-quantile rank-error bound
    ±4·sqrt(q(1-q)/k) vs exact percentiles (round-10 verdict item 4)."""

    def test_merge_equals_direct_global_bottom_k(self, spark):
        import duckdb

        con = duckdb.connect()
        # direct: global bottom-256 with NO shard stage
        direct = con.execute(f"""
            WITH v AS (
                SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                       || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS hv,
                       l_orderkey, l_linenumber
                FROM read_parquet('{SF_DIR}/lineitem.parquet')
            )
            SELECT hv FROM v ORDER BY hv, l_orderkey, l_linenumber LIMIT 256
        """).fetchall()
        # merged: the query's own shard → merge pipeline
        merged = con.execute(f"""
            WITH v AS (
                SELECT strftime(l_shipdate, '%Y-%m') AS shard,
                       ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                       || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS hv,
                       l_orderkey, l_linenumber
                FROM read_parquet('{SF_DIR}/lineitem.parquet')
            ),
            shard_sk AS (
                SELECT * FROM v
                QUALIFY row_number() OVER (PARTITION BY shard
                    ORDER BY hv, l_orderkey, l_linenumber) <= 256
            )
            SELECT hv FROM shard_sk
            ORDER BY hv, l_orderkey, l_linenumber LIMIT 256
        """).fetchall()
        assert merged == direct

    def test_rank_error_bound(self, spark):
        import math

        import duckdb

        from fact_hive_custom_spark.queries import QUERIES

        rows = {
            int(r.q_pct): int(r.est_cents)
            for r in QUERIES["q_agg_quantile_sketch"](spark, SF_DIR).collect()
        }
        assert set(rows) == {50, 95, 99}
        con = duckdb.connect()
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/lineitem.parquet')"
        ).fetchone()[0]
        for q_pct, est in rows.items():
            q = q_pct / 100.0
            # empirical rank fraction of the estimate in the FULL data
            frac = con.execute(f"""
                SELECT COUNT(*) FILTER (
                    CAST(round(l_extendedprice * 100) AS BIGINT) <= {est}
                ) * 1.0 / COUNT(*)
                FROM read_parquet('{SF_DIR}/lineitem.parquet')
            """).fetchone()[0]
            bound = 4.0 * math.sqrt(q * (1 - q) / 256) + 1.0 / n
            assert abs(frac - q) <= bound, (q_pct, est, frac, bound)


class TestIRMetrics:
    """q_ir_mrr / q_ir_ndcg: per-probe values must be in range and the
    derived suite-level means exact integers over the detail rows."""

    def test_mrr_detail_and_mean(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_ir_mrr"](spark, SF_DIR).collect()
        assert len(rows) == 20
        for r in rows:
            assert 0 <= r.first_rel_rank <= 10
            if r.first_rel_rank == 0:
                assert r.rr_ppm == 0
            else:
                assert r.rr_ppm == 1_000_000 // r.first_rel_rank
        mrr_ppm = sum(r.rr_ppm for r in rows) // len(rows)
        assert 0 <= mrr_ppm <= 1_000_000

    def test_ndcg_detail_bounds(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_ir_ndcg"](spark, SF_DIR).collect()
        assert len(rows) == 20
        for r in rows:
            assert 0 <= r.dcg_e6 <= r.idcg_e6 or r.idcg_e6 == 0, r
            assert 0 <= r.ndcg_ppm <= 1_000_000, r
            if r.idcg_e6 > 0:
                assert r.ndcg_ppm == 1_000_000 * r.dcg_e6 // r.idcg_e6, r


class TestIRMap:
    """q_ir_map: AP detail rows in range and internally consistent."""

    def test_map_detail_bounds(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_ir_map"](spark, SF_DIR).collect()
        assert len(rows) == 20
        for r in rows:
            assert 0 <= r.n_rel_cap <= 10, r
            assert r.sum_prec_ppm >= 0, r
            assert 0 <= r.ap_ppm <= 1_000_000, r
            if r.n_rel_cap > 0:
                assert r.ap_ppm == r.sum_prec_ppm // r.n_rel_cap, r


class TestIRErr:
    """q_ir_err: the cascade terms recomputed INDEPENDENTLY in pure
    Python from the shared ranked run (the holt_winters third-
    implementation pattern) plus bounds."""

    def test_err_matches_pure_python_cascade(self, spark):
        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.queries.ir_metrics import _ranked_run

        ranked = _ranked_run(spark, SF_DIR).collect()
        by_probe = {}
        for r in sorted(ranked, key=lambda r: (r.probe_id, r.rnk)):
            by_probe.setdefault(r.probe_id, []).append(bool(r.rel))
        expect = {}
        for pid, rels in by_probe.items():
            err, c = 0, 0
            for rnk, rel in enumerate(rels, start=1):
                if rel:
                    err += 10 ** 12 // (rnk * 2 ** (c + 1))
                    c += 1
            expect[pid] = (sum(rels), err)

        rows = QUERIES["q_ir_err"](spark, SF_DIR).collect()
        assert len(rows) == 20
        got = {r.probe_id: (r.n_rel, r.err_e12) for r in rows}
        assert got == expect
        # ERR is bounded by the all-relevant cascade sum
        cap = sum(10 ** 12 // (r * 2 ** r) for r in range(1, 11))
        assert all(0 <= v[1] <= cap for v in got.values())


class TestSprt:
    """q_stat_sprt: LLR recomputed from raw counts with float log
    against the e12 literal path, and the decision boundary honored."""

    def test_sprt_llr_and_decision(self, spark):
        import math

        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.queries.stats import (
            _SPRT_A_E12,
            _SPRT_C0_E12,
            _SPRT_C1_E12,
        )

        rows = QUERIES["q_stat_sprt"](spark, SF_DIR).collect()
        assert len(rows) == 2
        for r in rows:
            llr = int(r.llr_e12)
            assert llr == r.x * _SPRT_C1_E12 + (r.n - r.x) * _SPRT_C0_E12
            # e12 literals vs float log: relative agreement
            f = r.x * math.log(0.20 / 0.18) + (r.n - r.x) * math.log(
                0.80 / 0.82
            )
            assert abs(llr / 1e12 - f) <= 1e-6 * max(1.0, abs(f))
            want = (
                "accept_h1"
                if llr >= _SPRT_A_E12
                else "accept_h0"
                if llr <= -_SPRT_A_E12
                else "continue"
            )
            assert r.decision == want
            assert 0 <= r.x <= r.n


class TestExactTests:
    """exact_tests.py: the p-values are exact rationals — re-derive
    them with Python's arbitrary-precision math.comb and demand
    equality, not closeness."""

    def test_sign_test_p_matches_math_comb(self, spark):
        import math

        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_stat_sign_test"](spark, SF_DIR).collect()
        assert len(rows) == 25
        for r in rows:
            n, k = r.n_pairs, r.k_pos
            tail = sum(math.comb(n, i) for i in range(min(k, n - k) + 1))
            p_num = min(2 * tail, 2**n)
            assert r.p_ppm == 1000000 * p_num // 2**n, r

    def test_fisher_p_matches_math_comb(self, spark):
        import math

        from fact_hive_custom_spark.queries import QUERIES

        r = QUERIES["q_stat_fisher_exact"](spark, SF_DIR).collect()[0]
        n, r1, c1, k_obs = r.n_nations, r.n_asia, r.n_above, r.k_obs
        terms = {
            k: math.comb(r1, k) * math.comb(n - r1, c1 - k)
            for k in range(max(0, r1 + c1 - n), min(r1, c1) + 1)
        }
        p_num = sum(v for v in terms.values() if v <= terms[k_obs])
        p_den = math.comb(n, c1)
        assert (r.p_num, r.p_den) == (p_num, p_den)
        assert r.p_ppm == 1000000 * p_num // p_den
        assert 0 <= r.p_ppm <= 1000000

    def test_bh_adjusted_is_monotone_and_dominates_p(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_stat_bh_fdr"](spark, SF_DIR).collect()
        assert len(rows) == 25
        prev = 0
        for r in sorted(rows, key=lambda r: r.p_rank):
            assert r.p_adj_ppm >= r.p_ppm
            assert r.p_adj_ppm >= prev  # step-up min is nondecreasing
            assert r.p_adj_ppm <= 1000000
            prev = r.p_adj_ppm

    def test_paired_t2_matches_float_formula(self, spark):
        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.queries.exact_tests import _monthly_diffs
        from fact_hive_custom_spark.tables import load_table

        got = {
            r.region: r
            for r in QUERIES["q_stat_paired_ttest"](spark, SF_DIR).collect()
        }
        reg = {
            r.n_nationkey: r.r_name
            for r in load_table(spark, SF_DIR, "nation")
            .join(
                load_table(spark, SF_DIR, "region"),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .collect()
        }
        by_region: dict[str, dict[int, int]] = {}
        for r in _monthly_diffs(spark, SF_DIR).collect():
            m = by_region.setdefault(reg[r.nk], {})
            m[r.mo] = m.get(r.mo, 0) + r.d
        for name, months in by_region.items():
            d = list(months.values())
            n, sx, sxx = len(d), sum(d), sum(x * x for x in d)
            den = n * sxx - sx * sx
            expect = 1000000 * sx * sx * (n - 1) // den if den else None
            assert got[name].t2_ppm == expect, name
            assert got[name].n_months == 12


class TestThetaSketch:
    """q_agg_theta_sketch: KMV set-algebra estimates must hold their
    ~1/sqrt(K−2) error bound against the exact counts the query emits
    alongside (4σ tolerance: K=256 → 25%)."""

    def test_estimates_within_4_sigma(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        r = QUERIES["q_agg_theta_sketch"](spark, SF_DIR).collect()[0]
        k = r.sketch_k
        tol = 4.0 / (k - 2) ** 0.5
        for est, exact in [
            (r.est_a, r.n_a_exact),
            (r.est_b, r.n_b_exact),
            (r.est_union, r.n_union_exact),
            (r.est_inter, r.n_inter_exact),
        ]:
            assert exact > 0
            assert abs(est - exact) <= max(tol * exact, 2), (est, exact)
        assert r.err_union_ppm == abs(r.est_union - r.n_union_exact) * 1000000 // r.n_union_exact
        # set-algebra consistency on the exact side
        assert r.n_union_exact <= r.n_a_exact + r.n_b_exact
        assert r.n_inter_exact == r.n_a_exact + r.n_b_exact - r.n_union_exact


class TestClusteringCoeff:
    def test_buckets_partition_deg2_nodes_and_means_in_range(self, spark):
        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.queries.analytics import (
            _cooccurrence_edges,
        )

        rows = QUERIES["q_graph_clustering_coeff"](spark, SF_DIR).collect()
        assert rows, "graph fixture should have deg>=2 nodes"
        e = _cooccurrence_edges(spark, SF_DIR)
        deg2 = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .count()
            .filter(F.col("count") >= 2)
            .count()
        )
        assert sum(r.n_nodes for r in rows) == deg2
        for r in rows:
            assert 0 <= r.bucket <= 10
            lo = r.bucket * 100000
            hi = 1000000 if r.bucket == 10 else (r.bucket + 1) * 100000 - 1
            assert lo <= r.avg_c_ppm <= hi, r


class TestPermutationTest:
    def test_p_matches_python_rederivation(self, spark):
        """Re-derive the full randomization test in pure Python
        (hashlib md5 bits, exact integers) on the tiny fixture and
        demand the identical p_ppm."""
        import hashlib

        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.queries.exact_tests import _PERM_K
        from fact_hive_custom_spark.tables import load_table

        got = QUERIES["q_stat_permutation_test"](spark, SF_TINY).collect()[0]
        rows = (
            load_table(spark, SF_TINY, "events")
            .filter(
                F.col("event_type").isin("click", "view")
                & F.col("value").isNotNull()
                & F.col("event_id").isNotNull()
            )
            .select(
                "event_id",
                (F.col("event_type") == "click").alias("grp"),
                F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
            )
            .collect()
        )

        def md5bit(eid, j):
            h = hashlib.md5(f"pm:{eid}:{j}".encode()).hexdigest()[:15]
            return int(h, 16) % 2

        na = sum(1 for r in rows if r.grp)
        nb = len(rows) - na
        sa = sum(r.cents for r in rows if r.grp)
        sb = sum(r.cents for r in rows if not r.grp)
        obs = abs(sa * nb - sb * na)
        n_extreme = 0
        for j in range(1, _PERM_K + 1):
            naj = nbj = saj = sbj = 0
            for r in rows:
                if md5bit(r.event_id, j) == 0:
                    naj += 1
                    saj += r.cents
                else:
                    nbj += 1
                    sbj += r.cents
            if naj > 0 and nbj > 0:
                if abs(saj * nbj - sbj * naj) * (na * nb) >= obs * (naj * nbj):
                    n_extreme += 1
        assert got.n_rows == len(rows)
        assert got.n_extreme == n_extreme
        assert got.p_ppm == 1000000 * (1 + n_extreme) // (_PERM_K + 1)
        # a genuine group difference in the fixture should not look
        # typical under the null... but don't over-assert: just range
        assert 0 < got.p_ppm <= 1000000


class TestDpHistogram:
    def test_noise_matches_python_laplace_draw(self, spark):
        import hashlib
        import math

        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.queries.profiling import _DP_N

        def L(z):
            return math.floor(math.log(z) * 1000000 + 0.5)

        def noise(src, metric):
            h = int(
                hashlib.md5(f"dp:{src}:{metric}".encode()).hexdigest()[:15],
                16,
            )
            sign = 1 if (h // _DP_N) % 2 == 0 else -1
            return sign * (L(_DP_N) - L(h % _DP_N + 1))

        rows = QUERIES["q_llm_dp_histogram"](spark, SF_DIR).collect()
        assert len(rows) == 20
        signs = set()
        for r in rows:
            nd = noise(r.source, "docs")
            nc = noise(r.source, "chars")
            assert r.noisy_docs_e6 == max(0, r.n_docs * 1000000 + nd)
            assert r.noisy_chars_e6 == max(0, r.sum_chars * 1000000 + nc)
            signs.add(nd > 0)
            assert r.epsilon_e6 == 1000000
        assert signs == {True, False}, "both noise signs should occur"


class TestRound12Rederivations:
    """Independent third implementations of the round-12 operators:
    pure Python over collected base rows, exact-integer equality
    against the Spark result (the round-11 math.comb layer's
    discipline, extended)."""

    def test_holt_linear_matches_python_recurrence(self, spark):
        import math

        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.tables import load_table

        rows = QUERIES["q_ts_holt_linear"](spark, SF_DIR).collect()
        assert rows, "holt output should be non-empty"
        # rebuild every series from raw orders with pure Python ints
        o = (
            load_table(spark, SF_DIR, "orders")
            .filter(
                "o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL"
                " AND o_totalprice IS NOT NULL"
                " AND o_orderdate >= DATE '1996-01-01'"
                " AND o_orderdate < DATE '1996-07-01'"
            )
            .collect()
        )
        cells: dict = {}
        for r in o:
            key = (r.o_orderpriority, r.o_orderdate)
            cents = int(
                (r.o_totalprice * 100).quantize(1)
                if hasattr(r.o_totalprice, "quantize")
                else round(r.o_totalprice * 100)
            )
            cells[key] = cells.get(key, 0) + cents
        series: dict = {}
        for (prio, day), v in sorted(cells.items()):
            series.setdefault(prio, []).append((day, v))
        expect = {}
        for prio, pts in series.items():
            l, b = pts[0][1], 0
            expect[(prio, 1)] = (pts[0][0], pts[0][1], l, b)
            for t, (day, v) in enumerate(pts[1:], start=2):
                l1 = math.floor((v + l + b) / 2)
                b1 = math.floor((l1 - l + b) / 2)
                l, b = l1, b1
                expect[(prio, t)] = (day, v, l, b)
        assert len(rows) == len(expect)
        for r in rows:
            day, v, l, b = expect[(r.priority, r.t)]
            assert (r.day, r.v, r.level, r.trend) == (day, v, l, b), r
            assert r.forecast_next == l + b

    def test_holt_winters_matches_python_recurrence(self, spark):
        """Third implementation: the Spark fold and the DuckDB
        recursive CTE are GENERATED from one template (timeseries.py
        _hw_spark_fold/_hw_oracle), so parity alone cannot catch a
        template bug — this pure-Python rebuild of the recurrence
        can (the q_llm_js_divergence lesson)."""
        import math

        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.tables import load_table

        rows = QUERIES["q_ts_holt_winters"](spark, SF_DIR).collect()
        assert rows, "holt-winters output should be non-empty"
        o = (
            load_table(spark, SF_DIR, "orders")
            .filter(
                "o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL"
                " AND o_totalprice IS NOT NULL"
                " AND o_orderdate >= DATE '1996-01-01'"
                " AND o_orderdate < DATE '1996-07-01'"
            )
            .collect()
        )
        cells: dict = {}
        for r in o:
            key = (r.o_orderpriority, r.o_orderdate)
            cells[key] = cells.get(key, 0) + int(round(r.o_totalprice * 100))
        series: dict = {}
        for (prio, day), v in sorted(cells.items()):
            series.setdefault(prio, []).append((day, v))
        expect = {}
        for prio, pts in series.items():
            if len(pts) < 8:
                continue
            l = math.floor(sum(v for _, v in pts[:7]) / 7)
            b = 0
            s = [v - l for _, v in pts[:7]]
            seasonal_hist = {}
            for t in range(1, 8):
                day, v = pts[t - 1]
                expect[(prio, t)] = (day, v, l, 0, v - l)
                seasonal_hist[t] = v - l
            for t, (day, v) in enumerate(pts[7:], start=8):
                pos = (t - 1) % 7
                l1 = math.floor((v - s[pos] + l + b) / 2)
                b1 = math.floor((l1 - l + b) / 2)
                s[pos] = math.floor((v - l1 + s[pos]) / 2)
                l, b = l1, b1
                expect[(prio, t)] = (day, v, l, b, s[pos])
                seasonal_hist[t] = s[pos]
        assert len(rows) == len(expect)
        for r in rows:
            day, v, l, b, seas = expect[(r.priority, r.t)]
            assert (r.day.date() if hasattr(r.day, "date") else r.day,
                    r.v, r.level, r.trend, r.seasonal) == (
                day.date() if hasattr(day, "date") else day,
                v, l, b, seas), r

    def test_holt_winters_forecast_uses_next_slot(self, spark):
        """forecast_next = level + trend + the seasonal updated six
        observations earlier (the slot that applies to t+1)."""
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_ts_holt_winters"](spark, SF_DIR).collect()
        by_key = {(r.priority, r.t): r for r in rows}
        checked = 0
        for r in rows:
            prev = by_key.get((r.priority, r.t - 6))
            if r.t <= 6:
                assert r.forecast_next is None, r
            else:
                assert prev is not None
                assert r.forecast_next == r.level + r.trend + prev.seasonal, r
                checked += 1
        assert checked > 0

    def test_hhi_matches_python_integer_formula(self, spark):
        from fact_hive_custom_spark.queries import QUERIES
        from fact_hive_custom_spark.tables import load_table

        got = {
            r.nation: r for r in QUERIES["q_stat_hhi"](spark, SF_DIR).collect()
        }
        li = load_table(spark, SF_DIR, "lineitem").filter(
            "l_suppkey IS NOT NULL AND l_extendedprice IS NOT NULL"
        )
        sup = load_table(spark, SF_DIR, "supplier").filter(
            "s_nationkey IS NOT NULL"
        )
        nat = {
            r.n_nationkey: r.n_name
            for r in load_table(spark, SF_DIR, "nation").collect()
        }
        rev_rows = (
            li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
            .groupBy("s_nationkey", "l_suppkey")
            .agg(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                .alias("r")
            )
            .collect()
        )
        by_nation: dict = {}
        for r in rev_rows:
            by_nation.setdefault(nat[r.s_nationkey], []).append(int(r.r))
        assert set(by_nation) == set(got)
        for nation, rs in by_nation.items():
            s = sum(rs)
            shares = [r * 1_000_000_000 // s for r in rs]
            hhi = sum(sh * sh for sh in shares) // 1_000_000
            row = got[nation]
            assert (row.n_suppliers, row.rev_cents, row.hhi_e12) == (
                len(rs), s, hhi), nation

    def test_js_divergence_is_bounded_and_symmetric_parts(self, spark):
        import math

        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_llm_js_divergence"](spark, SF_DIR).collect()
        assert rows
        ln2_e6 = math.floor(math.log(2) * 1_000_000 + 0.5)
        for r in rows:
            # JS in nats is bounded by ln 2; allow the e6 rounding hair
            assert -5 <= r.js_e6 <= ln2_e6 + 5, r
            assert r.n_tok_src > 0 and r.n_tok_rest > 0

    def test_friedman_rank_sums_are_complete(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_stat_friedman"](spark, SF_DIR).collect()
        k = len(rows)
        assert k >= 2
        b = rows[0].n_blocks
        # doubled midranks per block sum to k(k+1), so totals must
        # sum to b*k*(k+1) regardless of ties
        assert sum(r.rank2_sum for r in rows) == b * k * (k + 1)
        assert all(r.df == k - 1 for r in rows)
        assert len({r.friedman_e6 for r in rows}) == 1

    def test_prec_recall_f1_identity(self, spark):
        from fact_hive_custom_spark.queries import QUERIES

        rows = QUERIES["q_ir_prec_recall"](spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert r.prec_ppm == r.rel_at_k * 1_000_000 // 10
            if r.total_rel:
                assert r.recall_ppm == r.rel_at_k * 1_000_000 // r.total_rel
            else:
                assert r.recall_ppm == 0 and r.rel_at_k == 0
            assert r.f1_ppm == 2 * r.rel_at_k * 1_000_000 // (10 + r.total_rel)


class TestSubstringDedup:
    """q_llm_substring_dedup's reason to exist (round-15 verdict item
    3): content-defined anchors catch a shared block at ANY offset,
    where the aligned 20-token span detector structurally cannot."""

    @staticmethod
    def _mini_corpus(spark, tmp_path):
        # One 40-token block shared by two docs at offsets 7 and 13 —
        # neither 20-aligned, so every aligned frame mixes block and
        # filler differently and span_dedup sees nothing.
        block = " ".join(f"license{i} clause{i}" for i in range(20))
        filler_a = " ".join(f"alpha{i}" for i in range(7))
        filler_b = " ".join(f"beta{i}" for i in range(13))
        tail_a = " ".join(f"enda{i}" for i in range(25))
        tail_b = " ".join(f"endb{i}" for i in range(25))
        rows = [
            (1, f"{filler_a} {block} {tail_a}", "en", "web", 1),
            (2, f"{filler_b} {block} {tail_b}", "en", "web", 1),
            (3, " ".join(f"solo{i}" for i in range(80)), "en", "web", 1),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        out = str(tmp_path / "documents.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(out)
        return str(tmp_path)

    def test_unaligned_block_found_only_by_anchor_detector(
        self, spark, tmp_path
    ):
        from fact_hive_custom_spark.queries import QUERIES

        sf = self._mini_corpus(spark, tmp_path)
        aligned = QUERIES["q_llm_span_dedup"](spark, sf).collect()
        assert aligned == [], (
            "aligned span detector unexpectedly matched the shifted "
            f"block: {aligned}"
        )
        anchored = QUERIES["q_llm_substring_dedup"](spark, sf).collect()
        assert anchored, "content-defined anchors missed the shared block"
        # every reported fingerprint here comes from the shared block:
        # docs 1+2 only, each anchor once per doc
        for r in anchored:
            assert r.n_docs == 2 and r.n_occurrences == 2, r
