"""Embedding similarity search (SURVEY.md §2.2.I).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random hyperplane / sign-LSH) variant as the 100 TB path. Both keep
the arithmetic in Spark higher-order functions (zip_with + aggregate
fold) — JVM codegen, no Python, no ML-lib vector boxing.

Scale posture: the probe set is broadcast (it is small by
construction); the corpus never shuffles for brute force. For the LSH
variant the corpus is hashed to buckets map-side and only
bucket-colliding (probe, vector) pairs are scored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fact_hive_custom_spark.materialize import materialize

from fact_hive_custom_spark.functions.vectors import cosine, dot as _dot, norm as _norm

__all__ = ["cosine", "cosine_pairs", "cosine_topk", "ivf_topk", "signlsh_topk"]


def _topk_per_probe(
    scored: DataFrame, k: int, select_cols: list, score_col: str = "cosine"
) -> DataFrame:
    """Two-phase deterministic top-k per probe_id.

    Phase 1 prunes to k rows per (probe_id, input partition): the
    exchange feeding it is keyed on (probe_id, pid), so the scored set
    spreads over |probes| × |partitions| reducers instead of piling the
    entire |corpus|×|probes| score matrix onto |probes| tasks — the
    round-1 scale-killer (one straggler/OOM task per probe at 100×).
    Phase 2 ranks the ≤ k × partitions survivors per probe — tiny.

    Both phases use the same total order (score desc, neighbor_id asc),
    so the result is identical to a single global window: the global
    top-k of each probe is contained in the union of its per-partition
    top-ks.
    """
    order = [F.desc(score_col), F.asc("neighbor_id")]
    local = Window.partitionBy("probe_id", "pid").orderBy(*order)
    w = Window.partitionBy("probe_id").orderBy(*order)
    return (
        scored.withColumn("pid", F.spark_partition_id())
        .withColumn("lrn", F.row_number().over(local))
        .filter(F.col("lrn") <= k)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*select_cols)
    )


def cosine_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    payload: tuple[str, ...] = (),
) -> DataFrame:
    """Exact top-k neighbors by cosine for each probe vector.

    Returns (probe_id, neighbor_id, cosine, *payload) with a full
    (cosine desc, neighbor_id asc) tiebreak so top-k is deterministic.
    Brute force = one pass over the corpus per partition with the
    probes broadcast; cost O(|corpus| × |probes| × dim), no shuffle of
    the corpus except the final per-probe top-k (tiny).
    """
    # Norms are precomputed once per row on each side (before the pair
    # join), so each of the |corpus|×|probes| pairs evaluates ONE dot
    # product instead of three — ~25% faster measured, and at scale the
    # corpus-side norm is computed |probes|× fewer times.
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        _norm(F.col(vec_col)).alias("probe_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        _norm(F.col(vec_col)).alias("corpus_norm"),
        *payload,
    )
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("probe_vec"), F.col("corpus_vec"))
            / (F.col("probe_norm") * F.col("corpus_norm")),
        )
    )
    return _topk_per_probe(
        scored,
        k,
        ["probe_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), *payload],
    )


def signlsh_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane (sign) LSH.

    Each of `num_tables` hash tables buckets a vector by the sign
    pattern of `num_planes` seeded Gaussian hyperplanes (literal
    arrays — no per-row randomness, fully deterministic). Probes score
    only vectors sharing a bucket in ≥1 table — the candidate set
    shrinks ~2^-planes per table, which is what makes 100 TB ANN
    feasible. Collision probability per plane is 1-θ/π, so tune
    num_planes DOWN when neighbors are far (θ large): near-random
    corpora need 4-6 planes, tightly clustered ones tolerate 12+.
    Recall vs the exact baseline is asserted in tests (not
    oracle-hashed: candidate misses are by design).
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.randn(num_tables, num_planes, dim)

    def bucket_expr(vec: Column, table: int) -> Column:
        bits = []
        for plane in range(num_planes):
            comps = F.array(*[F.lit(float(x)) for x in planes[table, plane]])
            bits.append(F.when(_dot(vec, comps) > 0, F.lit(1 << plane)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"), bucket_expr(F.col(vec_col), t).alias("bucket")
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(idc), F.col(vec_col), F.explode(tables).alias("tb")
        ).select(idc, vec_col, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    pb = with_buckets(probes.select(F.col(id_col).alias("probe_id"), vec_col), "probe_id")
    cb = with_buckets(corpus.select(F.col(id_col).alias("neighbor_id"), vec_col), "neighbor_id")
    pb = pb.select("probe_id", F.col(vec_col).alias("probe_vec"), "tbl", "bucket")
    cb = cb.select("neighbor_id", F.col(vec_col).alias("corpus_vec"), "tbl", "bucket")

    cand = (
        cb.join(F.broadcast(pb), ["tbl", "bucket"])
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "probe_vec", "neighbor_id", "corpus_vec")
        .distinct()
    )
    scored = cand.withColumn("cosine", cosine(F.col("probe_vec"), F.col("corpus_vec")))
    return _topk_per_probe(
        scored, k, ["probe_id", "neighbor_id", F.round("cosine", 6).alias("cosine")]
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_pivots: int = 16,
    seed: int = 7,
) -> DataFrame:
    """EXACT all-pairs cosine >= threshold via pivot-partitioned search.

    Returns (vec_a, vec_b, cosine) with vec_a < vec_b — bit-identical to
    the brute-force self-join, but organized as IVF-style blocks so the
    quadratic work distributes and, on clustered data, mostly vanishes:

    1. pick `num_pivots` deterministic pivot vectors (smallest seeded
       xxhash64 of the id — no RNG, stable under repartitioning);
    2. assign every vector to its nearest pivot (broadcast pivots, one
       map-side pass) and record the angle to it;
    3. per-cluster radius = max member angle (tiny aggregate);
    4. candidate CLUSTER pairs by the angular triangle inequality:
       theta(a,b) >= theta(c_a,c_b) - r_a - r_b, so a cluster pair can
       hold a qualifying vector pair only if
       theta(c_a,c_b) <= theta_t + r_a + r_b. Unlike sign-LSH banding
       this bound is exact — NO false negatives at any threshold (LSH
       at cos 0.5 has per-plane collision prob 2/3 and cannot reach
       recall 1, measured on the fixtures);
    5. block-matrix verification inside surviving cluster-pair blocks:
       each block pair is one Arrow batch, scored as a single BLAS
       matmul (A·Bᵀ) with a 1e-6 candidate margin;
    6. exact JVM rescoring of the (tiny) candidate set with the same
       codegen dot expression as brute force, so emitted cosines are
       bit-identical to the self-join at any scale.

    Step 5 replaces the round-2 per-pair JVM expression dots: on
    unclustered corpora (where the triangle bound cannot prune) the
    verification is Θ(n²·d) FLOPs no matter what — the only question is
    the constant, and a vectorized matmul over 64-float rows is ~100×
    the throughput of per-row array folds (measured 653 s → ~8 s for
    20 k × 64 at sf1.0). The margin is ~1e7× wider than the worst-case
    FMA/reorder divergence between BLAS and sequential double sums, so
    no qualifying pair can be missed; false candidates are removed by
    the exact rescore.

    On well-clustered embeddings (the 100 TB reality) most cluster
    pairs fail the bound and are never scored; on adversarially uniform
    vectors the quadratic work spreads evenly across cluster-pair
    blocks instead of one giant self-join, and replication is bounded
    by `num_pivots` copies of each row. Pruning on a clustered corpus
    is asserted in tests/test_operators.py.
    """
    import numpy as np
    import pandas as pd

    assigned, cluster_pairs = _pivot_blocks(
        corpus, threshold, id_col, vec_col, num_pivots, seed
    )
    # The bound is symmetric — keep one orientation per block pair so
    # each unordered vector pair is scored exactly once (each vector
    # lives in exactly one cluster).
    cp = cluster_pairs.filter(F.col("ca") <= F.col("cb"))

    a_side = assigned.join(F.broadcast(cp), assigned.cluster == cp.ca).select(
        "ca", "cb", "vid", "vec", "nrm", F.lit("a").alias("role")
    )
    b_side = assigned.join(
        F.broadcast(cp.filter(F.col("ca") != F.col("cb"))),
        assigned.cluster == cp.cb,
    ).select("ca", "cb", "vid", "vec", "nrm", F.lit("b").alias("role"))
    blocks = a_side.unionByName(b_side)

    id_type = assigned.schema["vid"].dataType.simpleString()
    margin = 1e-6

    def verify(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ca, cb = key
        thr = threshold - margin
        if ca == cb:
            rows = pdf[pdf["role"] == "a"]
            ids = rows["vid"].to_numpy()
            m = np.stack(rows["vec"].to_numpy()).astype(np.float64)
            nr = rows["nrm"].to_numpy()
            s = (m @ m.T) / np.outer(nr, nr)
            ii, jj = np.nonzero(np.triu(s >= thr, k=1))
            return pd.DataFrame({"ia": ids[ii], "ib": ids[jj]})
        ra = pdf[pdf["role"] == "a"]
        rb = pdf[pdf["role"] == "b"]
        if ra.empty or rb.empty:
            return pd.DataFrame({"ia": ra["vid"].to_numpy()[:0], "ib": ra["vid"].to_numpy()[:0]})
        a_m = np.stack(ra["vec"].to_numpy()).astype(np.float64)
        b_m = np.stack(rb["vec"].to_numpy()).astype(np.float64)
        s = (a_m @ b_m.T) / np.outer(ra["nrm"].to_numpy(), rb["nrm"].to_numpy())
        ii, jj = np.nonzero(s >= thr)
        return pd.DataFrame(
            {"ia": ra["vid"].to_numpy()[ii], "ib": rb["vid"].to_numpy()[jj]}
        )

    # Pin the block-exchange width with a USER-SPECIFIED repartition
    # (exempt from AQE coalescing, reused by the groupBy's
    # distribution): the blocks are few (≤ pivots²/2) but each is a
    # BLAS matmul whose cost AQE's byte heuristic cannot see — at
    # sf1.0 coalescing serialized them onto ~one task (18.4 s vs
    # 8.3 s, measured round 14; same rule as q_udf_cogroup).
    nparts = int(
        corpus.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    cands = (
        blocks.repartition(nparts, "ca", "cb")
        .groupBy("ca", "cb")
        .applyInPandas(verify, schema=f"ia {id_type}, ib {id_type}")
    )
    # Normalize pair order engine-side (works for any orderable id type),
    # then rescore exactly with the brute-force dot expression. The
    # candidate set is ~|result| rows -> broadcast through both joins.
    pairs = cands.select(
        F.least("ia", "ib").alias("vec_a"), F.greatest("ia", "ib").alias("vec_b")
    )
    va = assigned.select(
        F.col("vid").alias("vec_a"), F.col("vec").alias("vec_va"), F.col("nrm").alias("nrm_a")
    )
    vb = assigned.select(
        F.col("vid").alias("vec_b"), F.col("vec").alias("vec_vb"), F.col("nrm").alias("nrm_b")
    )
    cos_ab = _dot(F.col("vec_va"), F.col("vec_vb")) / (F.col("nrm_a") * F.col("nrm_b"))
    with_a = va.join(F.broadcast(pairs), "vec_a")
    return (
        vb.join(F.broadcast(with_a), "vec_b")
        .withColumn("cosine", cos_ab)
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


def _pivot_blocks(
    corpus: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    num_pivots: int,
    seed: int,
) -> tuple[DataFrame, DataFrame]:
    """(assigned, cluster_pairs) internals of cosine_pairs — split out so
    tests can assert the triangle-inequality bound actually prunes
    cluster pairs on clustered corpora."""
    import math

    u = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    # r15: 16 rows, materialized once — three consumers (the
    # assignment fold, both cluster-pair sides) each re-ran the
    # corpus-wide TakeOrdered pivot selection otherwise (part of the
    # 40-scan initial plan of q_llm_cosine_dedup).
    # r16 NOTE (VERDICT item 4, consolidation REJECTED on measurement):
    # deriving this 16-row frame by exploding the cached 1-row `parr`
    # array (one materialization instead of two, construction jobs
    # 6 → 4) was tried and paired-A/B'd SLOWER at sf1.0 — warm 21/25 s
    # (this shape) vs 29/31 s (consolidated), interleaved runs.
    # Suspected cause: the explode-derived frame loses the
    # checkpoint's known-tiny statistics, degrading a downstream
    # broadcast decision. Two tiny jobs are cheaper than one bad plan.
    pivots = _select_pivots(u, num_pivots, seed).transform(materialize)

    # Nearest pivot per vector (r16 REVERT of the r15 argmax fold,
    # measured): the 16-way broadcast crossJoin + map-side-combined
    # groupBy(vid) min_by. The r15 commit replaced this with a
    # nested-HOF fold over a 1-row broadcast pivot array ("no
    # corpus-sized shuffle") and bundled it with the pivot
    # checkpoints; the bundled A/B win (~16→6 s sf0.1) was actually
    # the CHECKPOINTS'. Separated this round and paired-A/B'd
    # interleaved, fold vs crossjoin, same checkpoints both sides:
    # sf1.0 warm 26.7/23.1 vs 9.7/8.5 s (2.7×), sf0.1 6.0/4.8 vs
    # 4.4/3.6 s — the fold nests dot() (zip_with+aggregate) inside
    # another F.aggregate, the interpreted-HOF penalty the r15
    # ivf_topk rejection already priced at ~3×, and it loses at BOTH
    # measured decades. The groupBy(vid) exchange moves (vid, vec,
    # nrm) once, with the 16 candidate rows collapsed map-side by
    # partial aggregation; min_by(struct(-pcos, pid)) keeps the
    # bit-exact tie order (highest cosine, then lowest id — verified
    # hash-identical to the fold's strict `>` at sf0.01).
    cos_to_pivot = _dot(F.col("vec"), F.col("pivot_vec")) / (
        F.col("nrm") * F.col("pivot_nrm")
    )
    assigned = (
        u.crossJoin(F.broadcast(pivots))
        .withColumn(
            "pcos",
            F.least(F.greatest(cos_to_pivot, F.lit(-1.0)), F.lit(1.0)),
        )
        .groupBy("vid")
        .agg(
            F.min_by(
                F.col("pivot_id"),
                F.struct(
                    (-F.col("pcos")).alias("npc"),
                    F.col("pivot_id").alias("pid"),
                ),
            ).alias("cluster"),
            F.acos(F.max("pcos")).alias("angle"),
            F.first("vec").alias("vec"),
            F.first("nrm").alias("nrm"),
        )
        .select("vid", "vec", "nrm", "cluster", "angle")
    )
    # Materialize once: `assigned` now holds the crossjoin+aggregate
    # subtree and feeds 5 consumers (radii, both block sides, both
    # rescore sides) — the r15 checkpoint-payback rule's exact shape.
    # Paired r16: sf0.1 3.0/3.2 vs 3.4/4.0 s, sf1.0 7.0/8.0 vs
    # 7.6/11.0 s. (The r15 semdedup-assigned REJECTION was for the
    # fold-based assigned, whose subtree had no exchange to save.)
    assigned = materialize(assigned)
    radii = assigned.groupBy("cluster").agg(F.max("angle").alias("radius"))
    return _cluster_pairs(pivots, radii, threshold, assigned)


def _cluster_pairs(pivots, radii, threshold, assigned):
    """Candidate cluster pairs (K² rows — driver-trivial): keep
    (ca, cb) iff theta(c_a, c_b) - r_a - r_b <= theta_t. Same-cluster
    pairs pass automatically (theta = 0)."""
    import math

    pa = pivots.select(F.col("pivot_id").alias("ca"), F.col("pivot_vec").alias("va"), F.col("pivot_nrm").alias("na"))
    pb = pivots.select(F.col("pivot_id").alias("cb"), F.col("pivot_vec").alias("vb"), F.col("pivot_nrm").alias("nb"))
    ccos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    theta_t = float(math.acos(max(-1.0, min(1.0, threshold))))
    ra = radii.select(F.col("cluster").alias("ca"), F.col("radius").alias("r_a"))
    rb = radii.select(F.col("cluster").alias("cb"), F.col("radius").alias("r_b"))
    cluster_pairs = (
        pa.crossJoin(pb)
        .withColumn("ctheta", F.acos(F.least(F.greatest(ccos, F.lit(-1.0)), F.lit(1.0))))
        .join(ra, "ca")
        .join(rb, "cb")
        .filter(F.col("ctheta") - F.col("r_a") - F.col("r_b") <= theta_t)
        .select("ca", "cb")
    )
    return assigned, cluster_pairs


def _select_pivots(u: DataFrame, num_pivots: int, seed: int) -> DataFrame:
    """Deterministic pivot set: the `num_pivots` vectors with smallest
    seeded xxhash64 of their id — no RNG, stable under repartitioning.
    `u` must carry (vid, vec, nrm)."""
    return (
        u.withColumn("hk", F.xxhash64(F.col("vid"), F.lit(seed)))
        .orderBy("hk", "vid")
        .limit(num_pivots)
        .select(
            F.col("vid").alias("pivot_id"),
            F.col("vec").alias("pivot_vec"),
            F.col("nrm").alias("pivot_nrm"),
        )
    )


def ivf_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_pivots: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    refine_rounds: int = 0,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) probing — the
    clustering-based counterpart to sign-LSH (`signlsh_topk`):

    1. corpus vectors are assigned to their nearest of `num_pivots`
       deterministic pivots (same pivot family as cosine_pairs) —
       map-side, the corpus shuffles once on cluster id;
    2. each probe ranks the (broadcast) pivot set and selects its
       `nprobe` nearest clusters;
    3. the probe scores ONLY vectors in those clusters — candidate
       volume ≈ nprobe/num_pivots of the corpus per probe, the IVF
       recall/cost dial (nprobe=num_pivots degrades gracefully to the
       exact brute force).

    IVF beats sign-LSH when the corpus is clustered (cluster boundaries
    carry signal); LSH needs no training signal and bounds collisions
    analytically on uniform data. Both ship because the right choice is
    data-dependent; recall vs the exact baseline is asserted in tests
    for each.

    `refine_rounds` > 0 runs that many spherical-k-means Lloyd rounds
    on the pivot set before building the index (assign by cosine
    argmax, update to the member MEAN — cosine is scale-invariant so
    the unnormalized mean ranks identically to the normalized
    spherical centroid). This is the "train the codebook" upgrade
    ANN_RECALL.md points at: same per-round shape as the
    oracle-checked q_llm_kmeans (queries/clustering.py — broadcast
    fold assignment, K×D partially-aggregated update shuffle, one
    corpus scan per round), but in float cosine space where the
    serving path lives. Measured rows in ANN_RECALL.md (refined=N).
    """
    u = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        _norm(F.col(vec_col)).alias("cnrm"),
    )
    pivots = _select_pivots(
        u.select(
            F.col("neighbor_id").alias("vid"),
            F.col("corpus_vec").alias("vec"),
            F.col("cnrm").alias("nrm"),
        ),
        num_pivots,
        seed,
    )
    for _ in range(refine_rounds):
        rcos = _dot(F.col("corpus_vec"), F.col("pivot_vec")) / (
            F.col("cnrm") * F.col("pivot_nrm")
        )
        memb = (
            u.crossJoin(F.broadcast(pivots))
            .withColumn("pcos", rcos)
            .groupBy("neighbor_id")
            .agg(
                F.min_by(
                    F.col("pivot_id"),
                    F.struct(
                        (-F.col("pcos")).alias("npc"),
                        F.col("pivot_id").alias("pid"),
                    ),
                ).alias("cluster"),
                F.first("corpus_vec").alias("corpus_vec"),
            )
        )
        pivots = (
            memb.select("cluster", F.posexplode("corpus_vec").alias("pos", "x"))
            .groupBy(F.col("cluster").alias("pivot_id"), F.col("pos"))
            .agg(F.avg("x").alias("m"))
            .groupBy("pivot_id")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("pivot_vec")
            )
            .withColumn("pivot_nrm", _norm(F.col("pivot_vec")))
        )

    pcos_c = _dot(F.col("corpus_vec"), F.col("pivot_vec")) / (
        F.col("cnrm") * F.col("pivot_nrm")
    )
    assigned = (
        u.crossJoin(F.broadcast(pivots))
        .withColumn("pcos", pcos_c)
        .groupBy("neighbor_id")
        .agg(
            F.min_by(
                F.col("pivot_id"),
                F.struct((-F.col("pcos")).alias("npc"), F.col("pivot_id").alias("pid")),
            ).alias("cluster"),
            F.first("corpus_vec").alias("corpus_vec"),
            F.first("cnrm").alias("cnrm"),
        )
    )

    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        _norm(F.col(vec_col)).alias("pnrm"),
    )
    pcos_p = _dot(F.col("probe_vec"), F.col("pivot_vec")) / (
        F.col("pnrm") * F.col("pivot_nrm")
    )
    probe_clusters = (
        p.crossJoin(F.broadcast(pivots))
        .withColumn("pcos", pcos_p)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(
                    F.col("pcos").desc(), F.col("pivot_id")
                )
            ),
        )
        .filter(F.col("rk") <= nprobe)
        .select("probe_id", "probe_vec", "pnrm", F.col("pivot_id").alias("cluster"))
    )

    scored = (
        assigned.join(F.broadcast(probe_clusters), "cluster")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("probe_vec"), F.col("corpus_vec")) / (F.col("pnrm") * F.col("cnrm")),
        )
    )
    return _topk_per_probe(
        scored, k, ["probe_id", "neighbor_id", F.round("cosine", 6).alias("cosine")]
    )
