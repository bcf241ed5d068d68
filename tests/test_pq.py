"""Product quantization: encode determinism, ADC vs exact recompute,
and codebook training (distortion non-increasing, bounded driver
state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cybersecurity_miw_spark.operators import similarity
from cybersecurity_miw_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
DIM, M, K = 64, 4, 8


def _distortion(spark, df, books):
    """Mean integer L2 between each subvector and its assigned
    codebook entry — the k-means objective."""
    enc = similarity.pq_encode(df, books)
    iv = similarity.int_vec(F.col("embedding"))
    sub_dim = DIM // M
    total = F.lit(0).cast("long")
    for s in range(M):
        sub = F.slice(iv, s * sub_dim + 1, sub_dim)
        dists = F.array(
            *[
                similarity._sub_l2_int(sub, books[s][j])
                for j in range(K)
            ]
        )
        total = total + F.element_at(
            dists, F.col("pq_code")[s].cast("int") + 1
        )
    return enc.select(F.avg(total).alias("d")).head()["d"]


def test_adc_equals_exact_lut_recompute(spark):
    """pq_adc_topk's LUT distance must equal a direct per-row
    recomputation of ||q_sub - c_code||^2 sums."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 200)
    books = similarity.static_pq_codebooks(DIM, M, K)
    qvec = list(
        emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    )
    got = {
        r["vec_id"]: r["pq_dist"]
        for r in similarity.pq_adc_topk(emb, books, qvec, k=5).collect()
    }
    # recompute: encode, then sum subspace distances against the
    # integer-quantized query, all in plain Python
    import math

    q = [int(math.floor(x * similarity.PQ_SCALE)) for x in qvec]
    sub_dim = DIM // M
    enc = similarity.pq_encode(emb, books).select(
        "vec_id", "pq_code"
    ).collect()
    exact = {}
    for r in enc:
        d = 0
        for s in range(M):
            c = books[s][r["pq_code"][s]]
            d += sum(
                (q[s * sub_dim + i] - c[i]) ** 2 for i in range(sub_dim)
            )
        exact[r["vec_id"]] = d
    for vid, dist in got.items():
        assert dist == exact[vid]
    assert list(got) == sorted(exact, key=lambda v: (exact[v], v))[:5]


def test_training_reduces_distortion_and_is_deterministic(spark):
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 300)
    static = similarity.static_pq_codebooks(DIM, M, K)
    trained = similarity.train_pq_codebooks(emb, DIM, M, K, iters=2)
    trained2 = similarity.train_pq_codebooks(emb, DIM, M, K, iters=2)
    assert trained == trained2  # deterministic end to end
    d_static = _distortion(spark, emb, static)
    d_trained = _distortion(spark, emb, trained)
    assert d_trained < d_static  # k-means beats arbitrary md5 codebooks
    # bounded driver state: the codebooks themselves are tiny
    assert len(trained) == M and all(len(b) == K for b in trained)


def test_arrow_encode_identical_to_expression_encode(spark):
    """The numpy write-side encoder must produce bit-identical codes
    to the oracle-checked expression path (same integer domain, same
    first-index tie-break)."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 300)
    books = similarity.static_pq_codebooks(DIM, M, K)
    expr_codes = {
        r["vec_id"]: list(r["pq_code"])
        for r in similarity.pq_encode(emb, books)
        .select("vec_id", "pq_code")
        .collect()
    }
    arrow_codes = {
        r["vec_id"]: list(r["pq_code"])
        for r in similarity.pq_encode_arrow(emb, books).collect()
    }
    assert arrow_codes == expr_codes and len(arrow_codes) == 300


def test_ivf_pq_pipeline(spark):
    """IVF+PQ composition: all-cells probing must equal the plain ADC
    ranking (IVF only prunes); fewer probes scan a subset."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 300)
    books = similarity.static_pq_codebooks(DIM, M, K)
    cents = similarity.train_centroids(emb, n_cells=4, dim=DIM, iters=1)
    qvec = list(
        emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    )
    index = similarity.ivf_pq_index(emb, cents, books).persist()
    full = similarity.pq_adc_topk(emb, books, qvec, k=10).collect()
    all_probes = similarity.ivf_pq_topk(
        index, cents, books, qvec, k=10, n_probes=4
    ).collect()
    assert [(r["vec_id"], r["pq_dist"]) for r in all_probes] == [
        (r["vec_id"], r["pq_dist"]) for r in full
    ]
    one_probe = similarity.ivf_pq_topk(
        index, cents, books, qvec, k=10, n_probes=1
    ).collect()
    assert 0 < len(one_probe) <= 10
    # one-probe results are a subset of the index, ranked consistently
    dists = [r["pq_dist"] for r in one_probe]
    assert dists == sorted(dists)
    index.unpersist()


def test_null_and_short_embeddings_get_null_codes_and_rank_last(spark):
    """A null or too-short embedding must encode to NULL codes and a
    null ADC distance ranked after every real neighbor — array_min's
    struct ordering would otherwise silently elect centroid 0 with a
    spurious finite distance."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 50)
    books = similarity.static_pq_codebooks(DIM, M, K)
    bad = spark.createDataFrame(
        [(9001, None), (9002, [1.0, 2.0, 3.0])],
        schema=emb.select("vec_id", "embedding").schema,
    )
    df = emb.select("vec_id", "embedding").unionByName(bad)
    enc = similarity.pq_encode(df, books)
    codes = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
    assert codes[9001] is None and codes[9002] is None
    assert all(c is not None for v, c in codes.items() if v < 50)

    qvec = [0.0] * DIM
    top = similarity.pq_adc_topk(df, books, qvec, k=52).collect()
    assert len(top) == 52
    # the two invalid rows rank last with null distance
    assert {r["vec_id"] for r in top[-2:]} == {9001, 9002}
    assert all(r["pq_dist"] is None for r in top[-2:])
    assert all(r["pq_dist"] is not None for r in top[:-2])


def test_residual_index_codes_match_expression_residual_encode(spark):
    """Bridge the two residual paths: the Arrow index builder's
    residual codes must equal pq_encode over residual_vectors'
    expression-side residuals (same int domain, same argmin)."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 200)
    cents = similarity.train_centroids(emb, n_cells=4, dim=DIM, iters=1)
    books = similarity.static_pq_codebooks(DIM, M, K)
    idx = {
        r["vec_id"]: (r["_cell"], list(r["pq_code"]))
        for r in similarity.ivf_pq_index(
            emb, cents, books, residual=True
        ).collect()
    }
    res = similarity.residual_vectors(emb, cents)
    expr = {
        r["vec_id"]: (r["_cell"], list(r["pq_code"]))
        for r in similarity.pq_encode(
            res, books, vec_col="residual"
        ).select("vec_id", "_cell", "pq_code").collect()
    }
    assert idx == expr and len(idx) == 200


def test_residual_adc_distance_equals_numpy_recompute(spark):
    """Residual ADC: per-cell LUT dispatch must equal a direct numpy
    recomputation of sum_s ||floor((q - c_cell)*S)_sub_s - cb[code_s]||^2."""
    import numpy as np

    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 150)
    cents = similarity.train_centroids(emb, n_cells=3, dim=DIM, iters=1)
    books = similarity.static_pq_codebooks(DIM, M, K)
    idx = similarity.ivf_pq_index(emb, cents, books, residual=True)
    rows = {r["vec_id"]: r for r in idx.collect()}
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 7).head()["embedding"]
    ]
    got = {
        r["vec_id"]: r["pq_dist"]
        for r in similarity.ivf_pq_topk(
            idx, cents, books, qvec, k=150, n_probes=3, residual=True
        ).collect()
    }
    sub = DIM // M
    cents_np = np.asarray(cents)
    q = np.asarray(qvec)
    for vid, r in rows.items():
        qi = np.floor(
            (q - cents_np[r["_cell"]]) * similarity.PQ_SCALE
        ).astype(np.int64)
        want = sum(
            int(
                np.sum(
                    (
                        qi[s * sub : (s + 1) * sub]
                        - np.asarray(books[s][r["pq_code"][s]])
                    )
                    ** 2
                )
            )
            for s in range(M)
        )
        assert got[vid] == want, vid


def test_residual_rerank_recall_not_worse_than_raw_on_clusters(spark):
    """The point of residual encoding: on clustered data, residual
    ADC shortlists must rank true neighbors at least as well as
    raw-vector ADC at the same probe/shortlist budget."""
    import numpy as np

    rng = np.random.RandomState(77)
    n, dim, n_cells = 1500, 32, 12
    centers = rng.randn(n_cells, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.randint(0, n_cells, size=n)] + 0.15 * rng.randn(
        n, dim
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id bigint, embedding array<double>",
    ).persist()
    cents = similarity.train_centroids(df, n_cells=n_cells, dim=dim, iters=2)
    raw_books = similarity.train_pq_codebooks(df, dim=dim, m=4, k=16, iters=2)
    res_books = similarity.train_pq_codebooks(
        similarity.residual_vectors(df, cents),
        dim=dim, m=4, k=16, iters=2, vec_col="residual",
    )
    raw_idx = similarity.ivf_pq_index(df, cents, raw_books).persist()
    res_idx = similarity.ivf_pq_index(
        df, cents, res_books, residual=True
    ).persist()

    queries = pts[rng.choice(n, 4, replace=False)]
    truth = np.argsort(-(queries @ pts.T), axis=1)[:, :10]
    raw_hits = res_hits = 0
    for qi, q in enumerate(queries):
        t = set(truth[qi].tolist())
        raw_hits += len(t & {
            r["vec_id"]
            for r in similarity.ann_shortlist_rerank(
                df, raw_idx, cents, raw_books, q.tolist(),
                k=10, shortlist=40, n_probes=2,
            ).collect()
        })
        res_hits += len(t & {
            r["vec_id"]
            for r in similarity.ann_shortlist_rerank(
                df, res_idx, cents, res_books, q.tolist(),
                k=10, shortlist=40, n_probes=2, residual=True,
            ).collect()
        })
    raw_idx.unpersist(); res_idx.unpersist(); df.unpersist()
    assert res_hits >= raw_hits, (res_hits, raw_hits)


def test_arrow_paths_skip_invalid_vectors_instead_of_crashing(spark):
    """np.stack over a None/ragged row crashed all three Arrow-batched
    paths (index build, arrow top-k, arrow encode); invalid vectors
    are now filtered with a documented contract."""
    bad = spark.createDataFrame(
        [(1, [0.1] * DIM), (2, None), (3, [1.0, 2.0])],
        "vec_id bigint, embedding array<double>",
    )
    books = similarity.static_pq_codebooks(DIM, M, K)
    cents = [[0.0] * DIM, [0.1] * DIM]
    assert [
        r["vec_id"]
        for r in similarity.ivf_pq_index(bad, cents, books).collect()
    ] == [1]
    assert [
        r["vec_id"]
        for r in similarity.brute_force_topk_arrow(
            bad, [0.1] * DIM, k=3
        ).collect()
    ] == [1]
    assert [
        r["vec_id"]
        for r in similarity.pq_encode_arrow(bad, books).collect()
    ] == [1]


def test_residual_adc_arrow_equals_expression_path(spark):
    """The Arrow residual-ADC scorer (janino-cliff escape hatch,
    SCALE.md r11) must produce the SAME (vec_id, pq_dist) ranking as
    the codegen'd CASE dispatch — both forced explicitly, k large
    enough to cover every probed row so the whole scoring surface is
    compared, not just the head."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 200)
    cents = similarity.train_centroids(emb, n_cells=4, dim=DIM, iters=1)
    books = similarity.static_pq_codebooks(DIM, M, K)
    idx = similarity.ivf_pq_index(emb, cents, books, residual=True)
    idx = idx.persist()
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 11).head()["embedding"]
    ]
    expr_rows = [
        (r["vec_id"], r["pq_dist"])
        for r in similarity.ivf_pq_topk(
            idx, cents, books, qvec, k=200, n_probes=4,
            residual=True, use_arrow=False,
        ).collect()
    ]
    arrow_rows = [
        (r["vec_id"], r["pq_dist"])
        for r in similarity.ivf_pq_topk(
            idx, cents, books, qvec, k=200, n_probes=4,
            residual=True, use_arrow=True,
        ).collect()
    ]
    idx.unpersist()
    assert expr_rows == arrow_rows and len(expr_rows) == 200


def test_residual_adc_auto_threshold_routes_big_dispatch_to_arrow(spark):
    """Auto mode: small LUT dispatches stay on the expression path;
    one whose element_at lookups exceed RESIDUAL_ADC_EXPR_MAX_LOOKUPS
    route through mapInPandas (ArrowEvalPython / MapInPandas in the
    plan), because the CASE chain is measured to blow janino's 64 KB
    method limit at realistic probe counts."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 100)
    cents = similarity.train_centroids(emb, n_cells=4, dim=DIM, iters=1)
    books = similarity.static_pq_codebooks(DIM, M, K)
    # localCheckpoint truncates lineage: the index BUILD is itself a
    # mapInPandas and would otherwise appear in every query plan
    idx = similarity.ivf_pq_index(
        emb, cents, books, residual=True
    ).localCheckpoint(eager=True)
    qvec = [0.1] * DIM

    small = similarity.ivf_pq_topk(
        idx, cents, books, qvec, k=5, n_probes=2, residual=True
    )
    assert "mapinpandas" not in small._jdf.queryExecution().executedPlan(
    ).toString().lower()

    import cybersecurity_miw_spark.operators.similarity as sim
    orig = sim.RESIDUAL_ADC_EXPR_MAX_LOOKUPS
    sim.RESIDUAL_ADC_EXPR_MAX_LOOKUPS = 1  # force "big dispatch"
    try:
        big = similarity.ivf_pq_topk(
            idx, cents, books, qvec, k=5, n_probes=2, residual=True
        )
        plan = big._jdf.queryExecution().executedPlan().toString().lower()
        assert "mapinpandas" in plan
    finally:
        sim.RESIDUAL_ADC_EXPR_MAX_LOOKUPS = orig
    # and the two modes agree on the result
    assert [tuple(r) for r in small.collect()] == [
        tuple(r) for r in big.collect()
    ]


def test_train_pq_codebooks_arrow_equals_expression(spark):
    """The Arrow-assigned training path (janino escape for production
    codebook sizes) must train IDENTICAL books to the expression
    path: codes are bit-identical per iteration, sums/counts and the
    floor-div update are shared, so the books cannot diverge."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 300)
    expr_books = similarity.train_pq_codebooks(
        emb, DIM, M, K, iters=2, use_arrow=False
    )
    arrow_books = similarity.train_pq_codebooks(
        emb, DIM, M, K, iters=2, use_arrow=True
    )
    assert arrow_books == expr_books


def test_residual_adc_arrow_null_code_element_matches_expression(spark):
    """A pq_code array whose LENGTH is right but which contains a
    null ELEMENT must rank at NULL distance (nulls last) on BOTH
    paths — the Arrow batch previously crashed in np.stack/astype
    while the expression path degraded gracefully (r11 ADVICE)."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 50)
    cents = similarity.train_centroids(emb, n_cells=2, dim=DIM, iters=1)
    books = similarity.static_pq_codebooks(DIM, M, K)
    idx = similarity.ivf_pq_index(emb, cents, books, residual=True)
    corrupt = F.expr(
        "transform(pq_code, (x, i) -> "
        "case when i = 0 then cast(null as int) else cast(x as int) end)"
    )
    idx = idx.withColumn(
        "pq_code",
        F.when(F.col("vec_id") == 1, corrupt).otherwise(
            F.col("pq_code").cast("array<int>")
        ),
    ).persist()
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 11).head()["embedding"]
    ]
    kwargs = dict(k=50, n_probes=2, residual=True)
    expr_rows = [
        (r["vec_id"], r["pq_dist"])
        for r in similarity.ivf_pq_topk(
            idx, cents, books, qvec, use_arrow=False, **kwargs
        ).collect()
    ]
    arrow_rows = [
        (r["vec_id"], r["pq_dist"])
        for r in similarity.ivf_pq_topk(
            idx, cents, books, qvec, use_arrow=True, **kwargs
        ).collect()
    ]
    idx.unpersist()
    assert expr_rows == arrow_rows
    by_id = dict(expr_rows)
    assert by_id[1] is None          # corrupt row present, NA distance
    assert expr_rows[-1][0] == 1     # and it sorts last
