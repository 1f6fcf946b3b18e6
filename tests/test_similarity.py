"""Similarity-search operators: exact top-k baseline + LSH/IVF scale
paths, on planted geometry so expected neighbors are known."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.similarity import (
    brute_force_topk,
    cosine,
    ivf_assign,
    pairwise_topk_by_label,
    random_hyperplane_buckets,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.01, 0.0], 0),  # ~ vec 0
        (2, [0.0, 1.0, 0.0], 1),
        (3, [0.0, 0.98, 0.02], 1),  # ~ vec 2
        (4, [0.0, 0.0, 1.0], 2),
        (5, [-1.0, 0.0, 0.0], 0),  # opposite of vec 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_math(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], "a array<float>, b array<float>"
    )
    out = [round(r[0], 6) for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert out == [0.0, 1.0]


def test_brute_force_topk_ordering(vectors):
    out = brute_force_topk(
        vectors.filter(F.col("vec_id") != 0), [1.0, 0.0, 0.0], k=3
    ).collect()
    # vec 1 nearly parallel (top); 2/3/4 all orthogonal → tie at 0,
    # broken deterministically by vec_id
    assert [r["vec_id"] for r in out] == [1, 2, 3]
    assert out[0]["cos_sim"] > 0.99


def test_pairwise_topk_by_label(vectors):
    out = pairwise_topk_by_label(vectors, k=1)
    nn = {r["id_a"]: r["id_b"] for r in out.collect()}
    assert nn[0] == 1 and nn[1] == 0
    assert nn[2] == 3 and nn[3] == 2


def test_hyperplane_buckets_separate_opposites(vectors):
    planes = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    b = {r["vec_id"]: r["bucket"] for r in random_hyperplane_buckets(vectors, planes).collect()}
    assert b[0] == b[1]  # near-identical vectors share a bucket
    assert b[0] != b[5]  # opposite vectors do not


def test_ivf_assignment(vectors):
    centroids = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    cells = {r["vec_id"]: r["cell"] for r in ivf_assign(vectors, centroids).collect()}
    assert cells[0] == 0 and cells[1] == 0
    assert cells[2] == 1 and cells[3] == 1
    assert cells[4] == 2


def test_topk_on_real_embeddings(spark, sf_dir):
    from postgres_opensearch_cdc_spark.registry import load_table

    vecs = load_table(spark, sf_dir, "embeddings")
    q = list(vecs.filter(F.col("vec_id") == 0).head()["embedding"])
    out = brute_force_topk(vecs, q, k=5).collect()
    # the query vector itself ranks first with cos ≈ 1
    assert out[0]["vec_id"] == 0
    assert abs(out[0]["cos_sim"] - 1.0) < 1e-6
    sims = [r["cos_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


# ---------------------------------------------------------------------------
# IVF end-to-end: k-means training + nprobe probe, recall contract
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clustered(spark):
    """10 tight cosine clusters (64 vecs of dim 16, sigma=0.05) — the
    data regime IVF is FOR. (The driver's synthetic embeddings table is
    near-uniform on the sphere, where no coarse quantizer can beat
    nprobe/k recall — so the recall contract is asserted here, on
    clusterable geometry.)"""
    import random

    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(10)]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(40):
            rows.append((vid, ci, [x + rng.gauss(0, 0.05) for x in c]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")


def test_kmeans_train_is_deterministic_and_recovers_clusters(clustered):
    from postgres_opensearch_cdc_spark.functions.similarity import ivf_assign, kmeans_train

    c1 = kmeans_train(clustered, k=10, iterations=5, seed=42)
    c2 = kmeans_train(clustered, k=10, iterations=5, seed=42)
    assert c1 == c2  # seeded init + deterministic argmax → stable output
    # trained cells must align with the planted clusters: every
    # non-empty cell is PURE (one label). Lloyd's may split a cluster
    # over two cells (init-dependent) but must never mix clusters in
    # one cell at sigma=0.05 separation.
    assigned = (
        ivf_assign(clustered, c1)
        .join(clustered.select("vec_id", "label"), "vec_id")
        .groupBy("cell")
        .agg(F.count_distinct("label").alias("nlabels"))
        .collect()
    )
    assert assigned and all(r["nlabels"] == 1 for r in assigned)


def test_ivf_recall_at_10(clustered):
    """recall@10 ≥ 0.9 vs the exact brute-force baseline with nprobe=2
    of 10 cells — the IVF usefulness contract."""
    from postgres_opensearch_cdc_spark.functions.similarity import (
        brute_force_topk as bf,
        ivf_topk,
        kmeans_train,
    )

    centroids = kmeans_train(clustered, k=10, iterations=5, seed=42)
    q = clustered.filter(F.col("vec_id") == 0).head()["embedding"]
    rest = clustered.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in bf(rest, q, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(rest, q, centroids, nprobe=2, k=10).collect()}
    assert len(exact & approx) / 10 >= 0.9


def test_kmeans_empty_table_raises(spark):
    from postgres_opensearch_cdc_spark.functions.similarity import kmeans_train

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty vector table"):
        kmeans_train(empty, k=4)


def test_kmeans_init_sample_plan_is_take_ordered(spark, sf_dir):
    """The init sample's orderBy+limit must compile to
    TakeOrderedAndProject (per-partition top-N heaps, no global sort) —
    the property that keeps kmeans init cheap on a 100 TB table."""
    from postgres_opensearch_cdc_spark.registry import load_table

    base = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("_id"), F.col("embedding").alias("v")
    )
    plan = (
        base.orderBy(F.xxhash64(F.col("_id").cast("string"), F.lit(42)), F.col("_id"))
        .limit(200)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_pq_train_deterministic_and_adc_recall(clustered):
    """PQ usefulness contract on clusterable data: the trained codebook
    is seed-deterministic, codes compress to M small ints, and ADC
    recall@10 within the top-50 candidate set ≥ 0.8 vs the exact L2
    baseline (ADC is the candidate generator; production reranks the
    candidate set exactly)."""
    from postgres_opensearch_cdc_spark.functions.similarity import (
        pq_adc_topk,
        pq_codes,
        pq_train,
    )

    cb1 = pq_train(clustered, m=4, k=8, iterations=4, seed=7)
    cb2 = pq_train(clustered, m=4, k=8, iterations=4, seed=7)
    assert cb1 == cb2
    q = [float(x) for x in clustered.filter(F.col("vec_id") == 0).head()["embedding"]]
    rest = clustered.filter(F.col("vec_id") != 0)
    # exact L2 baseline
    lit_q = F.array(*[F.lit(x) for x in q])
    l2 = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            lit_q,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    truth = {
        r["vec_id"]
        for r in rest.select("vec_id", l2.alias("d"))
        .orderBy("d", "vec_id").limit(10).collect()
    }
    cand = {r["vec_id"] for r in pq_adc_topk(rest, q, cb1, k=50).collect()}
    assert len(truth & cand) / 10 >= 0.8
    # codes are within [1, k] — the M-byte-per-vector compression claim
    coded = rest.select(*pq_codes(F.col("embedding"), cb1)).collect()
    for r in coded:
        assert all(1 <= r[f"c{m}"] <= 8 for m in range(4))


def test_ivf_index_build_and_pruned_query(spark, sf_dir, tmp_path):
    """Persisted IVF index: query results equal the in-memory ivf_topk
    for the same centroids, and the candidate scan reads ONLY the
    nprobe probed cells' partition directories."""
    import re

    from postgres_opensearch_cdc_spark.functions.similarity import (
        ivf_index_build,
        ivf_index_topk,
        ivf_topk,
    )
    from postgres_opensearch_cdc_spark.registry import load_table

    vecs = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in vecs.filter("vec_id = 1").head()["embedding"]]
    idx = str(tmp_path / "ivf")
    centroids = ivf_index_build(vecs, idx, k=8, iterations=2, seed=7)

    got = ivf_index_topk(spark, idx, q, nprobe=3, k=10)
    want = ivf_topk(vecs, q, centroids, nprobe=3, k=10)
    assert [
        (r["vec_id"], r["cos_sim"]) for r in got.collect()
    ] == [
        (r["vec_id"], r["cos_sim"]) for r in want.collect()
    ]

    cells = {
        int(m.group(1))
        for f in got.inputFiles()
        if (m := re.search(r"_cell=(\d+)", f))
    }
    assert len(cells) <= 3, f"scan touched {cells} — not partition-pruned"


def test_pq_index_matches_inline_adc(spark, tmp_path):
    """Persisted PQ-codes index: identical results to the inline
    encode+ADC path for the same codebook; queries read only the code
    columns (no embedding column in the scan)."""
    import re

    from postgres_opensearch_cdc_spark.functions.similarity import (
        pq_adc_topk,
        pq_index_adc_topk,
        pq_index_build,
    )
    from postgres_opensearch_cdc_spark.registry import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = [float(x) for x in vecs.filter("vec_id = 0").head()["embedding"]]
    seed_rows = sorted(
        vecs.filter("vec_id BETWEEN 1 AND 16")
        .select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    seeds = [[float(x) for x in r["embedding"]] for r in seed_rows]
    dsub = len(seeds[0]) // 8
    codebook = [[s[m * dsub:(m + 1) * dsub] for s in seeds] for m in range(8)]
    idx = str(tmp_path / "pq")
    corpus = vecs.filter("vec_id <> 0")
    pq_index_build(corpus, idx, codebook)
    got = pq_index_adc_topk(spark, idx, q, k=10)
    want = pq_adc_topk(corpus, q, codebook, k=10)
    assert [(r["vec_id"], r["adc_dist"]) for r in got.collect()] == [
        (r["vec_id"], r["adc_dist"]) for r in want.collect()
    ]
    # the index scan never touches a vector column
    from tests.test_plans import plan

    p = plan(got)
    assert "embedding" not in p and re.search(r"ReadSchema:.*c0", p)
    assert "TakeOrderedAndProject" in p and "Exchange" not in p


def test_index_append_equals_rebuild(spark, tmp_path):
    """Incremental maintenance: build on half the corpus, append the
    rest — queries must return exactly what a from-scratch build over
    the full corpus returns (both IVF and PQ), and appends must not
    rewrite existing files."""
    import glob
    import os

    from postgres_opensearch_cdc_spark.functions.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_topk,
        pq_index_adc_topk,
        pq_index_append,
        pq_index_build,
    )
    from postgres_opensearch_cdc_spark.registry import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = [float(x) for x in vecs.filter("vec_id = 0").head()["embedding"]]
    corpus = vecs.filter("vec_id <> 0")
    first = corpus.filter("vec_id % 2 = 1")
    second = corpus.filter("vec_id % 2 = 0")

    seeds = [
        [float(x) for x in r["embedding"]]
        for r in sorted(
            vecs.filter("vec_id BETWEEN 1 AND 10")
            .select("vec_id", "embedding").collect(),
            key=lambda r: r["vec_id"],
        )
    ]
    inc, full = str(tmp_path / "ivf_inc"), str(tmp_path / "ivf_full")
    ivf_index_build(first, inc, centroids=seeds)
    before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{inc}/_cell=*/*.parquet")
    }
    ivf_index_append(second, inc)
    after = {f: os.path.getmtime(f) for f in before}
    assert after == before, "append rewrote existing files"
    ivf_index_build(corpus, full, centroids=seeds)
    got = [(r["vec_id"], r["cos_sim"])
           for r in ivf_index_topk(spark, inc, q, nprobe=3, k=10).collect()]
    want = [(r["vec_id"], r["cos_sim"])
            for r in ivf_index_topk(spark, full, q, nprobe=3, k=10).collect()]
    assert got == want

    pq_seeds = [
        [float(x) for x in r["embedding"]]
        for r in sorted(
            vecs.filter("vec_id BETWEEN 1 AND 16")
            .select("vec_id", "embedding").collect(),
            key=lambda r: r["vec_id"],
        )
    ]
    dsub = len(pq_seeds[0]) // 8
    cb = [[s[m * dsub:(m + 1) * dsub] for s in pq_seeds] for m in range(8)]
    pinc, pfull = str(tmp_path / "pq_inc"), str(tmp_path / "pq_full")
    pq_index_build(first, pinc, cb)
    pq_index_append(second, pinc)
    pq_index_build(corpus, pfull, cb)
    got = [(r["vec_id"], r["adc_dist"])
           for r in pq_index_adc_topk(spark, pinc, q, k=10).collect()]
    want = [(r["vec_id"], r["adc_dist"])
            for r in pq_index_adc_topk(spark, pfull, q, k=10).collect()]
    assert got == want


def test_ivfpq_index_pruned_codes_only_and_append(spark, tmp_path):
    """Combined IVF+PQ index: the query scan reads ONLY the probed
    cells' partition dirs AND only the code columns (never a vector);
    build-on-half + append-half returns exactly what a full build
    returns (both sidecars frozen)."""
    import glob
    import os
    import re

    from postgres_opensearch_cdc_spark.functions.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_topk,
    )
    from postgres_opensearch_cdc_spark.registry import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = [float(x) for x in vecs.filter("vec_id = 0").head()["embedding"]]
    corpus = vecs.filter("vec_id <> 0")
    centroids = [
        [float(x) for x in r["embedding"]]
        for r in sorted(
            vecs.filter("vec_id BETWEEN 1 AND 10")
            .select("vec_id", "embedding").collect(),
            key=lambda r: r["vec_id"],
        )
    ]
    pq_seeds = [
        [float(x) for x in r["embedding"]]
        for r in sorted(
            vecs.filter("vec_id BETWEEN 1 AND 16")
            .select("vec_id", "embedding").collect(),
            key=lambda r: r["vec_id"],
        )
    ]
    dsub = len(pq_seeds[0]) // 8
    cb = [[s[m * dsub:(m + 1) * dsub] for s in pq_seeds] for m in range(8)]

    full = str(tmp_path / "ivfpq_full")
    ivfpq_index_build(corpus, full, centroids=centroids, codebook=cb)
    got = ivfpq_index_topk(spark, full, q, nprobe=3, k=10)

    # partition pruning: <= nprobe cells in the scan's input files
    cells = {
        int(m.group(1))
        for f in got.inputFiles()
        if (m := re.search(r"_cell=(\d+)", f))
    }
    assert 1 <= len(cells) <= 3, f"scan touched {cells} — not pruned"
    # codes only: no vector column anywhere in the plan; heap finish
    from tests.test_plans import plan

    p = plan(got)
    assert "embedding" not in p and re.search(r"ReadSchema:.*c0", p)
    assert "TakeOrderedAndProject" in p and "Exchange" not in p

    # append ≡ rebuild, no existing file rewritten
    inc = str(tmp_path / "ivfpq_inc")
    ivfpq_index_build(
        corpus.filter("vec_id % 2 = 1"), inc, centroids=centroids, codebook=cb
    )
    before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{inc}/_cell=*/*.parquet")
    }
    ivfpq_index_append(corpus.filter("vec_id % 2 = 0"), inc)
    assert {f: os.path.getmtime(f) for f in before} == before
    got_inc = [(r["vec_id"], r["adc_dist"])
               for r in ivfpq_index_topk(spark, inc, q, nprobe=3, k=10).collect()]
    want = [(r["vec_id"], r["adc_dist"]) for r in got.collect()]
    assert got_inc == want


def test_ivfpq_residual_improves_recall(spark, clustered, tmp_path):
    """by_residual=True (the full FAISS IVFPQ form): codes quantize
    vec - centroid[cell], so the codebook's resolution covers only
    what IVF hasn't explained. On clustered geometry the residual
    index's ADC candidates must recall the exact-L2 top-10 at least
    as well as the raw-encoded index — and well in absolute terms —
    while append ≡ rebuild still holds with residual encoding."""
    from pyspark.sql import functions as F

    from postgres_opensearch_cdc_spark.functions.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_topk,
        kmeans_train,
        pq_train,
    )

    centroids = kmeans_train(clustered, k=10, iterations=5, seed=42)
    cb = pq_train(clustered, m=4, k=8, iterations=4, seed=7)
    q = [float(x) for x in clustered.filter("vec_id = 0").head()["embedding"]]
    rest = clustered.filter("vec_id <> 0")

    lit_q = F.array(*[F.lit(x) for x in q])
    l2 = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            lit_q, lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    truth = {
        r["vec_id"]
        for r in rest.select("vec_id", l2.alias("d"))
        .orderBy("d", "vec_id").limit(10).collect()
    }

    def recall(by_residual, name):
        idx = str(tmp_path / name)
        ivfpq_index_build(rest, idx, centroids=centroids, codebook=cb,
                          by_residual=by_residual)
        cand = {
            r["vec_id"]
            for r in ivfpq_index_topk(spark, idx, q, nprobe=3, k=30).collect()
        }
        return len(truth & cand) / 10

    raw, res = recall(False, "raw"), recall(True, "res")
    assert res >= raw, f"residual {res} < raw {raw}"
    assert res >= 0.9

    # append ≡ rebuild with residual encoding (meta sidecar honored)
    inc = str(tmp_path / "res_inc")
    ivfpq_index_build(rest.filter("vec_id % 2 = 1"), inc,
                      centroids=centroids, codebook=cb, by_residual=True)
    ivfpq_index_append(rest.filter("vec_id % 2 = 0"), inc)
    got = [(r["vec_id"], r["adc_dist"])
           for r in ivfpq_index_topk(spark, inc, q, nprobe=3, k=10).collect()]
    want = [(r["vec_id"], r["adc_dist"])
            for r in ivfpq_index_topk(spark, str(tmp_path / "res"), q,
                                      nprobe=3, k=10).collect()]
    assert got == want


def test_ivfpq_empty_index_query_literal_schema(spark, tmp_path):
    """ADVICE r9: querying an IVFPQ index whose probed cells are all
    empty must return a correctly-typed EMPTY frame from the meta
    sidecar's literal schema — never list/read the index root (an
    index built from zero vectors has no part files to infer from)."""
    from postgres_opensearch_cdc_spark.functions.similarity import (
        ivfpq_index_build,
        ivfpq_index_topk,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    centroids = [[1.0, 0.0], [0.0, 1.0]]
    codebook = [[[0.0], [1.0]], [[0.0], [1.0]]]
    path = str(tmp_path / "idx")
    ivfpq_index_build(empty, path, centroids=centroids, codebook=codebook)
    out = ivfpq_index_topk(spark, path, [1.0, 0.0], nprobe=2, k=5)
    assert out.columns == ["vec_id", "adc_dist"]
    assert out.schema["vec_id"].dataType.simpleString() == "bigint"
    assert out.schema["adc_dist"].dataType.simpleString() == "double"
    assert out.count() == 0


def test_build_parallelism_guard_spreads_single_partition(spark, sf_dir):
    """_ensure_build_parallelism (r14): an under-partitioned build
    input (the single-row-group fixture shape) is repartitioned to the
    session's shuffle parallelism so the encode projection does not run
    single-task; an already well-partitioned input passes through
    untouched (the 100 TB no-op branch)."""
    from postgres_opensearch_cdc_spark.functions.similarity import (
        _ensure_build_parallelism,
    )
    from postgres_opensearch_cdc_spark.registry import load_table

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    narrow = load_table(spark, sf_dir, "embeddings").coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    spread = _ensure_build_parallelism(narrow)
    assert spread.rdd.getNumPartitions() == target

    wide = load_table(spark, sf_dir, "embeddings").repartition(target)
    assert _ensure_build_parallelism(wide) is wide


def test_index_build_results_invariant_to_input_partitioning(
    spark, tmp_path
):
    """The spread is value-neutral: a PQ index built from a 1-partition
    frame answers queries identically to one built from a pre-spread
    frame (indexes are unordered row sets; ADC top-k is deterministic)."""
    import random

    from postgres_opensearch_cdc_spark.functions.similarity import (
        pq_index_adc_topk,
        pq_index_build,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    # frozen 2x4 codebook from the first four vectors' subvectors
    cb = [
        [rows[j][1][m * 4:(m + 1) * 4] for j in range(4)]
        for m in range(2)
    ]
    q = rows[0][1]

    a, b = str(tmp_path / "one"), str(tmp_path / "many")
    pq_index_build(vecs.coalesce(1), a, cb)
    pq_index_build(vecs.repartition(16), b, cb)
    got_a = [(r["vec_id"], r["adc_dist"])
             for r in pq_index_adc_topk(spark, a, q, k=10).collect()]
    got_b = [(r["vec_id"], r["adc_dist"])
             for r in pq_index_adc_topk(spark, b, q, k=10).collect()]
    assert got_a == got_b
