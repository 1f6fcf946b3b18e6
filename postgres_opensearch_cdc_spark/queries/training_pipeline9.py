"""Training-data pipeline batch 9 (round 13): HLL set-intersection
estimation, Neyman-allocated stratified sampling, and maximum-inner-
product search via the augmented-cosine reduction — three more
published dataset-construction stages (absent from the reference;
SURVEY §2.7 extension class alongside batches 1-8).

Why these three:
- HLL intersection (inclusion-exclusion over mergeable registers):
  the union of two HLL sketches is the elementwise register max — the
  mergeability the streaming rollup already pins — so
  |A∩B| ≈ est(A) + est(B) − est(A∪B) prices cross-source vocabulary
  overlap from 2·m int64s per source, no re-scan. The estimate can go
  negative on near-disjoint sets (clamped at 0; the known caveat of
  inclusion-exclusion on sketches, which is why KMV's direct Jaccard
  (sketch_kmv_overlap) coexists with it — together they are the two
  standard ways pipelines price dedup/contamination before paying
  for the exact join).
- Neyman allocation (Neyman 1934): the optimal fixed-budget split of
  a stratified sample, n_h ∝ N_h·S_h — strata that are bigger OR more
  variable get more of the budget. The quality-audit sampler every
  dataset card's "manual review sample" should use instead of uniform
  per-stratum quotas. Draws are derandomized through hash60 ranks
  (the sample_weighted_topk precedent), so the released sample is
  value-checked row for row.
- MIPS via the augmented-vector reduction (Bachrach et al. RecSys'14;
  Shrivastava & Li NIPS'14): inner product is not a metric (no
  triangle inequality), so cosine/L2 ANN machinery cannot serve
  recommendation-style scoring directly; appending
  sqrt(M² − ‖x‖²) to every data vector (M = max norm) and 0 to the
  query makes augmented cosine ORDER-IDENTICAL to inner product —
  after which every ANN index in functions/similarity.py applies
  unchanged. The entry materializes the augmented vectors explicitly
  and outputs both scores, so the oracle value-checks the reduction
  itself, not just the final ranking.

Determinism contract: register tables and hash ranks are pure-int64
hash60 arithmetic; the stratum variance runs on exact decimal128
moment sums (the _regression_sums idiom — n_chars² sums overflow
int64 past ~10^10 docs); every float is a single expression on
identical integers or a left-fold dot product in list order
(list_dot_product parity proven by the ANN entries since round 7),
compared at the harness's 6dp.

Scale shapes:
- HLL intersection: one distinct scan → fixed-size register agg;
  the pairwise stage touches m rows per source pair (broadcastable),
  never vocab-sized data. The exact audit join is the thing the
  sketch replaces.
- Neyman: one moment agg (strata-bounded output) broadcast back; the
  draw is a per-stratum rank window — partition-parallel across
  strata; a single giant stratum would need the two-phase rank
  (functions/ranking.py), noted in the docstring.
- MIPS: max-norm is a 1-row stat crossJoin (broadcast); scoring is a
  scan projection finished by TakeOrderedAndProject — no shuffle,
  the ann_cosine_topk shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from postgres_opensearch_cdc_spark.functions.dedup import hash60
from postgres_opensearch_cdc_spark.functions.similarity import (
    _vec_lit,
    cosine,
    dot,
    l2_norm,
)
from postgres_opensearch_cdc_spark.functions.sketch import (
    HLL_ALPHA,
    HLL_M,
    HLL_RHO_MAX,
    HLL_SUFFIX_BITS,
    hll_estimates,
    hll_registers,
)
from postgres_opensearch_cdc_spark.registry import load_table

_TOKS_SQL = r"regexp_split_to_array(lower(text), '\s+')"
_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# HLL set-intersection estimation (inclusion-exclusion over registers)
# ---------------------------------------------------------------------------


def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary-intersection estimates from per-source
    HLL registers: for each source pair, est(A∪B) is evaluated over
    the ELEMENTWISE MAX of the two register tables (the mergeability
    contract in anger — no rescan), and
    inter_est = max(est(A) + est(B) − est(A∪B), 0). Audited against
    the exact intersection count (the vocab-sized join the sketch
    replaces). All register math is exact int64; each estimate is the
    standard two-branch estimator (functions/sketch.hll_estimates)
    over identical integers in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    dv = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
        )
        .filter(F.length("w") > 0)
        .distinct()
        .localCheckpoint(eager=True)  # feeds registers AND exact audit
    )
    regs = hll_registers(dv, group_col="source").localCheckpoint(
        eager=True
    )  # (g, bucket, register) — read three times below
    single = hll_estimates(regs).select(
        "g", F.col("hll_est").alias("est")
    )
    srcs = regs.select("g").distinct()
    pairs = srcs.select(F.col("g").alias("a")).join(
        srcs.select(F.col("g").alias("b")), F.col("a") < F.col("b")
    )
    union_regs = (
        pairs.join(regs.withColumnRenamed("g", "a"), "a")
        .select("a", "b", "bucket", "register")
        .unionByName(
            pairs.join(regs.withColumnRenamed("g", "b"), "b")
            .select("a", "b", "bucket", "register")
        )
        .groupBy("a", "b", "bucket")
        .agg(F.max("register").alias("register"))
    )
    est_u = hll_estimates(union_regs, group_cols=["a", "b"]).select(
        "a", "b", F.col("hll_est").alias("est_union")
    )
    xa = dv.select(F.col("source").alias("a"), "w")
    xb = dv.select(F.col("source").alias("b"), "w")
    inter = (
        xa.join(xb, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ea, eb = F.col("ea.est"), F.col("eb.est")
    return (
        pairs.join(single.alias("ea"), F.col("a") == F.col("ea.g"))
        .join(single.alias("eb"), F.col("b") == F.col("eb.g"))
        .join(est_u, ["a", "b"])
        .join(inter, ["a", "b"], "left")
        .select(
            F.col("a").alias("source_a"),
            F.col("b").alias("source_b"),
            F.coalesce("n_inter", F.lit(0)).alias("n_exact_inter"),
            F.round(ea, 6).alias("est_a"),
            F.round(eb, 6).alias("est_b"),
            F.round("est_union", 6).alias("est_union"),
            F.round(
                F.greatest(ea + eb - F.col("est_union"), F.lit(0.0)), 6
            ).alias("inter_est"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Neyman-allocated stratified sampling
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 100
NEYMAN_SALT = "neyman-r13"


def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified review sample with Neyman allocation over language
    strata: n_h = min(N_h, max(1, floor(K · N_h·S_h / Σ N_h·S_h)))
    where S_h is the population std dev of n_chars — the optimal
    fixed-budget allocation (variance-heavy strata get more rows).
    Stratum moments run on exact decimal128 sums (Σ n_chars² overflows
    int64 past ~10^10 docs — the vocab_zipf_fit lesson); N·S is
    quantized to integer micro-units BEFORE the cross-strata sum so
    the denominator is order-independent; the draw ranks docs inside
    each stratum by hash60(doc_id:salt) — deterministic, so the
    released sample itself is value-checked. The rank window is
    partitioned by stratum (parallel across strata; a single
    corpus-sized stratum would take the two-phase rank from
    functions/ranking.py instead)."""
    docs = load_table(spark, sf_dir, "documents")
    moments = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (F.col("n_chars") * F.col("n_chars")).cast("decimal(38,0)")
        ).alias("s2"),
    )
    nd = F.col("n_docs").cast("decimal(38,0)")
    var = (nd * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (
        F.col("n_docs").cast("double") * F.col("n_docs")
    )
    weighted = moments.select(
        "lang",
        "n_docs",
        # S_h quantized ALONE to integer micro-units (fits int64 for
        # any real char-length spread), then the N_h product runs in
        # decimal128 — the weight sum is exact and order-independent
        # at any corpus size
        (
            F.col("n_docs").cast("decimal(38,0)")
            * F.floor(
                F.lit(10 ** 6) * F.sqrt(F.greatest(var, F.lit(0.0)))
            ).cast("decimal(38,0)")
        ).alias("w_q"),
    )
    total = weighted.agg(
        F.sum("w_q").alias("w_tot"),
        F.count(F.lit(1)).alias("n_strata"),
    )
    # w_tot = 0 (every stratum zero-variance) degenerates Neyman to
    # the equal split — guarded explicitly: an unguarded 0/0 NaN
    # flows through floor/least DIFFERENTLY in each engine
    share = F.when(
        F.col("w_tot") > 0,
        F.floor(
            F.lit(NEYMAN_BUDGET)
            * F.col("w_q").cast("double")
            / F.col("w_tot").cast("double")
        ),
    ).otherwise(
        F.floor(F.lit(NEYMAN_BUDGET) / F.col("n_strata"))
    )
    alloc = weighted.crossJoin(F.broadcast(total)).select(
        "lang",
        F.least(
            F.col("n_docs"), F.greatest(F.lit(1), share)
        ).cast("long").alias("alloc"),
    )
    ranked = docs.select(
        "lang",
        "doc_id",
        hash60(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.lit(NEYMAN_SALT),
            )
        ).alias("h"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy("h", "doc_id")
        ),
    )
    return (
        ranked.join(F.broadcast(alloc), "lang")
        .filter(F.col("rk") <= F.col("alloc"))
        .select("lang", "doc_id", "rk", "alloc")
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# Maximum-inner-product top-k via the augmented-cosine reduction
# ---------------------------------------------------------------------------

MIPS_K = 10


def ann_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-MIPS_K vectors by INNER PRODUCT against vector 0, served
    through the augmented-cosine reduction: x̃ = [x, sqrt(M²−‖x‖²)]
    (M = max data norm, a 1-row broadcast stat), q̃ = [q, 0] — then
    cos(x̃, q̃) = ⟨x,q⟩ / (M·‖q‖), monotone in the inner product, so
    cosine machinery (and every ANN index built on it) serves MIPS
    unchanged. The augmented vectors are materialized explicitly and
    BOTH scores are output, so the oracle checks the reduction, not
    just the final order. Plan: scan projection →
    TakeOrderedAndProject — no shuffle (the ann_cosine_topk shape)."""
    vecs = load_table(spark, sf_dir, "embeddings")
    qrow = vecs.filter(F.col("vec_id") == 0).select("embedding").head()
    if qrow is None:
        raise ValueError(
            "ann_mips_topk: query vector vec_id=0 not found in "
            f"{sf_dir}/embeddings"
        )
    q = [float(x) for x in qrow[0]]
    # ONE driver call: F.lit(list) expands to array(*[lit(x) ...]) —
    # one py4j round-trip per element — so the literal goes out as a
    # single-parse SQL string instead (similarity._vec_lit; ADVICE r14)
    qlit = _vec_lit([float(x) for x in q])
    data = vecs.filter(F.col("vec_id") != 0).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    norms = data.select("vec_id", "v", l2_norm(F.col("v")).alias("nv"))
    mx = norms.agg(F.max("nv").alias("m_norm"))
    aug = norms.crossJoin(F.broadcast(mx)).select(
        "vec_id",
        "v",
        F.concat(
            "v",
            F.array(
                F.sqrt(
                    F.greatest(
                        F.col("m_norm") * F.col("m_norm")
                        - F.col("nv") * F.col("nv"),
                        F.lit(0.0),
                    )
                )
            ),
        ).alias("va"),
    )
    qa = F.array(*([F.lit(x) for x in q] + [F.lit(0.0)]))
    return (
        aug.select(
            "vec_id",
            F.round(dot(F.col("v"), qlit), 6).alias("mip"),
            F.round(cosine(F.col("va"), qa), 6).alias("mips_cos"),
        )
        .orderBy(F.col("mips_cos").desc(), "vec_id")
        .limit(MIPS_K)
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection
# ---------------------------------------------------------------------------

KCENTER_K = 8


def _d2_to(vcol, center: list[float]):
    """Squared L2 distance to a literal center, written as
    dot(v,v) − 2·dot(v,c) + dot(c,c) — the SAME expression shape the
    oracle uses (list_dot_product parity), so the argmax each round
    compares bit-identical doubles in both engines. The c·c term is a
    Python left fold over the same float64s (identical to the
    engines' sequential dot)."""
    # ONE driver call per round via the single-parse SQL literal —
    # F.lit(list) would pay one py4j round-trip per element (ADVICE r14)
    clit = _vec_lit([float(x) for x in center])
    cc = 0.0
    for x in center:
        cc += x * x
    return dot(vcol, vcol) - F.lit(2.0) * dot(vcol, clit) + F.lit(cc)


def kcenter_select(vecs: DataFrame, k: int) -> list[tuple]:
    """The greedy k-center loop over a (vec_id, v: array<double>)
    frame: K−1 rounds, each one scan-projection (fold one
    literal-center distance into the running min-distance column)
    plus a 1-row TakeOrdered argmax collect. Returns
    [(round, vec_id, radius)].

    Driver-roundtrip bound (round-13 verdict ask #5): the loop is
    inherently K SEQUENTIAL Spark jobs — wall time is
    K · (scan(n)/parallelism + job latency), so cost is LINEAR in K
    with a per-round floor of one job submission (~0.1-0.2 s on this
    box; measured curve in SCALE §26 via tools/bench_kcenter_scale.py)
    and linear in corpus size only through the scan term, which is
    why the curve is flat-ish until n/parallelism dominates. Sound to
    K ≈ 100; past that the job-latency floor (K · ~0.15 s) is the
    bound, and the published escape hatch is over-sampling per round
    (afk-mc²/k-center++: sample m candidates per round, pick the
    farthest — K/m rounds at slightly weaker guarantees), the same
    trade the CC large-star/small-star precedent documents."""
    first = vecs.orderBy("vec_id").limit(1).head()
    if first is None:
        raise ValueError("kcenter_select: input is empty")
    centers = [(0, first["vec_id"], None)]
    c = [float(x) for x in first["v"]]
    state = (
        vecs.filter(F.col("vec_id") != first["vec_id"])
        .select("vec_id", "v", _d2_to(F.col("v"), c).alias("mind"))
        .localCheckpoint(eager=True)
    )
    for t in range(1, k):
        pick = state.orderBy(F.col("mind").desc(), "vec_id").limit(1).head()
        if pick is None:
            raise ValueError(
                f"kcenter_select: ran out of vectors at round {t} "
                f"(need at least k={k} rows)"
            )
        centers.append((t, pick["vec_id"], float(pick["mind"])))
        c = [float(x) for x in pick["v"]]
        state = (
            state.filter(F.col("vec_id") != pick["vec_id"])
            .select(
                "vec_id",
                "v",
                F.least("mind", _d2_to(F.col("v"), c)).alias("mind"),
            )
            .localCheckpoint(eager=True)
        )
    return centers


def coreset_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding table (Gonzalez
    1985 2-approximation; the diversity-based data-selection stage of
    Sener & Savarese ICLR'18): start from the lowest vec_id, then
    KCENTER_K−1 times pick the vector FARTHEST from the chosen set
    (ties → lower vec_id) and fold its distance into the running
    min-distance column. Output: (sel_round, vec_id, radius) — the
    radius sequence is the coverage guarantee a dataset card reports
    (every vector sits within radius_t of the first t+1 centers).

    Scale shape: see kcenter_select (K sequential bounded-collect
    jobs; measured K / corpus curves in SCALE §26). The oracle
    unrolls the identical rounds as materialized CTEs — selection
    order and radii are value-checked, not just the final set."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    try:
        centers = kcenter_select(vecs, KCENTER_K)
    except ValueError as e:
        raise ValueError(
            f"coreset_kcenter_greedy over {sf_dir}/embeddings: {e}"
        ) from e
    out = spark.createDataFrame(
        centers, "sel_round int, vec_id long, radius double"
    )
    return out.select(
        "sel_round", "vec_id", F.round("radius", 6).alias("radius")
    ).orderBy("sel_round")


# ---------------------------------------------------------------------------
# Quality-labeler agreement (Cohen's kappa)
# ---------------------------------------------------------------------------

KAPPA_Q_THRESHOLD = 0.5


def quality_label_agreement_kappa(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between the corpus's two independent
    quality labelers — the Gopher rule bundle (quality_gopher_rules'
    integer-exact flags) and the composite quality_score threshold
    (the portable heuristic dedup_quality_survivors value-checks) —
    the standard audit before trusting either filter: high agreement
    means the cheap score can gate what the rule bundle would, low
    agreement means the filters disagree on WHICH docs to drop and a
    human sample is due (sample_neyman_allocation is the sampler).
    Confusion counts are exact int64 from one scan; po/pe/kappa are
    single float expressions on those counts (cross products cast to
    double first — n² overflows int64 past ~3·10^9 docs)."""
    from postgres_opensearch_cdc_spark.functions import text as textfn
    from postgres_opensearch_cdc_spark.queries.training_pipeline4 import (
        gopher_flags,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    flags = gopher_flags(textfn.tokens(F.col("text")))
    a = (
        ~(
            flags["f_wc"] | flags["f_mwl"]
            | flags["f_ttr"] | flags["f_dom"]
        )
    ).cast("long")
    b = (
        textfn.quality_score(F.col("text"))
        >= F.lit(KAPPA_Q_THRESHOLD)
    ).cast("long")
    cells = docs.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / nd
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01"))
        + (F.col("n00") + F.col("n10")).cast("double")
        * (F.col("n00") + F.col("n01"))
    ) / (nd * nd)
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe))
    return cells.select(
        F.col("n").alias("n_docs"),
        F.col("n11").alias("n_both_pass"),
        F.col("n00").alias("n_both_fail"),
        F.col("n10").alias("n_rules_only"),
        F.col("n01").alias("n_score_only"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("chance_agreement"),
        F.round(kappa, 6).alias("kappa"),
    )


QUERIES = {
    "sketch_hll_intersection": sketch_hll_intersection,
    "sample_neyman_allocation": sample_neyman_allocation,
    "ann_mips_topk": ann_mips_topk,
    "coreset_kcenter_greedy": coreset_kcenter_greedy,
    "quality_label_agreement_kappa": quality_label_agreement_kappa,
}


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

_HLL_INTER_SQL = f"""
    WITH dv AS MATERIALIZED (
        SELECT DISTINCT source, w FROM (
            SELECT source, unnest({_TOKS_SQL}) AS w FROM documents
        ) WHERE length(w) > 0
    ),
    cells AS (
        SELECT source,
               h // {1 << HLL_SUFFIX_BITS} AS bucket,
               CASE WHEN h % {1 << HLL_SUFFIX_BITS} = 0
                    THEN {HLL_RHO_MAX}
                    ELSE {HLL_RHO_MAX}
                         - length(ltrim(bin(h % {1 << HLL_SUFFIX_BITS}), '0'))
               END AS rho
        FROM (SELECT source, {_H60.format(x='w')} AS h FROM dv)
    ),
    regs AS MATERIALIZED (
        SELECT source, bucket, MAX(rho) AS register
        FROM cells GROUP BY 1, 2
    ),
    est AS (
        SELECT source,
               CASE WHEN raw_est <= {2.5 * HLL_M} AND zeros > 0
                    THEN {float(HLL_M)} * ln({float(HLL_M)} / zeros)
                    ELSE raw_est END AS est
        FROM (
            SELECT source,
                   {HLL_ALPHA * HLL_M * HLL_M} * {float(1 << HLL_RHO_MAX)}
                       / (CAST(SUM(1::BIGINT << ({HLL_RHO_MAX} - register))
                               + ({HLL_M} - COUNT(*))
                                 * (1::BIGINT << {HLL_RHO_MAX}) AS BIGINT))
                       AS raw_est,
                   {HLL_M} - COUNT(*) AS zeros
            FROM regs GROUP BY source
        )
    ),
    pairs AS (
        SELECT a.source AS a, b.source AS b
        FROM (SELECT DISTINCT source FROM regs) a
        JOIN (SELECT DISTINCT source FROM regs) b ON a.source < b.source
    ),
    uregs AS (
        SELECT a, b, bucket, MAX(register) AS register FROM (
            SELECT p.a, p.b, r.bucket, r.register
            FROM pairs p JOIN regs r ON r.source = p.a
            UNION ALL
            SELECT p.a, p.b, r.bucket, r.register
            FROM pairs p JOIN regs r ON r.source = p.b
        ) GROUP BY 1, 2, 3
    ),
    uest AS (
        SELECT a, b,
               CASE WHEN raw_est <= {2.5 * HLL_M} AND zeros > 0
                    THEN {float(HLL_M)} * ln({float(HLL_M)} / zeros)
                    ELSE raw_est END AS est_union
        FROM (
            SELECT a, b,
                   {HLL_ALPHA * HLL_M * HLL_M} * {float(1 << HLL_RHO_MAX)}
                       / (CAST(SUM(1::BIGINT << ({HLL_RHO_MAX} - register))
                               + ({HLL_M} - COUNT(*))
                                 * (1::BIGINT << {HLL_RHO_MAX}) AS BIGINT))
                       AS raw_est,
                   {HLL_M} - COUNT(*) AS zeros
            FROM uregs GROUP BY a, b
        )
    ),
    inter AS (
        SELECT x.source AS a, y.source AS b, COUNT(*) AS n_inter
        FROM dv x JOIN dv y ON x.w = y.w AND x.source < y.source
        GROUP BY 1, 2
    )
    SELECT p.a AS source_a, p.b AS source_b,
           COALESCE(i.n_inter, 0) AS n_exact_inter,
           ROUND(ea.est, 6) AS est_a,
           ROUND(eb.est, 6) AS est_b,
           ROUND(u.est_union, 6) AS est_union,
           ROUND(greatest(ea.est + eb.est - u.est_union, 0.0), 6)
               AS inter_est
    FROM pairs p
    JOIN est ea ON ea.source = p.a
    JOIN est eb ON eb.source = p.b
    JOIN uest u ON u.a = p.a AND u.b = p.b
    LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
    ORDER BY source_a, source_b
"""

_NEYMAN_SQL = f"""
    WITH moments AS (
        SELECT lang, COUNT(*) AS n_docs,
               SUM(n_chars) AS s1,
               SUM(n_chars * n_chars) AS s2
        FROM documents GROUP BY lang
    ),
    weighted AS (
        SELECT lang, n_docs,
               CAST(n_docs AS HUGEINT)
               * CAST(floor(1000000.0 * sqrt(greatest(
                     CAST(n_docs * s2 - s1 * s1 AS DOUBLE)
                     / (CAST(n_docs AS DOUBLE) * n_docs), 0.0)))
                 AS BIGINT) AS w_q
        FROM moments
    ),
    alloc AS (
        SELECT lang,
               least(n_docs,
                     greatest(1, CASE WHEN w_tot > 0
                                 THEN floor({NEYMAN_BUDGET}
                                            * CAST(w_q AS DOUBLE)
                                            / CAST(w_tot AS DOUBLE))
                                 ELSE floor({NEYMAN_BUDGET}
                                            / CAST(n_strata AS DOUBLE))
                                 END))
                   AS alloc
        FROM weighted,
             (SELECT SUM(w_q) AS w_tot, COUNT(*) AS n_strata
              FROM weighted)
    ),
    ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY h, doc_id
               ) AS rk
        FROM (
            SELECT lang, doc_id,
                   {_H60.format(x=f"doc_id::VARCHAR || ':' || '{NEYMAN_SALT}'")}
                       AS h
            FROM documents
        )
    )
    SELECT r.lang, r.doc_id, r.rk, CAST(a.alloc AS BIGINT) AS alloc
    FROM ranked r JOIN alloc a USING (lang)
    WHERE r.rk <= a.alloc
    ORDER BY lang, rk
"""

_MIPS_SQL = f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ),
    n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) AS nv
        FROM embeddings WHERE vec_id <> 0
    ),
    mx AS (SELECT MAX(nv) AS m_norm FROM n),
    aug AS (
        SELECT vec_id, v,
               list_append(v, sqrt(greatest(
                   m_norm * m_norm - nv * nv, 0.0))) AS va,
               list_append(qv, 0.0) AS qa
        FROM n, mx, q
    )
    SELECT vec_id,
           ROUND(list_dot_product(v, qv), 6) AS mip,
           ROUND(list_dot_product(va, qa)
                 / (sqrt(list_dot_product(va, va))
                    * sqrt(list_dot_product(qa, qa))), 6) AS mips_cos
    FROM aug, q
    ORDER BY mips_cos DESC, vec_id LIMIT {MIPS_K}
"""

def _kcenter_sql(k: int = KCENTER_K) -> str:
    """The greedy rounds unrolled as materialized CTEs (the BPE/LPA
    oracle pattern): d² is the identical
    dot(v,v) − 2·dot(v,c) + dot(c,c) expression, argmax the identical
    (mind DESC, vec_id) order."""
    d2 = (
        "list_dot_product({x}.v, {x}.v)"
        " - 2 * list_dot_product({x}.v, c.v)"
        " + list_dot_product(c.v, c.v)"
    )
    parts = [f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    c0 AS MATERIALIZED (
        SELECT vec_id, v, NULL::DOUBLE AS mind
        FROM e ORDER BY vec_id LIMIT 1
    ),
    m0 AS MATERIALIZED (
        SELECT e.vec_id, e.v, {d2.format(x='e')} AS mind
        FROM e, c0 c WHERE e.vec_id <> c.vec_id
    )"""]
    for t in range(1, k):
        parts.append(f"""
    c{t} AS MATERIALIZED (
        SELECT vec_id, v, mind FROM m{t - 1}
        ORDER BY mind DESC, vec_id LIMIT 1
    ),
    m{t} AS MATERIALIZED (
        SELECT m.vec_id, m.v,
               least(m.mind, {d2.format(x='m')}) AS mind
        FROM m{t - 1} m, c{t} c WHERE m.vec_id <> c.vec_id
    )""")
    selects = [
        f"SELECT {t} AS sel_round, vec_id, ROUND(mind, 6) AS radius "
        f"FROM c{t}"
        for t in range(k)
    ]
    return (
        ",".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY sel_round"
    )


def _kappa_sql() -> str:
    from postgres_opensearch_cdc_spark.queries.training_pipeline4 import (
        GOPHER_FLAG_SQL,
        GOPHER_STATS_SQL_COLS,
    )

    fail = " OR ".join(
        GOPHER_FLAG_SQL[k] for k in ("f_wc", "f_mwl", "f_ttr", "f_dom")
    )
    return f"""
    WITH s AS (
        SELECT {GOPHER_STATS_SQL_COLS},
               ROUND(0.5 * (len(list_distinct(ws)) * 1.0 / len(ws))
                     + 0.5 * least(len(ws) / 100.0, 1.0), 4) AS q
        FROM (SELECT {_TOKS_SQL} AS ws FROM documents)
    ),
    lab AS (
        SELECT CASE WHEN {fail} THEN 0 ELSE 1 END AS a,
               (q >= {KAPPA_Q_THRESHOLD})::INT AS b
        FROM s
    ),
    cells AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(a * b) AS BIGINT) AS n11,
               CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
               CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
               CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM lab
    ),
    agg AS (
        SELECT n, n11, n10, n01, n00,
               (n11 + n00) / CAST(n AS DOUBLE) AS po,
               (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                + CAST(n00 + n10 AS DOUBLE) * (n00 + n01))
               / (CAST(n AS DOUBLE) * n) AS pe
        FROM cells
    )
    SELECT n AS n_docs,
           n11 AS n_both_pass,
           n00 AS n_both_fail,
           n10 AS n_rules_only,
           n01 AS n_score_only,
           ROUND(po, 6) AS observed_agreement,
           ROUND(pe, 6) AS chance_agreement,
           ROUND(CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe) END, 6)
               AS kappa
    FROM agg
"""


ORACLE = {
    "sketch_hll_intersection": _HLL_INTER_SQL,
    "sample_neyman_allocation": _NEYMAN_SQL,
    "ann_mips_topk": _MIPS_SQL,
    "coreset_kcenter_greedy": _kcenter_sql(),
    "quality_label_agreement_kappa": _kappa_sql(),
}
