"""Dedup operators with planted duplicates/near-duplicates — semantic
verification for the hash-based operators (both hash families: fast
xxhash64 and portable md5/hash60), plus the exact/jaccard ones."""

from __future__ import annotations

import pytest

from postgres_opensearch_cdc_spark.functions.dedup import (
    exact_dedup,
    hash60,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_hamming_pairs,
    word_shingles,
)

HASHERS = ["xxhash64", "md5"]

BASE = (
    "spark streaming engine maintains a keyed mirror of postgres tables "
    "and answers analytics queries over the mirror with filters and aggregates"
)
NEAR = BASE.replace("analytics", "analytic")  # one-token edit
FAR = "completely different text about cooking pasta with tomatoes and basil leaves in a copper pot"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, NEAR),  # near dup of 1
        (4, FAR),
        (5, "  " + BASE.upper() + "  "),  # whitespace/case variant of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_normalized_variants(docs):
    out = {r["keep_id"]: r["dupe_count"] for r in exact_dedup(docs).collect()}
    # 1,2,5 share a normalized fingerprint; 3 and 4 are singletons
    assert out[1] == 3
    assert out[3] == 1
    assert out[4] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5
    assert not any(4 in p for p in pairs)


@pytest.mark.parametrize("hasher", HASHERS)
def test_minhash_lsh_recovers_planted_pairs(docs, hasher):
    sh = word_shingles(docs, "text", "doc_id", n=3)
    sigs = minhash_signatures(sh, num_hashes=32, hasher=hasher)
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(sigs).collect()}
    assert (1, 2) in cands  # identical → all bands agree
    assert (1, 3) in cands  # near-dup → high band-collision probability
    assert (1, 4) not in cands and (2, 4) not in cands and (3, 4) not in cands


@pytest.mark.parametrize("hasher", HASHERS)
def test_simhash_distance_orders_similarity(docs, hasher):
    sketches = simhash64(docs, hasher=hasher)
    pairs = simhash_hamming_pairs(sketches, max_distance=64, bands=4)
    d = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert d[(1, 2)] == 0  # identical text → identical sketch
    assert d[(1, 3)] < d.get((1, 4), 64)  # near-dup closer than unrelated


def test_hash60_matches_duckdb(spark):
    """hash60 is the portability contract: Spark and DuckDB must produce
    the identical int64 for the same input+salt (this is what upgrades
    the minhash/simhash oracle rows from rows-only to value-checked)."""
    import duckdb

    import pyspark.sql.functions as F

    samples = ["hello", "world foo bar", "", "Ünïcode ütf8 ~", "a b  c"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: (r["h"], r["hs"])
        for r in df.select(
            "s",
            hash60(F.col("s")).alias("h"),
            hash60(F.col("s"), salt=7).alias("hs"),
        ).collect()
    }
    con = duckdb.connect()
    for s in samples:
        h, hs = con.execute(
            "SELECT ('0x'||substr(md5(?),1,15))::BIGINT,"
            " ('0x'||substr(md5(? || ':7'),1,15))::BIGINT",
            [s, s],
        ).fetchone()
        assert got[s] == (h, hs)
        assert 0 <= h < 2**60


def test_lsh_pruned_jaccard_equals_allpairs_on_candidates(docs):
    """The 100 TB path (LSH candidates → exact verify) must agree with
    all-pairs verification on everything LSH surfaces."""
    sh = word_shingles(docs, "text", "doc_id", n=3)
    sigs = minhash_signatures(sh, num_hashes=32)
    cands = minhash_lsh_candidates(sigs)
    pruned = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5, candidates=cands).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    for pair, j in pruned.items():
        assert full[pair] == j


def test_md5_base32_family_matches_duckdb(spark):
    """The multiply-shift family portability contract: for the same
    shingle, Spark's md5_base32-derived h_i = a_i*x + b_i must equal
    DuckDB's ('0x'||substr(md5(s),1,8))::BIGINT expansion with the same
    seeded constants — this is what keeps dedup_minhash_lsh value-checked
    at one md5 per shingle instead of 32."""
    import duckdb

    import pyspark.sql.functions as F

    from postgres_opensearch_cdc_spark.functions.dedup import MINHASH_PRIME, md5_base32, minhash_family

    fam = minhash_family(32, 42)
    samples = ["hello", "world foo bar", "", "Ünïcode ütf8 ~", "a b  c"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    cols = [ ((F.lit(a) * md5_base32(F.col("s")) + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"h{i}")
             for i, (a, b) in enumerate(fam) ]
    got = {r["s"]: [r[f"h{i}"] for i in range(32)] for r in df.select("s", *cols).collect()}
    con = duckdb.connect()
    for s in samples:
        exprs = ", ".join(
            f"({a}::BIGINT * ('0x'||substr(md5(?),1,8))::BIGINT + {b}) % {MINHASH_PRIME}" for a, b in fam
        )
        want = list(con.execute(f"SELECT {exprs}", [s] * 32).fetchone())
        assert got[s] == want
        assert all(0 <= h < MINHASH_PRIME for h in want)


@pytest.mark.parametrize("hasher", HASHERS)
def test_from_arrays_signatures_match_exploded_form(docs, hasher):
    """The shuffle-free array signature path must produce bit-identical
    signatures to the exploded groupBy form — same shingle set, same
    hash family, just computed inside the scan stage."""
    from postgres_opensearch_cdc_spark.functions.dedup import (
        minhash_signatures_from_arrays,
        shingle_arrays,
    )

    exploded = minhash_signatures(
        word_shingles(docs, "text", "doc_id", n=3), num_hashes=16, hasher=hasher
    )
    arrayed = minhash_signatures_from_arrays(
        shingle_arrays(docs, "text", "doc_id", n=3), num_hashes=16, hasher=hasher
    )
    assert {tuple(r) for r in exploded.collect()} == {
        tuple(r) for r in arrayed.collect()
    }


def test_bucket_cap_bounds_hot_band_explosion(spark):
    """Adversarial Zipfian-duplicate corpus (round-8 verdict ask #2):
    one boilerplate template planted across 5% of the corpus puts all
    its copies in the SAME band buckets, so uncapped LSH emits
    O(m^2) = C(50,2) pairs per band while the capped form emits the
    m-1 star pairs from the min-id representative — linear in cluster
    size (the connectivity lower bound). Connected components over
    the capped verified pairs must still recover the full planted
    cluster, and in O(1) label-propagation rounds (a consecutive-id
    CHAIN, the other linear option, needs O(m) rounds — it blew the
    25-round CC budget at m=50, which is why the star was chosen)."""
    from postgres_opensearch_cdc_spark.functions.dedup import (
        minhash_signatures_from_arrays,
        shingle_arrays,
    )
    from postgres_opensearch_cdc_spark.functions.graph import connected_components

    template = (
        "subscribe to our newsletter for updates terms of service apply "
        "all rights reserved contact us at support for more information "
        "privacy policy cookie settings copyright twenty twenty four"
    )
    m = 50  # planted cluster: 5% of a 1000-doc corpus
    rows = [(i, template) for i in range(m)]
    # background corpus: distinct documents, no shared shingles
    rows += [
        (1000 + i, " ".join(f"tok{i}x{j}" for j in range(30)))
        for i in range(950)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arrays = shingle_arrays(docs, "text", "doc_id", n=3)
    sigs = minhash_signatures_from_arrays(arrays, num_hashes=32, hasher="md5")

    uncapped = minhash_lsh_candidates(sigs, bands=8, rows_per_band=4)
    capped = minhash_lsh_candidates(sigs, bands=8, rows_per_band=4, bucket_cap=8)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    # identical docs agree on every band: uncapped = all pairs of the
    # planted cluster; capped = its star (distinct-ed across bands)
    assert n_uncapped == m * (m - 1) // 2
    assert n_capped == m - 1  # linear in cluster size, the CC minimum
    star = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert star == {(0, i) for i in range(1, m)}

    # the planted cluster still comes out as ONE connected component
    comp = connected_components(
        capped.selectExpr("id_a AS src", "id_b AS dst")
    )
    labels = {r["comp"] for r in comp.collect()}
    assert labels == {0}
    assert comp.count() == m

    # small buckets below the cap keep their FULL pair set: the capped
    # form is a strict superset-preserving restriction, not a rewrite
    small = minhash_lsh_candidates(sigs, bands=8, rows_per_band=4, bucket_cap=m)
    assert small.count() == n_uncapped

    with pytest.raises(ValueError, match="bucket_cap"):
        minhash_lsh_candidates(sigs, bucket_cap=0)

    # value-equivalence of the materialize flag: same pair sets either
    # way (the checkpoint is a pure execution-shape choice), and the
    # default keeps the LAZY shape — no ExistingRDD (checkpoint scan)
    # in the default plan, exactly one in the materialized plan. The
    # r14 default-on eager checkpoint regressed single-shot callers
    # (dedup_lsh_capped 2.2 s → 4.6 s); only the memoized family
    # builder opts in (r15).
    mat = minhash_lsh_candidates(
        sigs, bands=8, rows_per_band=4, materialize=True
    )
    assert {(r["id_a"], r["id_b"]) for r in mat.collect()} == {
        (r["id_a"], r["id_b"]) for r in uncapped.collect()
    }

    # plan-shape: only the materialized form pins the BANDED relation
    # (a LogicalRDD carrying the band key columns); the default stays
    # lazy. Checked on the analyzed LOGICAL plan — the executed plan's
    # ExistingRDD scans also cover the createDataFrame source, which
    # made a physical-plan string test order-dependent under AQE.
    def _has_banded_rdd(df) -> bool:
        plan = df._jdf.queryExecution().analyzed().toString()
        return any(
            "LogicalRDD" in line and "band#" in line
            for line in plan.splitlines()
        )

    assert not _has_banded_rdd(uncapped)
    assert _has_banded_rdd(mat)


def test_duplicate_window_spans_planted(spark):
    """Substring-level dedup on planted geometry: a 25-token span
    shared by two docs is recovered with EXACT token boundaries in
    both; a 12-token phrase repeated WITHIN one doc is caught twice;
    unique docs and sub-window docs emit nothing; per-doc stats agree
    with the spans."""
    from postgres_opensearch_cdc_spark.functions.dedup import (
        duplicate_span_doc_stats,
        duplicate_window_spans,
    )

    W = 10
    shared = " ".join(f"shared{i}" for i in range(25))     # 25 tokens
    phrase = " ".join(f"rep{i}" for i in range(12))        # 12 tokens
    docs = spark.createDataFrame(
        [
            # shared span at token offset 3 (after ua0 ua1 ua2)
            (1, "ua0 ua1 ua2 " + shared + " ub0 ub1"),
            # same span at token offset 5
            (2, "va0 va1 va2 va3 va4 " + shared),
            # within-doc repeat: phrase at 0 and again at 12+11=23
            (3, phrase + " " + " ".join(f"w{i}" for i in range(11))
                + " " + phrase),
            (4, "totally unique tokens nothing here repeats at all "
                "really nothing matches anywhere else in this corpus"),
            (5, "short doc"),  # < W tokens: must emit no windows
        ],
        "doc_id long, text string",
    )
    spans = {
        (r["id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_window_spans(
            docs, "text", "doc_id", window=W).collect()
    }
    # doc1: span [3, 28), 25-10+1=16 windows; doc2: [5, 30)
    # doc3: two maximal spans [0,12) and [23,35), 3 windows each
    assert spans == {
        (1, 3, 28, 16),
        (2, 5, 30, 16),
        (3, 0, 12, 3),
        (3, 23, 35, 3),
    }
    stats = {
        r["id"]: (r["n_spans"], r["dup_tokens"], r["n_tokens"],
                  r["dup_fraction"])
        for r in duplicate_span_doc_stats(
            docs, "text", "doc_id", window=W).collect()
    }
    assert stats[1] == (1, 25, 30, round(25 / 30, 6))
    assert stats[3] == (2, 24, 35, round(24 / 35, 6))
    assert set(stats) == {1, 2, 3}


def test_trim_duplicate_spans_first_occurrence_survives(spark):
    """The exact-substring-dedup POLICY: corpus-first occurrence (min
    doc id, min start) keeps its text; every later occurrence is
    trimmed; a full-duplicate doc empties entirely; untouched docs
    round-trip (in analyzer-normalized form)."""
    from postgres_opensearch_cdc_spark.functions.dedup import (
        trim_duplicate_spans,
    )

    W = 10
    shared = " ".join(f"s{i}" for i in range(15))  # 15 tokens
    unique2 = " ".join(f"u{i}" for i in range(5))
    docs = spark.createDataFrame(
        [
            (1, shared),                       # first occurrence: kept
            (2, unique2 + " " + shared),       # second: span trimmed
            (3, shared),                       # full dup of doc 1: emptied
            (4, "completely fresh words appear once only here today"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: (r["clean_text"], r["kept_tokens"], r["removed_tokens"])
           for r in trim_duplicate_spans(
               docs, "text", "doc_id", window=W).collect()}
    assert out[1] == (shared, 15, 0)           # canonical copy survives
    assert out[2] == (unique2, 5, 15)          # later occurrence trimmed
    assert out[3] == ("", 0, 15)               # full duplicate emptied
    assert out[4][1] == 8 and out[4][2] == 0   # untouched
