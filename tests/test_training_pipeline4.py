"""Training-pipeline batch 4: reference-model and property tests for
semantic dedup (k-means + within-cluster prune), greedy sequence
packing, Gopher-style quality rules, and char entropy. Each entry's
value semantics are pinned against an independent pure-Python/numpy
reference model on the real sf0.001 tables (the oracle SQL replays the
same math in DuckDB — these tests make the CONTRACT explicit in Python
so a refactor that breaks both engines the same way still fails)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from postgres_opensearch_cdc_spark.queries import training_pipeline4 as tp4


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _load_vectors(spark, sf_dir):
    from postgres_opensearch_cdc_spark.registry import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    V = np.array([[float(x) for x in r.embedding] for r in rows])
    return ids, V


def _reference_kmeans(ids, V):
    order = sorted(
        range(len(ids)),
        key=lambda i: (_hash60(f"{ids[i]}:{tp4.SEM_SALT}"), ids[i]),
    )
    C = np.round(V[order[: tp4.SEM_K]], 6)
    for _ in range(tp4.SEM_ITERS):
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        C = np.round(
            np.array(
                [
                    V[a == k].mean(axis=0) if (a == k).any() else C[k]
                    for k in range(tp4.SEM_K)
                ]
            ),
            6,
        )
    d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return C, d.argmin(axis=1), d.min(axis=1)


class TestSemanticDedup:
    def test_centroids_match_reference_model(self, spark, sf_dir):
        ids, V = _load_vectors(spark, sf_dir)
        C_ref, _, _ = _reference_kmeans(ids, V)
        C = np.array(tp4._sem_centroids(spark, sf_dir))
        assert C.shape == C_ref.shape
        # both sides round to 6 dp per iteration; agreement is exact
        # up to sub-rounding float noise
        assert np.abs(C - C_ref).max() < 1e-9

    def test_cluster_summary_matches_reference(self, spark, sf_dir):
        ids, V = _load_vectors(spark, sf_dir)
        _, assign, dsq = _reference_kmeans(ids, V)
        got = {
            r.cluster: (r.n_vecs, r.mean_dist)
            for r in tp4.kmeans_clusters(spark, sf_dir).collect()
        }
        for k in range(tp4.SEM_K):
            m = assign == k
            assert got[k][0] == int(m.sum())
            assert got[k][1] == pytest.approx(
                round(float(np.sqrt(dsq[m]).mean()), 4), abs=2e-4
            )

    def test_keep_verdicts_match_reference_prune(self, spark, sf_dir):
        ids, V = _load_vectors(spark, sf_dir)
        _, assign, dsq = _reference_kmeans(ids, V)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        expect = {}
        for k in range(tp4.SEM_K):
            m = np.where(assign == k)[0]
            order = sorted(m, key=lambda i: (dsq[i], ids[i]))
            for pos, i in enumerate(order):
                hit = any(
                    round(float(Vn[i] @ Vn[j]), 6) >= tp4.SEM_EPS
                    for j in order[:pos]
                )
                expect[int(ids[i])] = (int(k), not hit)
        got = {
            r.vec_id: (r.cluster, r.kept)
            for r in tp4.dedup_semantic_keep(spark, sf_dir).collect()
        }
        assert got == expect
        # some but not all drops at every SF (EPS was chosen for that)
        kept = [v[1] for v in got.values()]
        assert any(kept) and not all(kept)

    def test_arrow_assignment_equals_literal_form(self, spark, sf_dir):
        """The large-K Arrow assignment path (numpy matmul per batch)
        must agree with the literal-expression form the oracle checks:
        identical clusters everywhere, distances equal up to the
        expanded-form float noise (~1e-9), far under the measured
        argmin margins (2.5e-5)."""
        from pyspark.sql import functions as F

        from postgres_opensearch_cdc_spark.functions.similarity import (
            _as_double,
            assign_nearest,
            assign_nearest_arrow,
        )
        from postgres_opensearch_cdc_spark.registry import load_table

        cents = tp4._sem_centroids(spark, sf_dir)
        vecs = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        )
        cl, dsq = assign_nearest(F.col("v"), cents)
        lit = {
            r.vec_id: (r.cluster, r.dsq)
            for r in vecs.select("vec_id", cl, dsq).collect()
        }
        arr = {
            r.vec_id: (r.cluster, r.dsq)
            for r in assign_nearest_arrow(vecs, cents).collect()
        }
        assert set(lit) == set(arr)
        for vid in lit:
            assert lit[vid][0] == arr[vid][0]
            assert arr[vid][1] == pytest.approx(lit[vid][1], abs=1e-8)

    def test_arrow_fit_decision_identical_to_literal_fit(self, spark, sf_dir):
        """fit_kmeans_arrow (the large-K Lloyd form) must reproduce the
        literal-expression fit's centroids exactly: same seeding, same
        6 dp rounding, same empty-cell guard — only the assignment
        kernel differs, and its decisions match at every test SF."""
        from pyspark.sql import functions as F

        from postgres_opensearch_cdc_spark.functions.similarity import (
            _as_double,
            fit_kmeans_arrow,
        )
        from postgres_opensearch_cdc_spark.registry import load_table

        lit = tp4._sem_centroids(spark, sf_dir)
        vecs = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        )
        arr = fit_kmeans_arrow(
            vecs, k=tp4.SEM_K, iterations=tp4.SEM_ITERS,
            seed_salt=tp4.SEM_SALT,
        )
        assert arr == lit

    def test_rank_one_member_always_kept(self, spark, sf_dir):
        rows = tp4.dedup_semantic_keep(spark, sf_dir).collect()
        ids, V = _load_vectors(spark, sf_dir)
        _, assign, dsq = _reference_kmeans(ids, V)
        best = {}
        for i, vid in enumerate(ids):
            k = int(assign[i])
            if k not in best or (dsq[i], vid) < best[k][0]:
                best[k] = ((dsq[i], vid), vid)
        firsts = {v for _, v in best.values()}
        kept = {r.vec_id for r in rows if r.kept}
        assert firsts <= kept


class TestPacking:
    def test_bins_respect_cap_or_are_singleton(self, spark, sf_dir):
        for r in tp4.pack_sequences_greedy(spark, sf_dir).collect():
            assert r.tokens <= tp4.PACK_CAP or r.n_docs == 1

    def test_matches_pure_python_loop(self, spark, sf_dir):
        from postgres_opensearch_cdc_spark.registry import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).collect()
        per_shard: dict[int, list] = {}
        for r in docs:
            toks = len(r.text.lower().split())
            shard = _hash60(f"{r.doc_id}:{tp4.PACK_SALT_SHARD}") % tp4.PACK_SHARDS
            h = _hash60(f"{r.doc_id}:{tp4.PACK_SALT_ORDER}")
            per_shard.setdefault(shard, []).append((h, r.doc_id, toks))
        expect = {}
        for shard, items in per_shard.items():
            items.sort()
            cur, acc = 0, 0
            for _, _, t in items:
                if cur == 0 or acc + t > tp4.PACK_CAP:
                    cur += 1
                    acc = t
                else:
                    acc += t
                key = (shard, cur)
                n, tot = expect.get(key, (0, 0))
                expect[key] = (n + 1, tot + t)
        got = {
            (r.shard, r.bin): (r.n_docs, r.tokens)
            for r in tp4.pack_sequences_greedy(spark, sf_dir).collect()
        }
        assert got == expect

    def test_bins_are_contiguous_from_one(self, spark, sf_dir):
        rows = tp4.pack_sequences_greedy(spark, sf_dir).collect()
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r.bin)
        for bins in by_shard.values():
            assert sorted(bins) == list(range(1, len(bins) + 1))


class TestGopherRules:
    def test_matches_pandas_reference(self, spark, sf_dir):
        from postgres_opensearch_cdc_spark.registry import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "source", "text"
        ).collect()
        agg: dict[str, list] = {}
        for r in docs:
            ws = r.text.lower().split()
            nw, wc = len(ws), sum(len(w) for w in ws)
            nd = len(set(ws))
            topw = max(ws.count(w) for w in set(ws))
            f_wc = not (tp4.GOPHER_WC_MIN <= nw <= tp4.GOPHER_WC_MAX)
            f_mwl = (
                wc * 10 < tp4.GOPHER_MWL_LO10 * nw
                or wc * 10 > tp4.GOPHER_MWL_HI10 * nw
            )
            f_ttr = nd * 10 < nw * tp4.GOPHER_TTR_BP
            f_dom = topw * 10 > nw * tp4.GOPHER_DOM_BP
            a = agg.setdefault(r.source, [0, 0, 0, 0, 0, 0])
            a[0] += 1
            a[1] += not (f_wc or f_mwl or f_ttr or f_dom)
            a[2] += f_wc
            a[3] += f_mwl
            a[4] += f_ttr
            a[5] += f_dom
        got = {
            r.source: [
                r.n_docs,
                r.n_pass,
                r.fail_wordcount,
                r.fail_meanwordlen,
                r.fail_ttr,
                r.fail_dominance,
            ]
            for r in tp4.quality_gopher_rules(spark, sf_dir).collect()
        }
        assert got == {k: list(v) for k, v in agg.items()}

    def test_every_rule_fires_somewhere(self, spark, sf_dir):
        rows = tp4.quality_gopher_rules(spark, sf_dir).collect()
        assert sum(r.fail_wordcount for r in rows) > 0
        assert sum(r.fail_ttr for r in rows) > 0
        assert sum(r.n_pass for r in rows) > 0


class TestDsir:
    def test_matches_python_reference(self, spark, sf_dir):
        import math as m

        from postgres_opensearch_cdc_spark.registry import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        ).collect()
        B, S = tp4.DSIR_BUCKETS, tp4.DSIR_SALT
        per_doc, raw, tgt = {}, {}, {}
        t_raw = t_tgt = 0
        for r in docs:
            bs = [
                _hash60(f"{w}:{S}") % B for w in r.text.lower().split()
            ]
            per_doc[r.doc_id] = bs
            for b in bs:
                raw[b] = raw.get(b, 0) + 1
                t_raw += 1
                if r.lang == tp4.DSIR_TARGET_LANG:
                    tgt[b] = tgt.get(b, 0) + 1
                    t_tgt += 1
        w = {
            b: m.log((tgt.get(b, 0) + 1) / (t_tgt + B))
            - m.log((raw[b] + 1) / (t_raw + B))
            for b in raw
        }
        got = {
            r.doc_id: (r.n_toks, r.dsir_score)
            for r in tp4.dsir_importance_scores(spark, sf_dir).collect()
        }
        assert set(got) == set(per_doc)
        for d, bs in per_doc.items():
            assert got[d][0] == len(bs)
            assert got[d][1] == pytest.approx(
                round(sum(w[b] for b in bs), 4), abs=2e-3
            )

    def test_target_language_scores_higher(self, spark, sf_dir):
        from postgres_opensearch_cdc_spark.registry import load_table

        scores = tp4.dsir_importance_scores(spark, sf_dir)
        langs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang"
        )
        from pyspark.sql import functions as F

        rows = (
            scores.join(langs, "doc_id")
            .groupBy(
                (F.col("lang") == tp4.DSIR_TARGET_LANG).alias("is_tgt")
            )
            .agg(F.avg("dsir_score").alias("m"))
            .collect()
        )
        m = {r.is_tgt: r.m for r in rows}
        assert m[True] > m[False]


class TestContaminationEmbedding:
    def test_matches_reference_model(self, spark, sf_dir):
        ids, V = _load_vectors(spark, sf_dir)
        _, assign, _ = _reference_kmeans(ids, V)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        is_eval = {
            int(v): _hash60(f"{v}:{tp4.CONTAM_EMB_SALT}") % 10 == 0
            for v in ids
        }
        expect = {}
        for i, vid in enumerate(ids):
            if not is_eval[int(vid)]:
                continue
            k = int(assign[i])
            tr = [
                j for j, vj in enumerate(ids)
                if int(assign[j]) == k and not is_eval[int(vj)]
            ]
            sims = [round(float(Vn[i] @ Vn[j]), 6) for j in tr]
            n = sum(s >= tp4.CONTAM_EMB_EPS for s in sims)
            expect[int(vid)] = (k, n > 0, n)
        got = {
            r.vec_id: (r.cluster, r.contaminated, r.n_neighbors)
            for r in tp4.contamination_embedding(spark, sf_dir).collect()
        }
        assert got == expect
        assert len(got) > 0


class TestCharEntropy:
    def test_matches_python_reference(self, spark, sf_dir):
        from postgres_opensearch_cdc_spark.registry import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).collect()
        expect = {}
        for r in docs:
            t = r.text.lower()
            L = len(t)
            if L == 0:
                continue
            counts = [t.count(ch) for ch in tp4.ENTROPY_ALPHABET]
            counts.append(L - sum(counts))
            ent = 0.0
            for c in counts:
                if c > 0:
                    p = c / L
                    ent += -(p * math.log2(p))
            expect[r.doc_id] = (L, round(ent, 4))
        got = {
            r.doc_id: (r.n_chars_text, r.entropy_bits)
            for r in tp4.text_char_entropy(spark, sf_dir).collect()
        }
        assert set(got) == set(expect)
        for k in expect:
            assert got[k][0] == expect[k][0]
            assert got[k][1] == pytest.approx(expect[k][1], abs=2e-4)

    def test_uniform_text_has_expected_entropy(self, spark, sf_dir):
        """Analytic sanity: entropy of 'ab' = 1 bit, 'aaaa' = 0."""
        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [1, 2], "text": ["ab", "aaaa"],
                 "lang": ["en", "en"], "source": ["s", "s"],
                 "n_chars": [2, 4]}
            )
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(f"{d}/documents.parquet")
            rows = {
                r.doc_id: r.entropy_bits
                for r in tp4.text_char_entropy(spark, d).collect()
            }
        assert rows[1] == pytest.approx(1.0)
        assert rows[2] == pytest.approx(0.0)
