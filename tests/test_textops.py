"""T1 — training-data pipeline ops: text analysis, dedup, similarity, multimodal."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from indigo_crawler_spark.functions.text_analysis import (
    fingerprint_udf,
    lang_id_udf,
    quality_exprs,
    regex_token_count,
    whitespace_token_count,
)
from indigo_crawler_spark.kernels.textstats import fingerprint64, lang_id


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat today", "en"),  # near dup
        (3, "der hund und die katze sind nicht da", "de"),
        (4, "el perro y la casa de madera es grande", "es"),
        (5, "这是一个中文测试文档 今天天气很好", "zh"),
        (6, "completely different text about spark engines and shuffles", "en"),
        (7, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestTextAnalysis:
    def test_token_counts(self, spark, docs):
        rows = {
            r["doc_id"]: (r["ws"], r["rx"])
            for r in docs.select(
                "doc_id",
                whitespace_token_count("text").alias("ws"),
                regex_token_count("text").alias("rx"),
            ).collect()
        }
        assert rows[0] == (9, 9)
        assert rows[7][0] == 0

    def test_quality_exprs(self, spark, docs):
        exprs = quality_exprs("text")
        r = (
            docs.where(F.col("doc_id") == 0)
            .select(*[v.alias(k) for k, v in exprs.items()])
            .collect()[0]
        )
        assert r["n_chars"] == 43 and r["n_words"] == 9
        assert r["punct_ratio"] == 0.0
        assert math.isclose(r["space_ratio"], 8 / 43, rel_tol=1e-4)

    def test_lang_id(self, spark, docs):
        got = {
            r["doc_id"]: r["lid"]
            for r in docs.select("doc_id", lang_id_udf("text").alias("lid")).collect()
        }
        assert got[0] == "en" and got[3] == "de" and got[4] == "es" and got[5] == "zh"
        assert got[7] == "unknown"
        # UDF ≡ kernel
        assert got[0] == lang_id("the quick brown fox jumps over the lazy dog")

    def test_fingerprint(self, spark, docs):
        got = {
            r["doc_id"]: r["fp"]
            for r in docs.select("doc_id", fingerprint_udf("text").alias("fp")).collect()
        }
        assert got[0] == got[1] != 0  # identical docs, identical fingerprints
        assert got[0] == fingerprint64("the quick brown fox jumps over the lazy dog")
        assert got[0] != got[6]


class TestDedup:
    def test_exact(self, spark, docs):
        from indigo_crawler_spark.operators.text_dedup import exact_dedup

        out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
        assert out[0] == 2  # docs 0,1 merged, min id kept
        assert 1 not in out

    def test_jaccard_pairs(self, spark, docs):
        from indigo_crawler_spark.operators.text_dedup import jaccard_pairs, word_shingles

        pairs = {
            (r["a"], r["b"]): r["jaccard"]
            for r in jaccard_pairs(word_shingles(docs), 0.5).collect()
        }
        assert pairs[(0, 1)] == 1.0  # exact dup
        assert (0, 2) in pairs  # near dup above threshold
        assert all(a < b for a, b in pairs)

    def test_minhash_lsh_matches_exact_for_high_threshold(self, spark, docs):
        from indigo_crawler_spark.operators.text_dedup import (
            jaccard_pairs,
            minhash_dedup_pairs,
            word_shingles,
        )

        got = {(r["a"], r["b"]) for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
        exact = {(r["a"], r["b"]) for r in jaccard_pairs(word_shingles(docs), 0.5).collect()}
        assert got <= exact  # verification step ⇒ no false positives
        assert (0, 1) in got  # identical docs always collide in every band

    def test_minhash_md5_variant_no_false_positives(self, spark, docs):
        """The SQL-checkable md5-string MinHash variant: verified subset of
        exact Jaccard, identical docs always collide."""
        from indigo_crawler_spark.operators.text_dedup import (
            jaccard_pairs,
            minhash_md5_pairs,
            word_shingles,
        )

        got = {(r["a"], r["b"]) for r in minhash_md5_pairs(docs, threshold=0.5).collect()}
        exact = {(r["a"], r["b"]) for r in jaccard_pairs(word_shingles(docs), 0.5).collect()}
        assert got <= exact
        assert (0, 1) in got

    def test_verify_pairs_identical_to_selfjoin_verify(self, spark, docs):
        """jaccard_verify_pairs (per-pair join, hot-shingle-safe) emits the
        exact same (a, b, jaccard) rows as the inverted-index self-join
        restricted to the same candidates."""
        from indigo_crawler_spark.operators.text_dedup import (
            jaccard_pairs,
            jaccard_verify_pairs,
            lsh_candidate_pairs,
            minhash_signatures,
            word_shingles,
        )

        sh = word_shingles(docs).cache()
        cands = lsh_candidate_pairs(minhash_signatures(sh)).cache()
        got = {
            (r["a"], r["b"], r["jaccard"])
            for r in jaccard_verify_pairs(sh, cands, 0.2).collect()
        }
        old = jaccard_pairs(sh, 0.2).join(cands, ["a", "b"], "left_semi")
        want = {(r["a"], r["b"], r["jaccard"]) for r in old.collect()}
        assert got == want and got
        cands.unpersist()
        sh.unpersist()

    def test_verify_pairs_hot_shingle_exact(self, spark):
        """One stopword shingle in 50% of docs (the skew case the per-pair
        verify exists for): results still exact — equal to brute-force
        Jaccard over the candidate pairs, hot shingle counted in every
        intersection and denominator."""
        from indigo_crawler_spark.operators.text_dedup import (
            jaccard_verify_pairs,
            word_shingles,
        )

        n = 40
        rows = []
        for i in range(n):
            uniq = f"u{i}a u{i}b u{i}c u{i}d w{i % 4}x w{i % 4}y"
            hot = "of the and " if i % 2 == 0 else ""
            rows.append((i, f"{hot}{uniq}"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sh = word_shingles(docs).cache()
        # candidates: all same-residue pairs (every pair shares the hot
        # shingle and/or the w-grams) — a dense cluster on purpose
        cands = spark.createDataFrame(
            [(a, b) for a in range(n) for b in range(a + 1, n) if a % 4 == b % 4],
            "a long, b long",
        )
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in jaccard_verify_pairs(sh, cands, 0.0001).collect()
        }
        # brute-force oracle in python
        shing = {
            i: {
                " ".join(ws[j : j + 3])
                for ws in [rows[i][1].split()]
                for j in range(max(len(ws) - 2, 1))
            }
            for i in range(n)
        }
        for a in range(n):
            for b in range(a + 1, n):
                if a % 4 != b % 4:
                    continue
                inter = len(shing[a] & shing[b])
                if not inter:
                    assert (a, b) not in got
                    continue
                j = round(inter / len(shing[a] | shing[b]), 6)
                assert got.get((a, b)) == pytest.approx(j), (a, b)
        sh.unpersist()

    def test_simhash(self, spark, docs):
        from indigo_crawler_spark.operators.text_dedup import (
            simhash_near_pairs,
            simhash_signatures,
        )

        sigs = simhash_signatures(docs.where(F.col("doc_id") != 7))
        by_id = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
        assert by_id[0] == by_id[1]  # identical text ⇒ identical simhash
        pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_pairs(sigs, 10).collect()}
        assert pairs[(0, 1)] == 0

    def test_simhash_banding_configs_pair_identical(self, spark, docs):
        """Pigeonhole: any valid (chunks, combo) returns the SAME pair set —
        the old naive 4×16 single-piece banding (chunks=4, combo=1) vs the
        scale-default combinatorial banding (chunks=5, combo=2) at d≤3."""
        import pytest as _pytest

        from indigo_crawler_spark.operators.text_dedup import (
            simhash_near_pairs,
            simhash_signatures,
        )

        sigs = simhash_signatures(docs).cache()
        naive = {
            (r["a"], r["b"], r["hamming"])
            for r in simhash_near_pairs(sigs, 3, chunks=4, combo=1).collect()
        }
        combinatorial = {
            (r["a"], r["b"], r["hamming"])
            for r in simhash_near_pairs(sigs, 3).collect()
        }
        assert naive == combinatorial
        with _pytest.raises(ValueError, match="pigeonhole"):
            simhash_near_pairs(sigs, 3, chunks=4, combo=2)
        sigs.unpersist()


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rng_free = [
            [float((i * 31 + j * 17) % 13) - 6.0 for j in range(8)] for i in range(20)
        ]
        rng_free[1] = rng_free[0][:]  # vec 1 ≡ vec 0
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(rng_free)], "vec_id long, embedding array<float>"
        )

    def test_cosine_topk_exact_vs_numpy(self, spark, vecs):
        from indigo_crawler_spark.operators.similarity import cosine_topk

        out = cosine_topk(vecs.where(F.col("vec_id") < 3), vecs, k=3)
        got = {(r["q_id"], r["rank"]): r["n_id"] for r in out.collect()}
        assert got[(0, 1)] == 1  # identical vector is the top neighbour
        mat = np.array(
            [r["embedding"] for r in vecs.orderBy("vec_id").collect()], dtype=np.float64
        )
        norms = np.linalg.norm(mat, axis=1)
        sims = mat @ mat[0] / (norms * norms[0])
        sims[0] = -np.inf
        best = int(np.argmax(sims))
        assert got[(0, 1)] == best or sims[got[(0, 1)]] == pytest.approx(sims[best])

    def test_int_dot_topk(self, spark, vecs):
        from indigo_crawler_spark.operators.similarity import int_dot_topk

        out = int_dot_topk(vecs.where(F.col("vec_id") == 0), vecs, k=2)
        rows = {r["rank"]: (r["n_id"], r["dot"]) for r in out.collect()}
        assert rows[1][0] == 1  # identical vector wins on dot product too

    def test_ann_lsh_recall_on_identical(self, spark, vecs):
        from indigo_crawler_spark.operators.similarity import ann_lsh_topk

        out = ann_lsh_topk(vecs.where(F.col("vec_id") == 0), vecs, dim=8, k=3, bits=4)
        got = [r["n_id"] for r in out.orderBy("rank").collect()]
        assert got and got[0] == 1  # identical vector shares every bucket

    def test_int_cosine_near_pairs_exact_threshold(self, spark, vecs):
        """cos ≥ t as pure integer arithmetic: the identical pair passes at
        t=1 (cos exactly 1) and nothing above 1 could; a loose t admits
        more pairs, never fewer."""
        from indigo_crawler_spark.operators.similarity import int_cosine_near_pairs

        exact = {(r["a"], r["b"]) for r in int_cosine_near_pairs(vecs, 1, 1).collect()}
        assert (0, 1) in exact  # vec 1 ≡ vec 0 ⇒ cos = 1 exactly
        loose = {(r["a"], r["b"]) for r in int_cosine_near_pairs(vecs, 1, 2).collect()}
        assert exact <= loose

    def test_ivf_topk_recall_floor(self, spark):
        """IVF-flat (deterministic sampled centroids): recall@5 vs brute
        force ≥ 0.9 at nprobe=8/16 lists on a 200-vector corpus, and probing
        every list reproduces brute force exactly."""
        from indigo_crawler_spark.operators.similarity import cosine_topk, ivf_topk

        dim, n, k = 16, 200, 5
        rows = [
            (i, [float((i * 31 + j * 17) % 29) - 14.0 + 0.01 * ((i * 7 + j) % 11) for j in range(dim)])
            for i in range(n)
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        queries = vecs.where(F.col("vec_id") < 10)
        truth = {
            (r["q_id"], r["n_id"]) for r in cosine_topk(queries, vecs, k=k).collect()
        }
        got = {
            (r["q_id"], r["n_id"])
            for r in ivf_topk(queries, vecs, k=k, n_centroids=16, nprobe=8).collect()
        }
        assert len(got & truth) / len(truth) >= 0.9
        full = {
            (r["q_id"], r["n_id"])
            for r in ivf_topk(queries, vecs, k=k, n_centroids=16, nprobe=16).collect()
        }
        assert full == truth  # probing all lists ≡ brute force

    def test_int_lsh_near_pairs_exact_subset(self, spark, vecs):
        """LSH-first near-dup: never a false positive (⊆ the all-pairs
        exact-verify set), the identical pair always survives (identical
        vectors share every bucket in every rotation), and more rotations
        never lose pairs (candidate sets are unions)."""
        from indigo_crawler_spark.operators.similarity import (
            int_cosine_near_pairs,
            int_lsh_near_pairs,
        )

        exact = {
            (r["a"], r["b"], r["dot"])
            for r in int_cosine_near_pairs(vecs, 1, 2).collect()
        }
        got1 = {
            (r["a"], r["b"], r["dot"])
            for r in int_lsh_near_pairs(vecs, dim=8, t_num=1, t_den=2, bits=4, rotations=1).collect()
        }
        got3 = {
            (r["a"], r["b"], r["dot"])
            for r in int_lsh_near_pairs(vecs, dim=8, t_num=1, t_den=2, bits=4, rotations=3).collect()
        }
        assert got1 <= got3 <= exact
        assert any(a == 0 and b == 1 for a, b, _ in got1)  # vec 1 ≡ vec 0

    def test_ivf_int_full_probe_equals_brute_force(self, spark, vecs):
        """ivf_int_topk with nprobe=n_centroids ≡ int_dot_topk EXACTLY —
        every comparison is integer, so the equality is bitwise, not
        approximate (the property the DuckDB oracle relies on)."""
        from indigo_crawler_spark.operators.similarity import (
            int_dot_topk,
            ivf_int_topk,
        )

        queries = vecs.where(F.col("vec_id") < 5)
        want = {
            (r["q_id"], r["rank"]): (r["n_id"], r["dot"])
            for r in int_dot_topk(queries, vecs, k=3).collect()
        }
        got = {
            (r["q_id"], r["rank"]): (r["n_id"], r["dot"])
            for r in ivf_int_topk(
                queries, vecs, k=3, n_centroids=4, nprobe=4
            ).collect()
        }
        assert got == want

    def test_ivf_plan_size_bounded_at_realistic_index(self, spark):
        """n_centroids=256 × dim=128 must NOT inflate the plan: centroids
        live in the UDF closure as one numpy matrix, not as per-centroid
        literal arrays (which at this size put ~256·128·2 literal nodes per
        rank expression into Catalyst). Bound the formatted plan string and
        prove the query still executes."""
        import io as _io
        from contextlib import redirect_stdout

        from indigo_crawler_spark.operators.similarity import ivf_topk

        dim, n = 128, 300
        rows = [
            (i, [float((i * 31 + j * 17) % 29) - 14.0 for j in range(dim)])
            for i in range(n)
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = ivf_topk(
            vecs.where(F.col("vec_id") < 3), vecs, k=3, n_centroids=256, nprobe=4
        )
        buf = _io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert len(plan) < 100_000, f"plan string blew up: {len(plan)} chars"
        assert out.count() > 0

    def test_lsh_bucket_closure_matches_expressions(self, spark, vecs):
        """The numpy-closure bucket path (production) must reproduce the
        column-expression reference bit-for-bit on the integer planes (both
        are exact int64 arithmetic) and on the float planes for these
        fixtures (projections nowhere near the ulp boundary)."""
        from indigo_crawler_spark.operators.similarity import (
            _hyperplanes,
            _int_planes,
            _lsh_keyed,
            int_bucket_expr,
            lsh_bucket_expr,
        )

        dim, bits, rotations = 8, 6, 3
        quant = F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000, 0).cast("long")
        )
        v = vecs.select(F.col("vec_id").alias("vid"), quant.alias("v"))
        got = {
            (r["vid"], r["rot"]): r["bk"]
            for r in _lsh_keyed(
                v, "vid", "v",
                [_int_planes(dim, bits, r) for r in range(rotations)], "int64",
            ).collect()
        }
        want = {
            (r["vid"], rot): r[f"bk{rot}"]
            for r in v.select(
                "vid",
                *[
                    int_bucket_expr(F.col("v"), dim, bits, rot).alias(f"bk{rot}")
                    for rot in range(rotations)
                ],
            ).collect()
            for rot in range(rotations)
        }
        assert got == want and len(got) == 20 * rotations

        fgot = {
            (r["vec_id"], r["rot"]): r["bk"]
            for r in _lsh_keyed(
                vecs, "vec_id", "embedding",
                [_hyperplanes(dim, bits, r) for r in range(rotations)], "float64",
            ).collect()
        }
        fwant = {
            (r["vec_id"], rot): r[f"bk{rot}"]
            for r in vecs.select(
                "vec_id",
                *[
                    lsh_bucket_expr(F.col("embedding"), dim, bits, rot).alias(f"bk{rot}")
                    for rot in range(rotations)
                ],
            ).collect()
            for rot in range(rotations)
        }
        assert fgot == fwant

    def test_lsh_bucket_closure_tolerates_null_and_ragged(self, spark):
        """A NULL or wrong-length embedding must bucket to 0 (the
        expression fold's NULL semantics — and what the SQL mirror
        computes), not kill the Arrow task."""
        from indigo_crawler_spark.operators.similarity import (
            _hyperplanes,
            _lsh_keyed,
        )

        rows = [(0, [0.5] * 8), (1, None), (2, [0.5] * 5)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["vec_id"]: r["bk"]
            for r in _lsh_keyed(
                df, "vec_id", "embedding", [_hyperplanes(8, 4, 0)], "float64"
            ).collect()
        }
        assert got[1] == 0 and got[2] == 0
        assert got[0] != 0  # all-positive vector crosses no hyperplane at 0

    def test_lsh_plan_size_bounded_at_realistic_dims(self, spark):
        """dim=768 × bits=16 × rotations=2 must NOT inflate the plan: the
        plane tensor lives in the UDF closure (one numpy array), not as
        ~25k per-bit literal nodes + 32 fold expressions (VERDICT r3 wrong
        #2 — the same Catalyst bloat class the IVF closure fix closed).
        Bound the formatted plan and prove the query executes."""
        import io as _io
        from contextlib import redirect_stdout

        from indigo_crawler_spark.operators.similarity import int_lsh_near_pairs

        dim, n = 768, 30
        rows = [
            (i, [float((i * 31 + j * 17) % 13) / 6.0 - 1.0 for j in range(dim)])
            for i in range(n)
        ]
        rows[1] = (1, rows[0][1][:])  # one exact duplicate pair survives
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = int_lsh_near_pairs(
            vecs, dim=dim, t_num=9, t_den=10, bits=16, rotations=2
        )
        buf = _io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert len(plan) < 100_000, f"plan string blew up: {len(plan)} chars"
        got = {(r["a"], r["b"]) for r in out.collect()}
        assert (0, 1) in got

    def test_ann_multiprobe_recall_floor(self, spark):
        """Multi-probe rotations lift recall@k: ≥0.9 vs brute force at the
        default knobs on a 200-vector deterministic corpus, and strictly no
        worse than the single-rotation cliff it fixes."""
        from indigo_crawler_spark.operators.similarity import ann_lsh_topk, cosine_topk

        dim, n, k = 16, 200, 5
        rows = [
            (i, [float((i * 31 + j * 17) % 29) - 14.0 + 0.01 * ((i * 7 + j) % 11) for j in range(dim)])
            for i in range(n)
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        queries = vecs.where(F.col("vec_id") < 10)
        truth = {
            (r["q_id"], r["n_id"]) for r in cosine_topk(queries, vecs, k=k).collect()
        }

        def recall(rotations):
            got = {
                (r["q_id"], r["n_id"])
                for r in ann_lsh_topk(
                    queries, vecs, dim=dim, k=k, bits=8, rotations=rotations
                ).collect()
            }
            return len(got & truth) / len(truth)

        r1, r4 = recall(1), recall(4)
        assert r4 >= 0.9, f"recall@{k} with 4 rotations = {r4}"
        assert r4 >= r1


class TestMultimodal:
    def test_extract_and_frame_plan(self, spark, docs):
        from indigo_crawler_spark.operators.multimodal import (
            extract_media_features,
            frame_sample_plan,
            media_from_documents,
        )

        media = media_from_documents(
            docs.withColumn("n_chars", F.length("text")).where(F.col("doc_id") < 6)
        )
        features = extract_media_features(media).cache()
        feats = {r["media_id"]: r for r in features.collect()}
        assert len(feats) == 6
        assert feats[0]["n_bytes"] == 43 and len(bytes(feats[0]["sha16"])) == 16
        assert feats[0]["n_frames"] == 1  # fake/image
        assert feats[1]["n_frames"] >= 1  # fake/video
        # plan over the features frame (no second decode pass, pure JVM)
        plan = {
            r["media_id"]: list(r["frame_indices"])
            for r in frame_sample_plan(features, 10).collect()
        }
        assert plan[0] == [0]
        for mid, row in feats.items():
            want = list(range(0, row["n_frames"], 10))
            assert plan[mid] == want, f"media {mid}"
        assert "payload" not in features.columns  # wide binary pruned
        features.unpersist()

    def test_unknown_codec_raises(self):
        from indigo_crawler_spark.operators.multimodal import decode_media

        with pytest.raises(NotImplementedError):
            decode_media("image/jpeg", b"\xff\xd8")
