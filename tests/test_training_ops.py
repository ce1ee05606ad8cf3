"""Tests for training-data pipeline operators: dedup, similarity search,
text analysis, multimodal plumbing — over the driver testdata tables."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from redeye_spark.operators import dedup, multimodal, similarity, text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d.persist()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def embs(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    e.persist()
    yield e
    e.unpersist()


class TestDedup:
    def test_exact_dedup_matches_pandas(self, spark, docs):
        got = dedup.exact_dedup(docs).toPandas().sort_values("keep_id").reset_index(drop=True)
        pdf = docs.toPandas()
        exp = (
            pdf.groupby("text")
            .agg(keep_id=("doc_id", "min"), dup_count=("doc_id", "size"))
            .reset_index(drop=True)
            .sort_values("keep_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp[["keep_id", "dup_count"]], check_dtype=False)

    def test_minhash_self_similarity(self, spark):
        # identical texts must collide in every band -> est_jaccard == 1
        rows = [(i, "the quick brown fox jumps over the lazy dog " * 3) for i in range(4)]
        rows += [(10, "completely different content about spark pipelines and logs")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = dedup.minhash_lsh_pairs(df, threshold=0.9).toPandas()
        got_pairs = set(map(tuple, pairs[["id_a", "id_b"]].values))
        assert {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)} <= got_pairs
        assert not any(10 in p for p in got_pairs)
        assert (pairs["est_jaccard"] == 1.0).all()

    def test_minhash_near_duplicates_found(self, spark):
        base = "spark pipelines process log lines with vectorized parsing at scale " * 4
        rows = [(1, base), (2, base.replace("scale", "speed", 1)), (3, "unrelated short text")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = dedup.minhash_lsh_pairs(df, threshold=0.5).toPandas()
        assert (1, 2) in set(map(tuple, pairs[["id_a", "id_b"]].values))

    def test_minhash_exact_verify_matches_reference(self, spark):
        """verify='exact' jaccard against a naive byte-shingle set
        reference, on a corpus shaped to exercise the grouped verify
        kernel: cliques (many pairs sharing id_b in one batch), dispersed
        pairs, short (<k) rows, empty text, and multi-byte unicode."""
        k = 5

        def ref_jac(x: str, y: str) -> float:
            bx, by = (x or "").encode(), (y or "").encode()
            sx = {bytes(bx[i:i + k]) for i in range(max(len(bx) - k + 1, 1))}
            sy = {bytes(by[i:i + k]) for i in range(max(len(by) - k + 1, 1))}
            return len(sx & sy) / len(sx | sy)

        base = "spark pipelines process log lines with vectorized parsing "
        rows = []
        for i in range(12):  # near-dup clique (high jaccard, all pairs)
            rows.append((i, base * 3 + f"tail {i % 3}"))
        for i in range(12, 24):  # second clique, overlapping shingles
            rows.append((i, base * 2 + "different middle section " + base))
        rows += [
            (30, "ab"),           # shorter than k: sentinel shingle
            (31, "ab"),           # identical short row
            (32, ""),             # empty text
            (33, "héllo wörld über café " * 6),   # multi-byte utf-8
            (34, "héllo wörld über cafe " * 6),   # near-dup of 33
            (35, "wholly unrelated content entirely"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = dedup.minhash_lsh_pairs(
            df, threshold=0.0, num_perm=16, bands=8, verify="exact"
        ).toPandas()
        assert len(got) > 60  # cliques must actually produce grouped pairs
        texts = dict(rows)
        for r in got.itertuples():
            expect = ref_jac(texts[r.id_a], texts[r.id_b])
            assert abs(r.jaccard - round(expect, 6)) < 5e-7, (
                r.id_a, r.id_b, r.jaccard, expect,
            )
        # short-row sentinel pair and the unicode near-dup pair survive
        got_pairs = set(map(tuple, got[["id_a", "id_b"]].values))
        assert (30, 31) in got_pairs
        assert (33, 34) in got_pairs

    def test_minhash_deterministic(self, spark):
        df = spark.createDataFrame([(i, f"some text number {i % 3} repeated") for i in range(9)],
                                   ["doc_id", "text"])
        a = dedup.minhash_signatures(df).toPandas().sort_values("doc_id")
        b = dedup.minhash_signatures(df).toPandas().sort_values("doc_id")
        assert all(list(x) == list(y) for x, y in zip(a["signature"], b["signature"]))

    def test_simhash_identical_and_near(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [(1, base), (2, base), (3, base.replace("kappa", "lambda")),
                (4, "wholly different words entirely here now")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(df).collect()}
        assert sigs[1] == sigs[2]
        ham13 = bin(sigs[1] ^ sigs[3]).count("1")
        ham14 = bin(sigs[1] ^ sigs[4]).count("1")
        assert ham13 < ham14
        pairs = dedup.simhash_near_pairs(df, max_hamming=0).toPandas()
        assert (1, 2) in set(map(tuple, pairs[["id_a", "id_b"]].values))

    def test_ngram_jaccard_exact(self, spark):
        rows = [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c x y")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = dedup.ngram_jaccard_pairs(df, n=2, threshold=0.0).toPandas()
        m = {(r.id_a, r.id_b): r.jaccard for r in pairs.itertuples()}
        assert m[(1, 2)] == 1.0
        # grams(1): {ab,bc,cd,de}; grams(3): {ab,bc,cx,xy}; inter=2, union=6
        assert abs(m[(1, 3)] - 2 / 6) < 1e-4  # jaccard is round()ed to 4dp


class TestSimilarity:
    def test_brute_force_matches_numpy(self, spark, embs):
        pdf = embs.toPandas()
        queries = [(int(r.vec_id), list(r.embedding)) for r in pdf.head(3).itertuples()]
        got = similarity.brute_force_topk(embs, queries, k=5).toPandas()
        mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        for qid, qv in queries:
            q = np.asarray(qv) / np.linalg.norm(qv)
            sims = mat @ q
            sims[ids == qid] = -np.inf
            order = np.lexsort((ids, -sims))[:5]
            exp_ids = list(ids[order])
            got_q = got[got["query_id"] == qid].sort_values("rank")
            assert list(got_q["vec_id"]) == exp_ids, qid
            np.testing.assert_allclose(
                got_q["cosine"].to_numpy(), np.sort(sims)[::-1][:5], atol=1e-5
            )

    def test_ivf_recall(self, spark, embs):
        pdf = embs.toPandas()
        queries = [(int(r.vec_id), list(r.embedding)) for r in pdf.head(5).itertuples()]
        exact = similarity.brute_force_topk(embs, queries, k=5).toPandas()
        approx = similarity.ivf_topk(embs, queries, k=5, nlist=8, nprobe=4).toPandas()
        recalls = []
        for qid, _ in queries:
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.6, recalls  # nprobe=4 of nlist=8


class TestText:
    def test_token_count_and_quality(self, spark):
        rows = [(1, "The quick brown fox and the lazy dog."),
                (2, ""), (3, "word " * 50), (4, "!!! ??? ...")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        m = {r["doc_id"]: r for r in text.quality_score(df).collect()}
        assert m[1]["n_words"] == 8
        assert m[2]["n_words"] == 0
        assert m[3]["dup_word_ratio"] > 0.9
        assert m[4]["punct_ratio"] > 0.5
        assert 0 <= m[1]["quality"] <= 1

    def test_lang_id_on_documents(self, spark, docs):
        # documents.lang in {en,es,...}; the heuristic should beat chance
        # on rows whose text actually contains stopwords.
        got = text.lang_id(docs).select("lang", "lang_guess").toPandas()
        scored = got[got["lang_guess"] != "und"]
        if len(scored):
            acc = (scored["lang"] == scored["lang_guess"]).mean()
            assert acc >= 0.0  # sanity; synthetic text may not carry stopwords
        assert set(got["lang_guess"]) <= {"en", "es", "fr", "de", "und"}

    def test_fingerprint_order_sensitive(self, spark):
        df = spark.createDataFrame([(1, "a b c"), (2, "c b a"), (3, "a b c")],
                                   ["doc_id", "text"])
        fp = {r["doc_id"]: r["fp"] for r in text.document_fingerprints(df).collect()}
        assert fp[1] == fp[3]
        assert fp[1] != fp[2]


class TestMultimodal:
    @pytest.fixture()
    def media(self, spark, docs):
        return (
            docs.limit(20)
            .select(
                F.concat(F.lit("m-"), F.col("doc_id").cast("string")).alias("doc_id"),
                F.lit("image").alias("media_type"),
                F.encode(F.col("text"), "utf-8").alias("payload"),
            )
        )

    def test_metadata_without_decode(self, spark, media):
        got = multimodal.attach_metadata(media).select("doc_id", "meta.n_bytes", "meta.magic").toPandas()
        assert (got["n_bytes"] > 0).all()
        assert got["magic"].str.len().eq(8).all()  # 4 bytes hex

    def test_decode_unknown_codec_raises(self, spark, media):
        """Non-PPM payloads on the real path fail like a missing system
        codec — inside the executor, with the codec named."""
        with pytest.raises(Exception, match="NotImplementedError|unknown image codec"):
            multimodal.decode_image(media, fake=False).collect()

    def test_real_ppm_decode(self, spark):
        """fake=False REALLY decodes binary PPM: dimensions from the
        header, features from the pixel bytes."""
        import numpy as np

        w, h = 4, 3
        pixels = bytes(range(0, 256, 256 // (w * h * 3)))[: w * h * 3]
        payload = b"P6\n%d %d\n255\n" % (w, h) + pixels
        df = spark.createDataFrame([("p1", payload)], "doc_id string, payload binary")
        row = multimodal.decode_image(df, fake=False).collect()[0]
        assert (row["width"], row["height"]) == (w, h)
        exp = np.bincount(np.frombuffer(pixels, np.uint8) >> 5, minlength=8)
        assert np.allclose(row["features"], exp / exp.sum(), atol=1e-6)

    def test_truncated_ppm_raises(self, spark):
        df = spark.createDataFrame(
            [("p1", b"P6\n4 3\n255\n" + b"ab")], "doc_id string, payload binary"
        )
        with pytest.raises(Exception, match="truncated PPM"):
            multimodal.decode_image(df, fake=False).collect()

    def test_fake_decode_deterministic_features(self, spark, media):
        a = multimodal.decode_image(media, fake=True).toPandas().sort_values("doc_id")
        b = multimodal.decode_image(media, fake=True).toPandas().sort_values("doc_id")
        assert list(a["width"]) == list(b["width"])
        for fa in a["features"]:
            assert len(fa) == 8
            assert abs(sum(fa) - 1.0) < 1e-5

    def test_frame_sampling_shape(self, spark, media):
        frames = multimodal.sample_frames(media, every_n_bytes=32, max_frames=3).toPandas()
        assert (frames["frame_idx"] < 3).all()
        assert frames.groupby("doc_id")["frame_idx"].nunique().le(3).all()
        assert frames["frame_bytes"].map(len).le(32).all()


class TestCosineLSH:
    def test_planted_dups_exact_recall_and_values(self, spark):
        """200 random vectors + 20 planted near-dups: the LSH pair set at
        threshold 0.95 must equal the exact numpy pair set, and the
        in-bucket cosines must match numpy to 1e-6 (they're computed
        exactly, LSH only prunes candidates)."""
        rng = np.random.default_rng(3)
        base = rng.normal(size=(200, 32))
        dups = base[:20] + rng.normal(scale=0.02, size=(20, 32))
        mat = np.vstack([base, dups])
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        got = dedup.cosine_lsh_pairs(df, threshold=0.95).toPandas()
        got_pairs = {(r.id_a, r.id_b): r.cosine for r in got.itertuples()}

        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = nm @ nm.T
        iu = np.triu_indices(len(mat), 1)
        exp = {
            (int(i), int(j)): round(float(sims[i, j]), 6)
            for i, j in zip(*iu)
            if round(float(sims[i, j]), 6) >= 0.95
        }
        assert set(got_pairs) == set(exp)
        for k in exp:
            assert abs(got_pairs[k] - exp[k]) < 2e-6, k

    def test_no_collect_plan(self, spark):
        """The LSH path is lazy end-to-end: building the pair plan must
        not trigger any job (the old exact path collected the corpus at
        plan-build time)."""
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup() or [])
        rows = [(i, [float(i), 1.0]) for i in range(10)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        _ = dedup.cosine_lsh_pairs(df, threshold=0.9)  # no action
        after = len(tracker.getJobIdsForGroup() or [])
        assert after == before

    def test_deterministic_across_runs(self, spark):
        rng = np.random.default_rng(5)
        mat = rng.normal(size=(50, 16))
        mat[10] = mat[0] * 1.5
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = sorted(map(tuple, dedup.cosine_lsh_pairs(df, 0.99).select("id_a", "id_b").collect()))
        b = sorted(map(tuple, dedup.cosine_lsh_pairs(df, 0.99).select("id_a", "id_b").collect()))
        assert a == b and (0, 10) in a


class TestDedupScaleVariants:
    def test_exact_dedup_by_hash_matches_by_text(self, spark, docs):
        a = sorted(map(tuple, dedup.exact_dedup(docs).collect()))
        b = sorted(map(tuple, dedup.exact_dedup(docs, by_hash=True).collect()))
        assert a == b

    def test_ngram_max_df_drops_stopgrams_only_downward(self, spark):
        """The stopgram cut may only shrink Jaccard scores (denominators
        are pre-cut), never add pairs."""
        rows = [(i, f"the common prefix is shared unique{i} tail{i}") for i in range(20)]
        rows += [(100, "alpha beta gamma delta"), (101, "alpha beta gamma delta")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        exact = {(r.id_a, r.id_b): r.jaccard
                 for r in dedup.ngram_jaccard_pairs(df, n=2, threshold=0.01).collect()}
        capped = {(r.id_a, r.id_b): r.jaccard
                  for r in dedup.ngram_jaccard_pairs(df, n=2, threshold=0.01, max_df=5).collect()}
        assert set(capped) <= set(exact)
        for k, v in capped.items():
            assert v <= exact[k] + 1e-9
        assert capped[(100, 101)] == 1.0  # rare-gram pair untouched

    def test_zero_vectors_never_pair(self, spark):
        """0/0 cosine is NaN and Spark ranks NaN above all doubles — the
        guard must define zero-norm cosine as 0 so zero vectors (failed/
        padded embeddings) are never emitted as near-duplicates."""
        rng = np.random.default_rng(9)
        rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(20)]
        rows += [(100, [0.0] * 8), (101, [0.0] * 8)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = dedup.cosine_lsh_pairs(df, threshold=0.5).toPandas()
        ids = set(got["id_a"]) | set(got["id_b"])
        assert 100 not in ids and 101 not in ids
        assert got["cosine"].notna().all()


class TestConnectedComponents:
    def test_chain_collapses_to_one_component(self, spark):
        """A path graph (1-2, 2-3, 3-4, plus an isolated pair 10-11) must
        label every chain member with the chain minimum — exactly the
        case the one-hop keep-lowest-id policy cannot collapse."""
        from redeye_spark.operators import dedup

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
        )
        got = {r["doc_id"]: r["component"]
               for r in dedup.connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_max_iters_caps_rounds(self, spark):
        """The round cap must bound a long path graph's label walk."""
        from redeye_spark.operators import dedup

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 9)], ["id_a", "id_b"]
        )
        got = {r["doc_id"]: r["component"]
               for r in dedup.connected_components(pairs, max_iters=3).collect()}
        # after 3 rounds labels have walked <= ~2^? hops: not fully
        # converged necessarily, but every label is a valid upper bound
        assert all(v <= k for k, v in got.items())
        full = {r["doc_id"]: r["component"]
                for r in dedup.connected_components(pairs).collect()}
        assert set(full.values()) == {1}


class TestSampling:
    def test_split_is_input_order_invariant(self, spark, docs):
        """The split of a given doc_id must not depend on partitioning or
        row order — the reproducibility property rand()-based
        randomSplit lacks."""
        from redeye_spark.operators import sampling

        a = {r["doc_id"]: r["split"]
             for r in sampling.train_val_test_split(docs).collect()}
        shuffled = docs.repartition(7).sortWithinPartitions(F.desc("doc_id"))
        b = {r["doc_id"]: r["split"]
             for r in sampling.train_val_test_split(shuffled).collect()}
        assert a == b
        # rough proportions at 500 docs (binomial: generous bands)
        from collections import Counter
        c = Counter(a.values())
        assert 0.7 <= c["train"] / len(a) <= 0.9
        assert c["train"] + c["val"] + c["test"] == len(a)

    def test_split_partitions_the_corpus(self, spark, docs):
        from redeye_spark.operators import sampling

        out = sampling.train_val_test_split(docs)
        assert out.count() == docs.count()
        assert set(r["split"] for r in out.select("split").distinct().collect()) \
            <= {"train", "val", "test"}

    def test_stratified_sample_deterministic_and_stratified(self, spark, docs):
        from redeye_spark.operators import sampling

        a = sorted(r["doc_id"] for r in sampling.stratified_sample(docs, 0.2).collect())
        b = sorted(r["doc_id"] for r in sampling.stratified_sample(docs, 0.2).collect())
        assert a == b and 0 < len(a) < docs.count()
        # monotone in fraction: smaller sample nests inside larger
        small = set(r["doc_id"] for r in sampling.stratified_sample(docs, 0.1).collect())
        assert small <= set(a)

    def test_seed_changes_assignment(self, spark, docs):
        from redeye_spark.operators import sampling

        a = {r["doc_id"]: r["split"]
             for r in sampling.train_val_test_split(docs, seed=1).collect()}
        b = {r["doc_id"]: r["split"]
             for r in sampling.train_val_test_split(docs, seed=2).collect()}
        assert a != b


class TestDecontaminate:
    def test_planted_overlap_found_and_clean_docs_kept(self, spark):
        from redeye_spark.operators import dedup

        train = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta"),
             (2, "totally different words here entirely unrelated"),
             (3, "prefix alpha beta gamma delta epsilon suffix")],
            ["doc_id", "text"],
        )
        ev = spark.createDataFrame(
            [(100, "xx alpha beta gamma delta epsilon yy")], ["doc_id", "text"]
        )
        got = sorted(r["doc_id"] for r in
                     dedup.contaminated_ids(train, ev, n=5).collect())
        assert got == [1, 3]

    def test_short_docs_never_contaminate(self, spark):
        from redeye_spark.operators import dedup

        train = spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"])
        ev = spark.createDataFrame([(9, "alpha beta gamma")], ["doc_id", "text"])
        assert dedup.contaminated_ids(train, ev, n=5).count() == 0


class TestTfIdf:
    def test_rare_term_outranks_common(self, spark):
        from redeye_spark.operators import text as text_op

        df = spark.createDataFrame(
            [(1, "common zebra zebra common"),
             (2, "common common filler filler"),
             (3, "common filler other words")],
            ["doc_id", "text"],
        )
        top = {(r["doc_id"], r["rank"]): r["term"]
               for r in text_op.top_tfidf_terms(df, k=2).collect()}
        # zebra: tf=2, df=1 -> 2*(ln(4/2)+1)=3.39 beats common: tf=2, df=3 -> 2.0
        assert top[(1, 1)] == "zebra"


class TestFrameSamplingEdges:
    def test_null_and_short_payloads(self, spark):
        from redeye_spark.operators import multimodal

        df = spark.createDataFrame(
            [("a", b"0123456789"), ("b", None), ("c", b"xy")],
            "doc_id string, payload binary",
        )
        got = {(r["doc_id"], r["frame_idx"]): bytes(r["frame_bytes"])
               for r in multimodal.sample_frames(df, every_n_bytes=4, max_frames=8).collect()}
        # 'a': 10 bytes -> 2 full frames; 'b': none; 'c': shorter than a
        # frame -> one frame of the whole payload
        assert got == {("a", 0): b"0123", ("a", 1): b"4567", ("c", 0): b"xy"}


class TestMultiprobeLSH:
    def test_multiprobe_improves_recall_and_stays_exact(self, spark):
        """Under a deliberately low-recall config (2 bands of 12 bits),
        1-bit-flip probing must recover strictly more of the exact pair
        set while emitting ONLY true pairs (cosine is re-verified
        exactly for candidates, so precision is structural)."""
        import numpy as np
        from redeye_spark.operators import dedup

        rng = np.random.default_rng(11)
        base = rng.normal(size=(30, 32))
        rows, exact = [], set()
        vid = 0
        for i in range(30):
            a = base[i] / np.linalg.norm(base[i])
            # |noise| ~ (0.04+0.002i)*sqrt(32): pair cosines spread ~0.85-0.99
            noise = rng.normal(size=32) * (0.04 + 0.002 * i)
            b = a + noise
            b = b / np.linalg.norm(b)
            rows.append((vid, a.tolist())); rows.append((vid + 1, b.tolist()))
            if float(a @ b) >= 0.9:
                exact.add((vid, vid + 1))
            vid += 2
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        kw = dict(threshold=0.9, bits_per_band=12, bands=2, seed=5)
        single = set(map(tuple, (r[:2] for r in dedup.cosine_lsh_pairs(df, **kw)
                                 .select("id_a", "id_b").collect())))
        multi = set(map(tuple, (r[:2] for r in dedup.cosine_lsh_pairs(df, multiprobe=True, **kw)
                                .select("id_a", "id_b").collect())))
        assert exact, "test corpus must contain true pairs"
        assert single <= multi  # probing only ADDS candidates
        assert multi <= exact   # every emitted pair is exactly verified
        assert len(multi) > len(single), (len(single), len(multi), len(exact))
        assert len(multi) / len(exact) >= 0.6


class TestReviewRegressions:
    """Round-3 code-review findings, pinned."""

    def test_simhash_keeps_null_text_docs(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, None), (3, "   ")],
            "doc_id long, text string",
        )
        sigs = {r["doc_id"]: r["simhash"]
                for r in dedup.simhash_signatures(df).collect()}
        assert set(sigs) == {1, 2, 3}       # NULL-text doc must not vanish
        assert sigs[2] == 0 and sigs[3] == 0  # both degenerate -> 0

    def test_edge_whitespace_is_not_contamination(self, spark):
        """A leading-whitespace empty token must not turn an (n-1)-word
        overlap into an n-gram match."""
        train = spark.createDataFrame([(1, "\ta b c d tail")], ["doc_id", "text"])
        ev = spark.createDataFrame([(9, " a b c d other")], ["doc_id", "text"])
        assert dedup.contaminated_ids(train, ev, n=5).count() == 0


class TestChunkTokens:
    def _chunks(self, spark, toks, block, stride):
        from redeye_spark.operators.sequences import chunk_tokens

        df = spark.createDataFrame([(1, toks)], "doc_id long, tokens array<int>")
        rows = chunk_tokens(df, "tokens", block=block, stride=stride) \
            .orderBy("chunk_idx").collect()
        return [r["chunk"] for r in rows]

    def test_short_sequence_single_chunk(self, spark):
        assert self._chunks(spark, [1, 2, 3], 8, 8) == [[1, 2, 3]]

    def test_exact_block_boundary(self, spark):
        toks = list(range(8))
        assert self._chunks(spark, toks, 8, 8) == [toks]
        assert self._chunks(spark, toks + [9], 8, 8) == [toks, [9]]

    def test_overlap_and_tail(self, spark):
        got = self._chunks(spark, list(range(10)), block=6, stride=4)
        assert got == [[0, 1, 2, 3, 4, 5], [4, 5, 6, 7, 8, 9]]

    def test_every_token_covered_no_redundant_tail(self, spark):
        toks = list(range(100))
        got = self._chunks(spark, toks, block=16, stride=12)
        covered = sorted({t for c in got for t in c})
        assert covered == toks                      # full coverage
        for prev, cur in zip(got, got[1:]):         # progress every chunk
            assert set(cur) - set(prev)

    def test_empty_sequence_yields_no_rows(self, spark):
        assert self._chunks(spark, [], 8, 8) == []

    def test_bad_args_raise(self, spark):
        from redeye_spark.operators.sequences import chunk_tokens

        df = spark.createDataFrame([(1, [1])], "doc_id long, tokens array<int>")
        with pytest.raises(ValueError, match="positive"):
            chunk_tokens(df, "tokens", block=0)
        with pytest.raises(ValueError, match="drop tokens"):
            chunk_tokens(df, "tokens", block=4, stride=5)


class TestHoppingCounts:
    def test_every_row_lands_in_exactly_two_windows(self, spark):
        from redeye_spark.operators.aggregate import hopping_counts

        df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = hopping_counts(df, "ts", ["event_type"])
        total = out.agg(F.sum("n")).collect()[0][0]
        assert total == 2 * df.count()

    def test_window_width_and_alignment(self, spark):
        """Checked in Spark (epoch arithmetic), not on collected
        datetimes — collect() renders timestamps in the host zone, which
        would break the :00/:30 assertion on :15/:45-offset hosts."""
        from redeye_spark.operators.aggregate import hopping_counts

        df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = hopping_counts(df, "ts", ["event_type"])
        bad = out.filter(
            (F.unix_timestamp("window_start") % 1800 != 0)
            | (F.unix_timestamp("window_end") - F.unix_timestamp("window_start") != 3600)
        ).count()
        assert bad == 0


class TestApproxDistinct:
    """approx_count_distinct is the 100 TB distinct-cardinality path
    (HLL++ sketch, bounded memory, partial-aggregable). It cannot carry
    a value-exact DuckDB oracle (different HLL implementations), so the
    rsd error contract is pinned here instead."""

    def test_hll_within_rsd_of_exact(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        row = df.agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
        ).collect()[0]
        assert abs(row["approx"] - row["exact"]) <= max(3, 0.05 * row["exact"]), row

    def test_sketch_is_partial_aggregable(self, spark):
        """The sketch must partial-aggregate map-side (two HashAggregate
        phases with the HLL buffer crossing the exchange) — that is the
        property that makes it the scale path."""
        from tests.test_plans import plan_of

        df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        p = plan_of(df.groupBy("event_type").agg(
            F.approx_count_distinct("user_id").alias("nd")))
        assert p.count("HashAggregate") >= 2, p
        assert "approx_count_distinct" in p, p

    def test_chunk_output_collision_rejected(self, spark):
        from redeye_spark.operators.sequences import chunk_tokens

        df = spark.createDataFrame([(1, [1, 2], 0)],
                                   "doc_id long, tokens array<int>, chunk_idx int")
        with pytest.raises(ValueError, match="already exist"):
            chunk_tokens(df, "tokens", block=2)


class TestWavDecode:
    def _wav(self, data: bytes, rate=8000, channels=1, bits=8, extra_chunk=False) -> bytes:
        import struct

        fmt = struct.pack("<HHIIHH", 1, channels, rate,
                          rate * channels * bits // 8, channels * bits // 8, bits)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        if extra_chunk:
            chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size: pad
        chunks += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_8bit_mono(self):
        from redeye_spark.operators.multimodal import _decode_wav

        sr, nc, ns, f = _decode_wav(self._wav(bytes(range(100))))
        assert (sr, nc, ns) == (8000, 1, 100)
        assert abs(sum(f) - 1.0) < 1e-6
        # bytes 0..99 span buckets 0..3 (values < 128)
        assert f[0] > 0 and f[4] == 0.0

    def test_16bit_stereo_sample_count(self):
        from redeye_spark.operators.multimodal import _decode_wav

        data = bytes(400)  # 400 bytes / (2 bytes * 2 ch) = 100 frames
        sr, nc, ns, _ = _decode_wav(self._wav(data, rate=44100, channels=2, bits=16))
        assert (sr, nc, ns) == (44100, 2, 100)

    def test_chunk_walk_skips_extra_chunks(self):
        from redeye_spark.operators.multimodal import _decode_wav

        sr, nc, ns, _ = _decode_wav(self._wav(bytes(64), extra_chunk=True))
        assert ns == 64

    def test_unknown_magic_raises_not_implemented(self):
        from redeye_spark.operators.multimodal import _decode_wav

        with pytest.raises(NotImplementedError, match="RIFF/WAVE"):
            _decode_wav(b"OggS" + bytes(60))

    def test_unsupported_variant_raises(self):
        from redeye_spark.operators.multimodal import _decode_wav

        import struct
        bad = self._wav(bytes(8), bits=8)
        # flip audio_format to 3 (IEEE float)
        i = bad.index(b"fmt ") + 8
        bad = bad[:i] + struct.pack("<H", 3) + bad[i + 2:]
        with pytest.raises(NotImplementedError, match="unsupported WAV"):
            _decode_wav(bad)

    def test_missing_data_chunk_raises(self):
        from redeye_spark.operators.multimodal import _decode_wav

        import struct
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        with pytest.raises(ValueError, match="missing fmt/data"):
            _decode_wav(payload)

    def test_decode_audio_operator_end_to_end(self, spark):
        from redeye_spark.operators.multimodal import decode_audio

        df = spark.createDataFrame(
            [("a", self._wav(bytes([65] * 50))), ("b", None)],
            "doc_id string, payload binary",
        )
        rows = {r["doc_id"]: r for r in decode_audio(df).collect()}
        assert rows["a"]["n_samples"] == 50 and rows["a"]["sample_rate"] == 8000
        assert rows["a"]["features"][2] == 1.0  # byte 65 -> bucket 2
        assert rows["b"]["n_samples"] is None

    def test_truncated_data_chunk_raises(self):
        import struct
        from redeye_spark.operators.multimodal import _decode_wav

        full = self._wav(bytes(100))
        with pytest.raises(ValueError, match="truncated WAV"):
            _decode_wav(full[:-40])  # cut 40 PCM bytes off the end


class TestVideoDecode:
    """YUV4MPEG2 container walk (operators/multimodal._decode_y4m +
    decode_video/sample_video_frames): real frame geometry, truncation
    rejection, codec gating, and container-aware sampling."""

    def _payload(self, w=4, h=2, n=3, chroma="C444", fps=b"F30:1"):
        mult = {"C444": 3, "C420": 3 / 2, "Cmono": 1}[chroma]
        fb = int(w * h * mult)
        body = bytes((i * 37) % 256 for i in range(fb))
        hdr = b"YUV4MPEG2 W%d H%d %s %s\n" % (w, h, fps, chroma.encode())
        return hdr + b"".join(b"FRAME\n" + body for _ in range(n)), body

    def test_decode_video_geometry_and_features(self, spark):
        p, body = self._payload(w=4, h=2, n=3)
        df = spark.createDataFrame([("d1", p), ("d2", None)],
                                   "doc_id string, payload binary")
        rows = {r["doc_id"]: r for r in multimodal.decode_video(df).collect()}
        r = rows["d1"]
        assert (r["width"], r["height"], r["fps_num"], r["fps_den"],
                r["n_frames"]) == (4, 2, 30, 1, 3)
        hist = np.bincount(np.frombuffer(body, np.uint8) >> 5, minlength=8)
        exp = (hist / hist.sum()).astype(np.float32)
        assert np.allclose(r["features"], exp)
        assert rows["d2"]["n_frames"] is None  # NULL payload passthrough

    def test_truncated_frame_rejected(self, spark):
        p, _ = self._payload(n=2)
        df = spark.createDataFrame([("d", p[:-5])], "doc_id string, payload binary")
        with pytest.raises(Exception, match="truncated Y4M"):
            multimodal.decode_video(df).collect()

    def test_unknown_codec_raises_not_implemented(self, spark):
        df = spark.createDataFrame([("d", b"\x00\x00\x01\xba mpeg-ps")],
                                   "doc_id string, payload binary")
        with pytest.raises(Exception, match="only YUV4MPEG2"):
            multimodal.decode_video(df).collect()

    def test_sample_video_frames_container_aware(self, spark):
        p, body = self._payload(w=2, h=2, n=5)
        df = spark.createDataFrame([("d", p)], "doc_id string, payload binary")
        got = multimodal.sample_video_frames(df, stride=2, max_frames=2).collect()
        # frames 0 and 2 (container indices), each the REAL planar bytes
        assert [(r["frame_idx"], bytes(r["frame_bytes"])) for r in
                sorted(got, key=lambda r: r["frame_idx"])] == [(0, body), (2, body)]

    def test_sample_matches_full_walk(self, spark):
        p, body = self._payload(w=2, h=2, n=4)
        df = spark.createDataFrame([("d", p)], "doc_id string, payload binary")
        full = multimodal.sample_video_frames(df, stride=1, max_frames=100).collect()
        assert len(full) == 4 and all(bytes(r["frame_bytes"]) == body for r in full)


class TestTwoPhaseCC:
    """Large-star/small-star CC: equivalence with plain label
    propagation, and the O(log n) round bound that motivates it."""

    def test_matches_plain_cc_on_random_graph(self, spark):
        rng = np.random.default_rng(3)
        pairs = [(int(a), int(b)) for a, b in
                 zip(rng.integers(0, 200, 150), rng.integers(0, 200, 150))]
        df = spark.createDataFrame(pairs, ["id_a", "id_b"])
        plain = {tuple(r) for r in
                 dedup.connected_components(df, id_col="id").collect()}
        star = {tuple(r) for r in
                dedup.connected_components_twophase(df, id_col="id").collect()}
        assert star == plain

    def test_thousand_link_chain_converges_in_log_rounds(self, spark):
        """Worst case for label propagation: a 10^3-long path needs
        ~10^3 propagation rounds, but large-star/small-star must close
        it within ~2*log2(n) alternations — max_iters=12 is the pinned
        bound (2^12 >> 1000 path length)."""
        chain = spark.range(1000).selectExpr("id AS id_a", "id + 1 AS id_b")
        got = dedup.connected_components_twophase(
            chain, id_col="id", max_iters=12).collect()
        assert len(got) == 1001
        assert {r["component"] for r in got} == {0}

    def test_nonconvergence_raises(self, spark):
        chain = spark.range(100).selectExpr("id AS id_a", "id + 1 AS id_b")
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup.connected_components_twophase(chain, id_col="id", max_iters=1)

    def test_singletons_and_empty(self, spark):
        df = spark.createDataFrame([(5, 5), (7, 7)], ["id_a", "id_b"])
        got = {tuple(r) for r in
               dedup.connected_components_twophase(df, id_col="id").collect()}
        assert got == {(5, 5), (7, 7)}


class TestMixCorpora:
    def test_mix_is_deterministic_and_weighted(self, spark):
        from redeye_spark.operators import sampling

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
            .select("doc_id", "text")
        a = docs.filter("doc_id % 2 = 0")
        b = docs.filter("doc_id % 2 = 1")
        mix = [(a, "web", 0.75), (b, "code", 0.25)]
        r1 = sampling.mix_corpora(mix).groupBy("corpus").count().toPandas()
        r2 = sampling.mix_corpora(mix).groupBy("corpus").count().toPandas()
        got = dict(zip(r1["corpus"], r1["count"]))
        assert got == dict(zip(r2["corpus"], r2["count"]))  # retry-stable
        # realized weights quantized at /256: allow generous tolerance
        assert abs(got["web"] / a.count() - 0.75) < 0.1
        assert abs(got["code"] / b.count() - 0.25) < 0.1

    def test_mix_independent_draws_per_corpus(self, spark):
        """The SAME id must draw independently under different corpus
        names (the bucket is keyed by name|id)."""
        from redeye_spark.operators import sampling

        docs = spark.range(400).selectExpr("id AS doc_id")
        m = sampling.mix_corpora(
            [(docs, "x", 0.5), (docs, "y", 0.5)], id_col="doc_id"
        ).toPandas()
        xs = set(m[m.corpus == "x"].doc_id)
        ys = set(m[m.corpus == "y"].doc_id)
        assert xs != ys  # independent, not the same half twice
        assert 0 < len(xs & ys) < min(len(xs), len(ys))

    def test_mix_validates_inputs(self, spark):
        from redeye_spark.operators import sampling

        df = spark.range(3).selectExpr("id AS doc_id")
        with pytest.raises(ValueError, match="at least one"):
            sampling.mix_corpora([])
        with pytest.raises(ValueError, match="weight"):
            sampling.mix_corpora([(df, "x", 1.5)])


class TestY4MProperty:
    def test_random_containers_roundtrip(self, spark):
        """Property sweep: random geometry/chroma/frame-count containers
        must decode to exactly the predicted geometry and an exactly
        recomputable histogram."""
        rng = np.random.default_rng(17)
        rows = []
        expected = {}
        for i in range(24):
            chroma = ["C444", "C420", "Cmono"][i % 3]
            w = int(rng.integers(1, 7)) * (2 if chroma == "C420" else 1)
            h = int(rng.integers(1, 5)) * (2 if chroma == "C420" else 1)
            nf = int(rng.integers(1, 5))
            mult = {"C444": 3.0, "C420": 1.5, "Cmono": 1.0}[chroma]
            fb = int(w * h * mult)
            body = bytes(rng.integers(0, 256, fb, dtype=np.uint8))
            payload = (b"YUV4MPEG2 W%d H%d F24:1 %s\n" % (w, h, chroma.encode())
                       + (b"FRAME\n" + body) * nf)
            rows.append((f"d{i}", payload))
            hist = np.bincount(np.frombuffer(body, np.uint8) >> 5, minlength=8)
            expected[f"d{i}"] = (w, h, nf, (hist / hist.sum()).astype(np.float32))
        df = spark.createDataFrame(rows, "doc_id string, payload binary")
        got = {r["doc_id"]: r for r in multimodal.decode_video(df).collect()}
        assert len(got) == 24
        for k, (w, h, nf, feats) in expected.items():
            r = got[k]
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf), k
            assert np.allclose(r["features"], feats), k


class TestIvfIndex:
    def test_indexed_equals_inmemory_and_prunes_partitions(self, spark, tmp_path):
        """build -> load -> query must return exactly what ivf_topk
        returns with the same centroids (float64 round-trips losslessly
        through parquet), and the indexed probe must prune PARTITIONS
        of the stored corpus, not post-filter a full scan."""
        from tests.test_plans import plan_of

        emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        queries = [(r["vec_id"], r["embedding"]) for r in emb.limit(3).collect()]
        path = str(tmp_path / "ivf")

        stats = similarity.build_ivf_index(emb, path, nlist=8)
        assert stats["nlist"] == 8 and stats["dim"] == 64

        cents = similarity.load_ivf_centroids(spark, path)
        direct = similarity.ivf_topk(
            emb, queries, k=5, nprobe=3, centroids=cents
        ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        indexed = similarity.ivf_topk_indexed(
            spark, path, queries, k=5, nprobe=3
        ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(indexed, direct, check_dtype=False)
        assert len(indexed) == 15

        plan = plan_of(similarity.ivf_topk_indexed(spark, path, queries, k=5, nprobe=3))
        import re
        m = re.search(r"PartitionFilters: \[[^\]]*list_id", plan)
        assert m, plan

    def test_rebuild_is_deterministic(self, spark, tmp_path):
        emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        a = str(tmp_path / "a"); b = str(tmp_path / "b")
        similarity.build_ivf_index(emb, a, nlist=8)
        similarity.build_ivf_index(emb, b, nlist=8)
        ca = similarity.load_ivf_centroids(spark, a)
        cb = similarity.load_ivf_centroids(spark, b)
        assert np.array_equal(ca, cb)


class TestBmpCorruption:
    def test_truncated_palette_and_bad_index_classified(self):
        import struct
        from redeye_spark.operators.multimodal import _decode_bmp
        import pytest as _pytest

        def bmp8(n_colors, pal_bytes, idx):
            w = h = 4
            data = bytes(idx) * 4
            dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                              len(data), 0, 0, n_colors, 0)
            off = 14 + 40 + len(pal_bytes)
            hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
            return hdr + dib + pal_bytes + data

        # palette declares 8 colors but carries only 2 entries
        with _pytest.raises(ValueError, match="truncated BMP palette"):
            _decode_bmp(bmp8(8, b"\x00" * 8, [0, 1, 0, 1]))
        # pixel index beyond the palette
        with _pytest.raises(ValueError, match="pixel index"):
            _decode_bmp(bmp8(2, b"\x00" * 8, [0, 1, 0, 5]))
