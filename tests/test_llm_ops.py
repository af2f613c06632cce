"""LLM-pipeline operators: dedup collapse, LSH recall, ANN recall,
text heuristics edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    with_shingles,
)
from aws_datalake_spark.operators.similarity import ann_lsh_topk, cosine_topk
from aws_datalake_spark.operators.text import lang_id, token_count_bpe_ish, token_count_ws
from tests.conftest import SF_SMOKE


def test_exact_dedup_collapses_copies(spark):
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_copies for r in exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    out = with_shingles(df, "text", "doc_id").collect()
    assert out[0]["__sh"] == []


def test_minhash_lsh_finds_near_duplicate(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "totally different words entirely here now ok yes")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(df, num_hashes=8, bands=4, jaccard_threshold=0.4).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard > 0.6


def test_lsh_recall_vs_exact_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    corpus = docs.unionByName(dups)
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(corpus, num_hashes=8, bands=4, jaccard_threshold=0.5).collect()
    }
    assert exact, "fixture should contain seeded near-dups"
    # banding with r=2 on jaccard≥0.5 pairs: recall must be high
    assert len(lsh & exact) / len(exact) >= 0.9
    assert lsh <= exact  # verification step removes false positives


def test_simhash_identical_docs_equal(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_ann_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(emb, queries, dim=64, k=5, num_planes=4).collect()
    }
    # 4 planes → 16 buckets over 500 vectors: candidates ~30 per query;
    # recall is approximate by design but must be non-degenerate
    assert len(approx & exact) / len(exact) >= 0.2
    assert all(q in {a for a, _ in approx} for q in range(5))


def test_token_counts_edge_cases(spark):
    df = spark.createDataFrame([("",), ("  ",), ("a b  c",), ("don't stop!",)], "t string")
    out = df.select(
        token_count_ws("t").alias("ws"), token_count_bpe_ish("t").alias("bpe")
    ).collect()
    assert [r.ws for r in out] == [0, 0, 3, 2]
    # "don't stop!": don + ' + t + stop + ! = 5 pieces
    assert out[3].bpe == 5


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, "el perro de la casa"), (3, "qqq www zzz")],
        "id long, t string",
    )
    out = {r.id: r.l for r in df.select("id", lang_id("t").alias("l")).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_udtf_matches_builtin_sentence_split(spark):
    from aws_datalake_spark.functions.udtf import register
    from aws_datalake_spark.operators.text import split_sentences

    register(spark)
    df = spark.createDataFrame(
        [(1, "One. Two!  Three? "), (2, "no terminator"), (3, None)],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("__udtf_docs")
    via_udtf = spark.sql(
        "SELECT doc_id, s.sentence FROM __udtf_docs, "
        "LATERAL sentence_split(text) s"
    )
    builtin = split_sentences(df)
    assert sorted((r.doc_id, r.sentence) for r in via_udtf.collect()) == sorted(
        (r.doc_id, r.sentence) for r in builtin.collect()
    )


def test_scrub_pii_counts(spark):
    from aws_datalake_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a@b.co and http://x.io/y now"), (2, "clean")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert out[1].scrubbed == "mail <EMAIL> and <URL> now"
    assert out[1].n_emails == 1 and out[1].n_urls == 1
    assert out[2].n_emails == 0 and out[2].scrubbed == "clean"


def test_resize_images_batch_contract(spark):
    from aws_datalake_spark.operators.multimodal import make_media_table, resize_images

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(30)
    out = resize_images(make_media_table(docs), target_w=8, target_h=8).collect()
    assert out, "image assets present"
    assert all(len(r.payload) == 8 * 8 * 3 for r in out)
    assert all(r.media_type == "image" for r in out)
    assert {r.width for r in out} == {8}


def test_quality_features_and_score(spark):
    from aws_datalake_spark.operators.text import quality_features, quality_score

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "!!! ??? ..."), (3, "")],
        "doc_id long, text string",
    )
    feats = {r.doc_id: r for r in quality_features(df).collect()}
    assert feats[1].q_n_tokens == 6
    assert feats[1].q_stopword_ratio > 0.2      # two 'the'
    assert feats[2].q_punct_ratio > 0.5
    assert feats[3].q_n_tokens == 0
    scores = {r.doc_id: r.quality_score for r in quality_score(df).collect()}
    assert scores[1] > scores[2]                 # prose beats punctuation soup
    assert 0.0 <= min(scores.values()) and max(scores.values()) <= 1.0


def test_doc_fingerprint_order_sensitive(spark):
    from aws_datalake_spark.operators.text import doc_fingerprint

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "doc_id long, text string"
    )
    fp = {r.doc_id: r.fingerprint for r in doc_fingerprint(df).collect()}
    assert fp[1] == fp[2]      # identical content → identical fingerprint
    assert fp[1] != fp[3]      # same tokens, different order → different


def test_embedding_neardup_finds_planted_copy(spark):
    from aws_datalake_spark.operators.similarity import cosine_neardup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    seeded = emb.unionByName(
        emb.filter(F.col("vec_id") == 7).select(
            (F.col("vec_id") + 5000).alias("vec_id"), "label", "embedding"
        )
    )
    pairs = cosine_neardup_pairs(seeded, threshold=0.99, bucket_col=F.col("label")).collect()
    assert any({p.id_a, p.id_b} == {7, 5007} for p in pairs)


def test_banded_neardup_recall_vs_exact(spark):
    """The 2-band hyperplane-LSH near-dup path must recover every
    exact-duplicate pair the brute-force cross join finds (identical
    vectors share every signature → per-band recall 1.0 on true
    copies), and never emit a pair brute force wouldn't."""
    from aws_datalake_spark.queries.llm_similarity import _neardup_banded_pairs
    from aws_datalake_spark.operators.similarity import cosine_neardup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    seeded = emb.unionByName(
        emb.filter(F.col("vec_id") < 20).select(
            (F.col("vec_id") + 5000).alias("vec_id"), "embedding"
        )
    )
    exact = {
        (p.id_a, p.id_b)
        for p in cosine_neardup_pairs(seeded, threshold=0.95).collect()
    }
    banded = {
        (p.id_a, p.id_b) for p in _neardup_banded_pairs(seeded, 0.95).collect()
    }
    assert banded <= exact              # banding can only DROP pairs
    planted = {(i, i + 5000) for i in range(20)}
    assert planted <= exact
    assert planted <= banded            # recall 1.0 on exact copies


def test_ivf_recall_vs_brute_force(spark):
    from aws_datalake_spark.operators.similarity import ann_ivf_topk, cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(emb, queries, centroids, k=5, n_probe=3).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.2


def test_approx_distinct_sketch_tolerance(spark):
    # HLL-based approx_count_distinct: mergeable sketch (the 100 TB
    # path for cardinality); assert within its advertised error
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    exact = docs.select(F.countDistinct("text")).collect()[0][0]
    approx = docs.select(F.approx_count_distinct("text", rsd=0.05)).collect()[0][0]
    assert abs(approx - exact) / exact <= 0.15


def test_cosine_topk_pandas_path_same_ranking(spark):
    from aws_datalake_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    jvm = [(r.query_id, r.neighbor_id, r.rank)
           for r in cosine_topk(emb, queries, k=5).collect()]
    pdf = [(r.query_id, r.neighbor_id, r.rank)
           for r in cosine_topk(emb, queries, k=5, use_pandas=True).collect()]
    assert sorted(jvm) == sorted(pdf)


def test_repetition_features_known_counts(spark):
    from aws_datalake_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # bigrams: ab,ba,ab,ba,ab -> top 3/5; all dup
            (2, "v w x y z"),          # all bigrams/trigrams unique
            (3, "one"),                # too short: zero grams
            (4, "a b"),                # bigram but no trigram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_features(df).collect()}
    assert got[1].n_bigrams == 5 and got[1].top_bigram_frac == 0.6
    assert got[1].dup_trigram_frac == 1.0  # aba/bab each appear twice
    assert got[2].top_bigram_frac == 0.25 and got[2].dup_trigram_frac == 0.0
    assert got[3].n_bigrams == 0 and got[3].top_bigram_frac == 0.0
    assert got[4].n_bigrams == 1 and got[4].n_trigrams == 0
    assert got[4].dup_trigram_frac == 0.0


def test_quantize_int8_norm_and_zero_vector(spark):
    from aws_datalake_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert got[1].norm == 5.0
    assert got[1].q_int8 == "76,102"  # round(127*3/5)=76, round(127*4/5)=102
    assert got[2].norm == 0.0 and got[2].q_int8 == "0,0"


def test_grouped_agg_udaf_weighted_mean(spark):
    from aws_datalake_spark.functions.udaf import weighted_mean_q6

    df = spark.createDataFrame(
        [("a", 500000, 1), ("a", 1000000, 3), ("b", 250000, 2), ("c", 900000, 0)],
        "g string, q6 long, w long",
    )
    out = {r.g: r.wq for r in df.groupBy("g").agg(
        F.round(weighted_mean_q6("q6", "w"), 6).alias("wq")).collect()}
    # a: (0.5*1 + 1.0*3)/4 = 0.875; b: 0.25; c: zero total weight -> 0.0
    assert out == {"a": 0.875, "b": 0.25, "c": 0.0}


def test_build_vocab_ranking_and_ties(spark):
    from aws_datalake_spark.operators.text import build_vocab

    df = spark.createDataFrame(
        [(1, "b a a"), (2, "a c b")], "doc_id long, text string"
    )
    out = [(r.token, r.n, r.token_id) for r in
           build_vocab(df, top_k=2).orderBy("token_id").collect()]
    # a×3 first; b and c tie at... b×2 beats c×1; ties break lexically
    assert out == [("a", 3, 1), ("b", 2, 2)]


def test_collocation_lift_known_value(spark):
    from aws_datalake_spark.operators.text import collocation_lift

    # "x y" always adjacent: c_xy=3, c_x=3, c_y=3, N=9 → lift = 3*9/9 = 3.0
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "x y z")], "doc_id long, text string"
    )
    out = {r.bigram: (r.c_ab, r.lift) for r in
           collocation_lift(df, min_count=3).collect()}
    assert out == {"x y": (3, 3.0), "y z": (3, 3.0)}


def test_profile_columns_single_scan_and_nulls(spark):
    from aws_datalake_spark.operators.dq import profile_columns

    df = spark.createDataFrame(
        [(1, None), (2, "b"), (2, "a")], "k long, s string"
    )
    out = {r.col_name: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert (out["k"].n_rows, out["k"].n_null, out["k"].n_distinct) == (3, 0, 2)
    assert (out["k"].min_s, out["k"].max_s) == ("1", "2")
    assert (out["s"].n_null, out["s"].n_distinct, out["s"].min_s) == (1, 2, "a")
    # one scan: a single aggregate node feeds the stack projection
    plan = profile_columns(df, ["k", "s"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_edit_distance_verify_confirms_and_rejects(spark):
    from aws_datalake_spark.operators.dedup import edit_distance_verify

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delt"),
         (3, "completely different words")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): (r.edit_distance, r.edit_ratio)
           for r in edit_distance_verify(pairs, corpus, max_ratio=0.2).collect()}
    # (1,2): one deleted char -> distance 1, ratio 1/22; (1,3) rejected
    assert set(out) == {(1, 2)}
    assert out[(1, 2)][0] == 1


def test_tfidf_top_terms_known_scores(spark):
    from aws_datalake_spark.operators.text import tfidf_top_terms

    # 4 docs, 2 sources. "rare" appears only in doc 1 (source s1):
    # tf=1, docfreq=1, N=4 → score 4.0 — the s1 top term. "common"
    # is in every doc: score = tf·4/4 = tf.
    df = spark.createDataFrame(
        [
            (1, "s1", "rare common"),
            (2, "s1", "common"),
            (3, "s2", "common common"),
            (4, "s2", "common"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r.source, r.rnk): (r.token, r.tf, r.docfreq, r.score)
        for r in tfidf_top_terms(df, top_k=2).collect()
    }
    assert out[("s1", 1)] == ("rare", 1, 1, 4.0)
    # s1 "common": tf=2, docfreq=4 → 2·4/4 = 2.0
    assert out[("s1", 2)] == ("common", 2, 4, 2.0)
    # s2 "common": tf=3, docfreq=4 → 3.0; only term in s2
    assert out[("s2", 1)] == ("common", 3, 4, 3.0)
    assert ("s2", 2) not in out


def test_rarity_scores_known_value(spark):
    from aws_datalake_spark.operators.text import rarity_scores

    # corpus: a a a b → n_total=4, c_a=3, c_b=1.
    # doc 1 = "a b": mean(4/3, 4/1) = (1.333333 + 4)/2 = 2.666667
    # doc 2 = "a a": mean(4/3, 4/3) = 1.333333
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a a")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.n_tokens, r.mean_inv_freq) for r in rarity_scores(df).collect()}
    assert out[1][0] == 2 and abs(out[1][1] - 2.6666665) < 1e-9
    assert out[2][0] == 2 and abs(out[2][1] - 1.333333) < 1e-9


def test_embed_documents_deterministic_unit_norm(spark):
    import math

    from aws_datalake_spark.operators.multimodal import embed_documents

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, ""), (4, "spark")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.embedding for r in embed_documents(df, dim=8).collect()}
    # identical text -> identical vector; different text -> different
    assert out[1] == out[2] and out[1] != out[4]
    # empty doc still yields a valid unit vector
    for v in out.values():
        assert len(v) == 8
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-3
    # feeds the similarity stack: re-running gives the same vectors
    again = {r.doc_id: r.embedding for r in embed_documents(df, dim=8).collect()}
    assert again == out


def test_bigram_conditional_probabilities(spark):
    from aws_datalake_spark.operators.text import bigram_conditional

    # c("x y")=2, c(x)=3 (one trailing x has no y) -> P(y|x)=0.666667
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y x")], "doc_id long, text string"
    )
    out = {r.bigram: (r.c_ab, r.c_w1, r.p_cond) for r in
           bigram_conditional(df, min_count=2).collect()}
    assert out == {"x y": (2, 3, 0.666667)}


def test_prefix_filtered_jaccard_matches_naive_index(spark):
    from aws_datalake_spark.operators.dedup import ngram_jaccard_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "a completely different sentence with other words entirely",
        "the quick brown fox jumps over the lazy dog today",
        "another unrelated line of text goes right here now",
        "the quick brown fox leaps over the lazy dog",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for t in (0.2, 0.5, 0.8):
        fast = sorted(
            map(tuple, ngram_jaccard_pairs(df, threshold=t, prefix_filter=True).collect())
        )
        naive = sorted(
            map(tuple, ngram_jaccard_pairs(df, threshold=t, prefix_filter=False).collect())
        )
        assert fast == naive, f"threshold {t}"


def test_chunk_audio_windows_and_bytes(spark):
    from aws_datalake_spark.operators.multimodal import chunk_audio

    payload = bytes(range(256)) * 3  # 768 bytes
    media = spark.createDataFrame(
        [(1, "audio", payload, len(payload), "s"),
         (2, "video", b"xx", 2, "s")],  # non-audio rows excluded
        "asset_id long, media_type string, payload binary, byte_len long, source string",
    )
    out = sorted(
        (r["chunk_idx"], r["start_byte"], r["chunk_len"], bytes(r["chunk"]))
        for r in chunk_audio(media, chunk_bytes=300).collect()
    )
    assert [(i, s, l) for i, s, l, _ in out] == [(0, 0, 300), (1, 300, 300), (2, 600, 168)]
    assert b"".join(c for _, _, _, c in out) == payload  # lossless cover
    # overlapping windows share their overlap bytes
    ov = sorted(
        (r["start_byte"], bytes(r["chunk"]))
        for r in chunk_audio(media, chunk_bytes=300, overlap=100).collect()
    )
    assert ov[0][1][-100:] == ov[1][1][:100]


def test_embed_media_chunks_deterministic_unit_norm(spark):
    import math

    from aws_datalake_spark.operators.multimodal import chunk_audio, embed_media_chunks

    media = spark.createDataFrame(
        [(1, "audio", bytes(range(200)), 200, "s")],
        "asset_id long, media_type string, payload binary, byte_len long, source string",
    )
    emb1 = {
        (r["asset_id"], r["chunk_idx"]): list(r["embedding"])
        for r in embed_media_chunks(chunk_audio(media, chunk_bytes=64)).collect()
    }
    emb2 = {
        (r["asset_id"], r["chunk_idx"]): list(r["embedding"])
        for r in embed_media_chunks(chunk_audio(media, chunk_bytes=64)).collect()
    }
    assert emb1 == emb2 and len(emb1) == 4  # ceil(200/64)
    for v in emb1.values():
        assert len(v) == 64
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5


def test_hard_negative_mining_ann_recall_vs_brute_force(spark):
    """ANN-banded hard negatives (the production path) must recover a
    non-degenerate share of the brute-force banded top-k, and every
    mined negative must respect the (0.15, 0.95) band."""
    from aws_datalake_spark.operators.similarity import ann_ivf_topk, cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    band = (0.15, 0.95)
    exact = cosine_topk(emb, queries, k=5, query_id_col="query_id", band=band)
    approx = ann_ivf_topk(
        emb, queries, centroids, k=5, n_probe=2, band=band
    )
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert all(band[0] < r.cosine < band[1] for r in approx.collect())
    # cell-pruned recall is approximate by design but must be non-degenerate
    assert len(ap & ex) / len(ex) >= 0.3


# --- segment dedup (CCNet-style) ---------------------------------------------


def test_segment_dedup_drops_boilerplate_and_reassembles(spark):
    from aws_datalake_spark.operators.segment_dedup import drop_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "cookie banner here unique alpha text"),
            (2, "cookie banner here unique beta words"),
            (3, "cookie banner here gamma content row"),
            (4, "totally distinct document four here now"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in drop_boilerplate(docs, k=3, min_df=3).collect()
    }
    # 'cookie banner here' occurs in 3 docs -> boilerplate
    assert out[1].n_seg == 2 and out[1].n_kept == 1
    assert out[1].clean_text == "unique alpha text"
    assert out[4].n_kept == 2  # untouched doc keeps both segments
    assert out[4].clean_text == "totally distinct document four here now"


def test_segment_dedup_fully_boilerplate_doc_empties(spark):
    from aws_datalake_spark.operators.segment_dedup import drop_boilerplate

    docs = spark.createDataFrame(
        [(i, "same exact text") for i in range(5)], ["doc_id", "text"]
    )
    rows = drop_boilerplate(docs, k=3, min_df=2).collect()
    assert all(r.n_kept == 0 and r.clean_text == "" for r in rows)
    assert all(r.n_seg == 1 for r in rows)


def test_segment_docs_short_doc_one_segment(spark):
    from aws_datalake_spark.operators.segment_dedup import segment_docs

    docs = spark.createDataFrame([(1, "ab"), (2, "x y z")], ["doc_id", "text"])
    segs = {(r.doc_id, r.seg_idx): r.seg for r in segment_docs(docs, k=10).collect()}
    assert segs == {(1, 0): "ab", (2, 0): "x y z"}


# --- importance weights (DSIR-inspired) --------------------------------------


def test_importance_weights_self_target_is_flat(spark):
    from aws_datalake_spark.operators.sampling import importance_weights

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a a b b"), (3, "c c d d")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in importance_weights(docs, docs).collect()}
    # target == source -> every bucket ratio is 1.0 -> weight == n_tokens
    for r in out.values():
        assert abs(r.imp_weight - r.n_tokens) < 1e-6


def test_importance_weights_favors_target_tokens(spark):
    from aws_datalake_spark.operators.sampling import importance_weights

    corpus = spark.createDataFrame(
        [(1, "tgt tgt tgt tgt"), (2, "oth oth oth oth"), (3, "tgt oth tgt oth")],
        ["doc_id", "text"],
    )
    target = corpus.filter("doc_id = 1")
    out = {r.doc_id: r.imp_weight for r in importance_weights(corpus, target).collect()}
    assert out[1] > out[3] > out[2]


def test_importance_weights_bigram_features_change_scores(spark):
    from aws_datalake_spark.operators.sampling import importance_weights

    # same unigram histogram, different bigram order: only ngram_max=2
    # can tell doc 2 and doc 3 apart relative to the target
    corpus = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b a b"), (3, "b a b a")],
        ["doc_id", "text"],
    )
    target = corpus.filter("doc_id = 1")
    uni = {r.doc_id: r.imp_weight for r in importance_weights(corpus, target).collect()}
    bi = {r.doc_id: r.imp_weight
          for r in importance_weights(corpus, target, ngram_max=2).collect()}
    assert uni[2] == uni[3]          # unigrams cannot distinguish
    assert bi[2] > bi[3]             # bigram 'a b' dominance shows
    # n_tokens accounting includes bigram features
    n = {r.doc_id: r.n_tokens
         for r in importance_weights(corpus, target, ngram_max=2).collect()}
    assert n[1] == 4 + 3


def test_segment_dedup_keep_first_keeps_one_occurrence(spark):
    from aws_datalake_spark.operators.segment_dedup import (
        dedup_segments_keep_first,
    )

    docs = spark.createDataFrame(
        [
            (1, "shared seg here tail one text"),
            (2, "shared seg here tail two words"),
            (3, "fresh stuff only in doc three"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup_segments_keep_first(docs, k=3).collect()}
    # doc 1 is the first occurrence of 'shared seg here' -> keeps both
    assert out[1].clean_text == "shared seg here tail one text"
    # doc 2 loses the duplicate but keeps its unique tail
    assert out[2].clean_text == "tail two words"
    assert out[2].n_seg == 2 and out[2].n_kept == 1
    assert out[3].n_kept == 2


def test_lm_doc_scores_known_values_and_oov(spark):
    from aws_datalake_spark.operators.text import lm_doc_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    # min_count=1: LM has p(a b)=3/3=1.0, p(b a)=1/3, p(b c)=1/3
    got = {r.doc_id: r for r in lm_doc_scores(docs, min_count=1).collect()}
    assert got[1].n_bigrams == 3 and got[1].n_oov == 0
    assert abs(got[1].mean_p - 0.777778) < 1e-6
    assert got[2].n_bigrams == 2 and got[2].n_oov == 0
    assert abs(got[2].mean_p - 0.666667) < 2e-6
    # min_count=2 drops the singleton bigrams -> they count as OOV
    got2 = {r.doc_id: r for r in lm_doc_scores(docs, min_count=2).collect()}
    assert got2[1].n_oov == 1 and got2[2].n_oov == 1
    assert abs(got2[1].mean_p - 2.0 / 3.0) < 1e-6
    assert abs(got2[2].mean_p - 0.5) < 1e-6
    # a one-token doc has no bigram evidence and is excluded
    one = spark.createDataFrame([(9, "hello")], "doc_id long, text string")
    assert lm_doc_scores(docs.unionByName(one), min_count=1).filter(
        "doc_id = 9"
    ).count() == 0


def test_bm25_scores_formula_and_ranking(spark):
    from aws_datalake_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),        # tf(cat)=2, dl=3
            (2, "cat bird"),           # tf(cat)=1, dl=2
            (3, "fish fish fish dog"), # no cat, tf(dog)=1, dl=4
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bm25_scores(docs, ["cat", "dog"]).collect()}
    # mirror the operator's arithmetic in plain python
    n, avgdl = 3.0, (3 + 2 + 4) / 3.0
    k1, b = 1.2, 0.75

    def contrib(tf, dl, dfc):
        idf = (n - dfc + 0.5) / (dfc + 0.5)
        sat = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        return round(round(idf * sat, 6) * 1e6)

    s1 = round((contrib(2, 3, 2) + contrib(1, 3, 2)) / 1e6, 6)
    assert got[1].n_hit_terms == 2 and abs(got[1].score - s1) < 1e-9
    s2 = round(contrib(1, 2, 2) / 1e6, 6)
    assert got[2].n_hit_terms == 1 and abs(got[2].score - s2) < 1e-9
    s3 = round(contrib(1, 4, 2) / 1e6, 6)
    assert got[3].n_hit_terms == 1 and abs(got[3].score - s3) < 1e-9
    # doc 1 hits both terms with higher tf: must rank first
    assert got[1].score > got[2].score and got[1].score > got[3].score


def test_rrf_fuse_agreement_dominates(spark):
    from aws_datalake_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (9, 3)], "doc_id long, rank int"
    )
    got = {r.doc_id: r for r in rrf_fuse([a, b]).collect()}
    # docs in both lists beat any single-list doc
    both = {1, 3}
    single = {2, 9}
    assert all(got[d].n_lists == 2 for d in both)
    assert all(got[d].n_lists == 1 for d in single)
    assert min(got[d].rrf for d in both) > max(got[d].rrf for d in single)
    # exact fixed-point: 1/(60+1) + 1/(60+2) to 6 places
    expect_1 = round((round(1e6 / 61) + round(1e6 / 62)) / 1e6, 6)
    assert abs(got[1].rrf - expect_1) < 1e-9


def test_cross_rerank_overlap_dominates_and_is_deterministic(spark):
    from aws_datalake_spark.operators.similarity import cross_rerank

    cands = spark.createDataFrame(
        [
            (1, "vector merge window all three"),
            (2, "vector only here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.rerank_score for r in cross_rerank(
        cands, ["vector", "merge", "window"]
    ).collect()}
    # full overlap (0.7 weight) beats any hash tiebreak (0.3 range);
    # partial-vs-zero overlap may be reordered by the hash, by design
    assert got[1] > max(got[2], got[3])
    assert got[1] >= 0.7 and got[3] < 0.3
    # deterministic across runs
    again = {r.doc_id: r.rerank_score for r in cross_rerank(
        cands, ["vector", "merge", "window"]
    ).collect()}
    assert got == again
