"""Unit tests for the training-data extras (dedup / similarity / textstats /
multimodal) on crafted fixtures — the oracle gate covers sf0.01 parity; these
cover semantics and the approximate paths' recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.extras import multimodal as mm
from lucene_spark.extras.dedup import (
    embedding_near_dup_pairs,
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from lucene_spark.extras.similarity import knn_brute, knn_lsh
from lucene_spark.extras.textstats import (
    fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " today"),  # near dup of 0
        (3, "completely different text about spark inverted index construction"),
        (4, "the quick brown fox jumps over the lazy cat near the river bank"),
        (5, ""),
        (6, "der hund und die katze sind nicht mit der maus auf dem tisch"),
        (7, "le chat est dans la maison et il ne veut pas sortir pour jouer"),
        (8, "el perro y el gato no son una buena pareja para la casa"),
        (9, "numbers 123 456 and symbols !!! ??? ..."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(docs):
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2 and groups[0].min_doc_id == 0


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs and 0.8 <= pairs[(0, 2)] < 1.0  # one word appended
    assert (0, 4) in pairs  # one word substituted
    assert (0, 3) not in pairs


def test_minhash_finds_near_dups_subset_of_exact(docs):
    exact = {
        (r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    mh = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert mh <= exact
    assert (0, 1) in mh  # identical docs always collide
    assert len(mh) >= len(exact) - 1  # high recall on this fixture


def test_minhash_incremental_matches_batch(docs, spark):
    """Incremental dedup (increment bands vs stored corpus bands) returns
    exactly the batch pairs that touch a new doc; the precomputed band-table
    path is identical."""
    from lucene_spark.extras.dedup import (
        minhash_band_table,
        minhash_lsh_pairs_incremental,
    )

    new = docs.filter(F.col("doc_id").isin(0, 2, 4)).withColumn(
        "doc_id", F.col("doc_id") + 1000
    )
    both = docs.select("doc_id", "text").unionByName(new.select("doc_id", "text"))
    batch = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(both, threshold=0.5).collect()
        if r.doc_a >= 1000 or r.doc_b >= 1000
    }
    incr = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs_incremental(new, docs, threshold=0.5).collect()
    }
    assert incr == batch and len(incr) >= 3  # each copy pairs with its source
    stored = minhash_band_table(docs).persist()
    incr2 = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs_incremental(
            new, docs, corpus_bands=stored, threshold=0.5
        ).collect()
    }
    stored.unpersist()
    assert incr2 == batch


def test_simhash_pairs(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(docs, max_distance=6).collect()
    }
    assert pairs[(0, 1)] == 0  # identical text, distance 0
    assert (0, 2) in pairs  # near dup, small distance
    assert (0, 3) not in pairs


def test_embedding_near_dups(spark):
    v = np.eye(4).tolist()
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),  # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_dup_pairs(emb, threshold=0.95).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]


def test_knn_brute_on_testdata(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    exact = knn_brute(emb, qv, k=10).collect()
    assert exact[0].vec_id == 7  # the query vector itself is its own nearest
    assert [r.rank for r in exact] == list(range(10))
    scores = [r.cos for r in exact]
    assert scores == sorted(scores, reverse=True)
    # full probe ⇒ identical to brute force
    full = [r.vec_id for r in knn_lsh(emb, qv, k=10, nbits=6, nprobe=64).collect()]
    assert full == [r.vec_id for r in exact]


def test_knn_lsh_recall_on_planted_neighbors(spark):
    """LSH probing must recover planted near-duplicates of the query —
    the actual ANN workload (random noise vectors have no true neighbors)."""
    rng = np.random.default_rng(0)
    dim = 32
    base = rng.standard_normal((500, dim))
    q = rng.standard_normal(dim)
    planted = q[None, :] + 0.15 * rng.standard_normal((10, dim))
    vecs = np.vstack([base, planted])
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = [r.vec_id for r in knn_brute(emb, q.tolist(), k=10).collect()]
    assert set(exact) == set(range(500, 510))  # brute force finds all planted
    approx = [
        r.vec_id
        for r in knn_lsh(emb, q.tolist(), k=10, nbits=12, nprobe=64).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9


def test_knn_ivfpq_recall_and_refine(spark):
    """IVF-PQ: planted near-duplicates of the query are recovered through
    the code-only ADC scan + exact refine; with full probing and a large
    refine window the result is exactly brute force."""
    from lucene_spark.extras.similarity import knn_brute, knn_ivfpq

    rng = np.random.default_rng(11)
    dim = 32
    base = rng.standard_normal((600, dim))
    q = rng.standard_normal(dim)
    planted = q[None, :] + 0.15 * rng.standard_normal((10, dim))
    vecs = np.vstack([base, planted])
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    exact = [r.vec_id for r in knn_brute(emb, q.tolist(), k=10).collect()]
    assert set(exact) == set(range(600, 610))
    approx = [
        r.vec_id
        for r in knn_ivfpq(
            emb, q.tolist(), k=10, n_centroids=8, nprobe=4, m=8, refine=4
        ).collect()
    ]
    assert len(set(exact) & set(approx)) / 10 >= 0.9
    # full probe + wide refine degenerates to exact brute force
    full = knn_ivfpq(
        emb, q.tolist(), k=10, n_centroids=8, nprobe=8, m=8, refine=61
    ).collect()
    brute = knn_brute(emb, q.tolist(), k=10).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in brute]
    # refine=0 returns PQ distances ascending
    raw = knn_ivfpq(
        emb, q.tolist(), k=5, n_centroids=8, nprobe=8, m=8, refine=0
    ).collect()
    assert [r.rank for r in raw] == list(range(5))
    dists = [r.adist for r in raw]
    assert dists == sorted(dists)


def test_pq_encode_deterministic(spark):
    from lucene_spark.extras.similarity import pq_encode, pq_train

    rng = np.random.default_rng(2)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(rng.standard_normal((100, 16)))],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(emb, m=4, sample=100)
    assert books.shape == (4, 256, 4)
    c1 = {r.vec_id: list(r.codes) for r in pq_encode(emb, books).collect()}
    c2 = {r.vec_id: list(r.codes) for r in pq_encode(emb, books).collect()}
    assert c1 == c2 and all(len(v) == 4 for v in c1.values())


def test_lsh_near_dup_pairs_recall_and_precision(spark):
    from lucene_spark.extras.dedup import embedding_near_dup_pairs
    from lucene_spark.extras.similarity import lsh_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((300, 16))
    # plant 15 near-dup pairs
    planted = base[:15] + 0.05 * rng.standard_normal((15, 16))
    vecs = np.vstack([base, planted])
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    exact = {
        (r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, threshold=0.9).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in lsh_near_dup_pairs(emb, threshold=0.9, nbits=8, bands=4).collect()
    }
    assert approx <= exact  # precision 1 (verified)
    assert len(approx) / max(1, len(exact)) >= 0.8  # banding recall


def test_token_counts(docs):
    rows = {r.doc_id: r for r in token_counts(docs).collect()}
    assert rows[5].n_ws_tokens == 0 and rows[5].n_bpe_tokens == 0
    assert rows[0].n_ws_tokens == 13
    assert rows[9].n_bpe_tokens == 3 + 6 + 9  # 3 alpha runs + 6 digits + 9 symbols


def test_quality_scores(docs):
    rows = {r.doc_id: r for r in quality_scores(docs).collect()}
    assert rows[0].quality > rows[9].quality  # clean prose beats symbol soup
    assert rows[5].n_words == 0
    assert 0.0 <= rows[9].quality <= 1.0


def test_lang_id(docs):
    rows = {r.doc_id: r.lang for r in lang_id(docs).collect()}
    assert rows[0] == "en"
    assert rows[6] == "de"
    assert rows[7] == "fr"
    assert rows[8] == "es"
    assert rows[5] == "und"


def test_fingerprints_normalize(spark):
    rows = [
        (0, "Hello,   World!"),
        (1, "hello world"),
        (2, "different"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: r.fingerprint for r in fingerprints(df).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_multimodal_plumbing(docs):
    media = mm.attach_fake_payload(docs)
    feats = {r.doc_id: r for r in mm.extract_features(media).collect()}
    assert len(feats) == 10
    assert len(feats[0].features) == mm.FEATURE_BINS
    assert feats[0].features == feats[1].features  # deterministic on same bytes
    assert abs(sum(feats[0].features) - 1.0) < 1e-9  # L1-normalized
    assert feats[5].feat_norm == 0.0  # empty payload
    summ = {r.doc_id: r for r in mm.media_summary(media).collect()}
    assert summ[0].n_bytes == len(docs.collect()[0].text.encode())


def _rng_img(h, w, c, seed=7):
    import numpy as np

    return (
        np.random.default_rng(seed).integers(0, 256, (h, w, c)).astype("uint8")
    )


def test_png_codec_roundtrip_and_filters():
    """Built-in PNG codec: encode→decode is identity for gray/RGB/RGBA, and
    the decoder unfilters Sub/Up/Average/Paeth scanlines per spec."""
    import struct
    import zlib

    import numpy as np

    for c in (1, 3, 4):
        arr = _rng_img(5, 4, c)
        assert np.array_equal(mm.decode_image(mm._png_encode(arr)), arr)
    # hand-filter a known image with every filter type, one per row
    arr = _rng_img(5, 6, 3, seed=11).astype(np.int64)
    h, w, ch = arr.shape
    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        row = arr[y].reshape(-1)
        prev = arr[y - 1].reshape(-1) if y else np.zeros(w * ch, dtype=np.int64)
        flt = np.zeros(w * ch, dtype=np.int64)
        for i in range(w * ch):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            cc = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            flt[i] = (row[i] - pred) % 256
        raw.append(f)
        raw.extend(flt.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mm._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_image(png), arr.astype(np.uint8))


def test_decode_ppm_and_unknown():
    import numpy as np

    arr = _rng_img(3, 2, 3)
    ppm = b"P6\n# c\n2 3\n255\n" + arr.tobytes()
    assert np.array_equal(mm.decode_image(ppm), arr)
    pgm = b"P5 2 3 255\n" + arr[:, :, 0].tobytes()
    assert np.array_equal(mm.decode_image(pgm)[:, :, 0], arr[:, :, 0])
    with pytest.raises(ValueError):
        mm.decode_image(b"GIF89a....")


def test_resize_image_nearest():
    import numpy as np

    # 2x2 quadrant image → 4x4 nearest-neighbor keeps exact quadrant colors
    arr = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], dtype="uint8"
    )
    out = mm.decode_image(mm.resize_image(mm._png_encode(arr), 4, 4))
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[0, 0], arr[0, 0]) and np.array_equal(
        out[3, 3], arr[1, 1]
    )
    assert np.array_equal(out[1, 1], arr[0, 0])  # pixel-center mapping


def test_sample_frames_rawv():
    import numpy as np

    frames = _rng_img(10, 4, 3).reshape(10, 1, 4, 3).repeat(2, axis=1)
    payload = mm.pack_rawv(frames)
    got = mm.sample_frames(payload, every_n=3)
    assert len(got) == 4  # frames 0, 3, 6, 9
    for i, f in zip((0, 3, 6, 9), got):
        assert np.array_equal(f, frames[i])
    with pytest.raises(ValueError):
        mm.sample_frames(b"not a video")


def test_decode_summary_mapinpandas(spark):
    """Distributed decode: PNG + PPM + undecodable payloads through ONE
    mapInPandas stage."""
    import numpy as np

    a = _rng_img(3, 5, 3)
    rows = [
        (0, bytearray(mm._png_encode(a))),
        (1, bytearray(b"P6 5 3 255\n" + a.tobytes())),
        (2, bytearray(b"garbage")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mm.decode_summary(media).collect()}
    assert (got[0].width, got[0].height, got[0].channels) == (5, 3, 3)
    assert abs(got[0].mean_px - float(a.mean())) < 1e-9
    assert got[1].width == 5 and abs(got[1].mean_px - got[0].mean_px) < 1e-9
    assert got[2].width == -1


def test_curation_pipeline(spark):
    """Composed keep/drop pass: reason precedence, keep-first near-dup
    policy, and column-rule thresholds."""
    from lucene_spark.extras.curation import curate, curation_report

    rows = [
        (0, "the cat sat on the mat with a hat and a bat for the rat"),
        (1, "the cat sat on the mat with a hat and a bat for the rat"),  # exact dup of 0
        (2, "the cat sat on the mat with a hat and a bat for the cat today"),  # near dup
        (3, "short text"),  # length
        (4, "der und die das ist nicht ein mit von zu auf für wird sind"),  # de
        # English (stopword hits) but digit-heavy → low quality, lang ok
        (5, "the 111 222 333 444 555 666 777 888 999 000 and 123 456"),
        (6, "the quick brown fox jumps over the lazy dog and then it runs away home"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in curate(
        df, near_threshold=0.4, min_words=5, max_words=50,
        allowed_langs=("en",), min_quality=0.5,
    ).collect()}
    assert out[0].reason == "kept" and out[0].keep
    assert out[1].reason == "exact_dup"  # greater id of the md5 group
    assert out[2].reason == "near_dup"  # keep-first: doc 0 survives
    assert out[3].reason == "length"
    assert out[4].reason == "lang"
    assert out[5].reason == "quality"
    assert out[6].reason == "kept"
    rep = {r.reason: r.n_docs for r in curation_report(
        curate(df, near_threshold=0.4, min_words=5, max_words=50,
               allowed_langs=("en",), min_quality=0.5)).collect()}
    assert rep == {"kept": 2, "exact_dup": 1, "near_dup": 1,
                   "length": 1, "lang": 1, "quality": 1}


def test_near_dup_components_label_propagation(spark):
    """Connected components over a pair graph: chain, star, singleton-free
    (docs without pairs never enter), converges to min-id labels."""
    from lucene_spark.extras.curation import near_dup_components

    # components: {1,2,3,9} (chain 1-2, 2-3 + edge 3-9), {5,6}, {7,8}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 6), (8, 7)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component for r in near_dup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5, 7: 7, 8: 7}


def test_curate_components_keeps_one_per_cluster(spark):
    """The star A~C, B~C (A≁B): keep-first keeps BOTH A and B (drops only
    the greater pair member C), components keeps exactly ONE doc — the
    round-4 verdict's cluster-level dedup ask."""
    from lucene_spark.extras.curation import curate
    from lucene_spark.extras.dedup import minhash_lsh_pairs

    shared_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    shared_b = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    rows = [
        (10, shared_a + " left tail"),  # A
        (20, shared_b + " right tail"),  # B
        (30, shared_a + " " + shared_b),  # C: near-dup of both A and B
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(df, threshold=0.3).collect()
    }
    assert (10, 30) in pairs and (20, 30) in pairs and (10, 20) not in pairs
    kw = dict(near_threshold=0.3, min_words=1, allowed_langs=("en", "und"))
    kf = {r.doc_id: r.reason for r in curate(df, **kw).collect()}
    assert kf == {10: "kept", 20: "kept", 30: "near_dup"}
    cc = {r.doc_id: r.reason for r in curate(
        df, near_policy="components", **kw
    ).collect()}
    assert cc == {10: "kept", 20: "near_dup", 30: "near_dup"}


def test_knn_ivf_recall(spark):
    """IVF-flat ANN: ≥0.9 recall@10 vs brute force on the test embeddings;
    nprobe == n_centroids degenerates to exact."""
    from lucene_spark.extras.similarity import (
        ivf_assign,
        ivf_fit_centroids,
        knn_brute,
        knn_ivf,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    cent = ivf_fit_centroids(emb, n_centroids=16)
    asg = ivf_assign(emb, cent).persist()
    want = [r.vec_id for r in knn_brute(emb, qv, k=10).collect()]
    got = [
        r.vec_id
        for r in knn_ivf(emb, qv, k=10, nprobe=8, centroids=cent, assignments=asg).collect()
    ]
    recall = len(set(got) & set(want)) / len(want)
    assert recall >= 0.9, f"recall {recall}"
    exact = [
        r.vec_id
        for r in knn_ivf(emb, qv, k=10, nprobe=16, centroids=cent, assignments=asg).collect()
    ]
    assert exact == want
    asg.unpersist()


def test_duplicated_substring_spans(spark):
    """Substring-level dedup (Lee et al. 2022 style): duplicated fixed-
    window word shingles merged into maximal per-doc spans; the hashed
    scale path is span-identical to the exact string keys."""
    from lucene_spark.extras.dedup import duplicated_substring_spans

    df = spark.createDataFrame(
        [
            (0, "a b c d e f a b c d"),   # window at 0 and 6 (no merge: gap 6 > 4)
            (1, "x a b c d y"),            # the same window mid-doc
            (2, "zz yy xx ww vv uu"),      # unique content: no spans
            (3, "p q"),                    # shorter than the window: no rows
        ],
        "doc_id long, text string",
    )
    want = [(0, 0, 3), (0, 6, 9), (1, 1, 4)]
    for hashed in (False, True):
        got = [
            tuple(r)
            for r in duplicated_substring_spans(
                df, window=4, min_count=2, hashed=hashed
            ).collect()
        ]
        assert got == want, (hashed, got)
    # overlapping duplicated windows merge into ONE maximal span:
    # "a b c d e" shared by two docs -> windows at 0 and 1 merge to [0, 4]
    df2 = spark.createDataFrame(
        [(0, "a b c d e zz"), (1, "yy a b c d e")],
        "doc_id long, text string",
    )
    got2 = [
        tuple(r)
        for r in duplicated_substring_spans(df2, window=4).collect()
    ]
    assert got2 == [(0, 0, 4), (1, 1, 5)]


def test_curate_substring_dup_rule(spark):
    """Opt-in substring_dup rule: a doc mostly covered by corpus-duplicated
    spans drops even when document-level near-dup would keep it."""
    from lucene_spark.extras.curation import curate

    boiler = "this page is licensed under the creative commons share alike"
    rows = [
        (0, boiler + " about cats"),
        (1, boiler + " about dogs"),
        (2, "this is an original essay about the design of the engines and the indexes that they use"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["keep"], r["reason"])
        for r in curate(
            df,
            near_threshold=0.95,
            max_substring_dup_ratio=0.5,
            substring_window=5,
        ).collect()
    }
    # the 10-word boilerplate covers 10/12 words of docs 0 and 1
    assert out[0] == (False, "substring_dup")
    assert out[1] == (False, "substring_dup")
    assert out[2] == (True, "kept")
    # without the opt-in the docs survive (near-dup at 0.95 doesn't fire)
    out2 = {
        r["doc_id"]: r["reason"]
        for r in curate(df, near_threshold=0.95).collect()
    }
    assert out2 == {0: "kept", 1: "kept", 2: "kept"}
