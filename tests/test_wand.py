"""WAND ≡ brute-force rank identity (the CheckHits pattern, SURVEY.md §5).

The block-max WAND path must return *bit-identical* (doc_id, score float32,
rank) to the flat-postings plan for every query shape it accepts, at every k
— pruning may never change results, only skip work.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.index.builder import build_index
from lucene_spark.index.codec import decode_block, decode_norms
from lucene_spark.search import bm25
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.wand import bm25_term_scorer, segment_wand_topk
from lucene_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    turns = synth_transcripts(spark, n_convs=250, seed=11, num_partitions=4)
    idx = build_index(turns, num_segments=4, build_blocks=True).persist()
    yield IndexSearcher(idx)
    idx.unpersist()


QUERIES = [
    "the",          # hottest term
    "index",
    "partition",    # rare
    "nosuchterm",
    "index AND query",
    "the AND of AND to",
    "spark OR vector OR posting",
    "the OR missingterm",
    "missingterm AND index",
]


@pytest.mark.parametrize("qtext", QUERIES)
@pytest.mark.parametrize("k", [1, 10, 100])
def test_wand_equals_flat(searcher, qtext, k):
    wand = searcher.search(qtext, k=k, strategy="auto").collect()
    flat = searcher.search(qtext, k=k, strategy="flat").collect()
    assert [(r.doc_id, r.score, r.rank) for r in wand] == [
        (r.doc_id, r.score, r.rank) for r in flat
    ]


def test_wand_path_is_actually_used(searcher):
    # shape accepted → strategy="wand" must not raise
    searcher.search("index", k=5, strategy="wand").collect()
    searcher.search("index AND query", k=5, strategy="wand").collect()
    searcher.search("index AND NOT query", k=5, strategy="wand").collect()
    with pytest.raises(ValueError):
        # positional queries stay outside the kernel
        searcher.search('"index query"', k=5, strategy="wand")


def test_blocks_roundtrip_to_flat_postings(searcher):
    """Decoding every block reproduces the flat postings exactly."""
    idx = searcher.index
    flat = (
        idx.postings.join(idx.doclens.select("doc_id", "field", "norm_byte"), ["doc_id", "field"])
        .orderBy("term", "doc_id")
        .collect()
    )
    want = {}
    for r in flat:
        want.setdefault(r.term, []).append((r.doc_id, r.freq, r.norm_byte & 0xFF))
    got = {}
    for r in idx.blocks.orderBy("term", "segment", "block_id").collect():
        d, f = decode_block(r.first_doc, r.num_docs, bytes(r.doc_blob), bytes(r.freq_blob))
        n = decode_norms(bytes(r.norm_blob))
        got.setdefault(r.term, []).extend(zip(d.tolist(), f.tolist(), n.tolist()))
    assert set(got) == set(want)
    for t in want:
        assert got[t] == want[t], f"term {t!r} mismatch"


# ---------------------------------------------------------- kernel-level fuzz


def _random_segment(rng, n_docs, n_terms):
    """Random per-term postings over a doc space + the block table pdf."""
    from lucene_spark.index.codec import encode_posting_list

    rows = []
    truth = {}
    for ti in range(n_terms):
        term = f"t{ti}"
        n = int(rng.integers(1, n_docs))
        docs = np.sort(rng.choice(n_docs, size=n, replace=False)).astype(np.int64)
        freqs = rng.integers(1, 20, size=n).astype(np.int64)
        norms = rng.integers(1, 60, size=n).astype(np.int64)
        truth[term] = (docs, freqs, norms)
        for b in encode_posting_list(docs, freqs, norms):
            rows.append(
                {
                    "term": term,
                    "block_id": b.block_id,
                    "first_doc": b.first_doc,
                    "last_doc": b.last_doc,
                    "num_docs": b.num_docs,
                    "doc_blob": b.doc_blob,
                    "freq_blob": b.freq_blob,
                    "norm_blob": b.norm_blob,
                    "impacts": [{"freq": f, "norm": n_} for f, n_ in b.impacts],
                }
            )
    return pd.DataFrame(rows), truth


def _brute(truth, scorers, k, mode):
    per_doc = {}
    counts = {}
    for s in scorers:
        if s.term not in truth:
            if mode == "and":
                return [], []
            continue
        docs, freqs, norms = truth[s.term]
        sc = s.score(freqs.astype(np.float32), norms)
        for d, v in zip(docs.tolist(), sc.astype(np.float64).tolist()):
            per_doc[d] = per_doc.get(d, 0.0) + v
            counts[d] = counts.get(d, 0) + 1
    items = [
        (np.float32(v), d)
        for d, v in per_doc.items()
        if mode == "or" or counts[d] == len(scorers)
    ]
    items.sort(key=lambda x: (-x[0], x[1]))
    items = items[:k]
    return [d for _, d in items], [s for s, _ in items]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("mode", ["or", "and"])
def test_kernel_fuzz_vs_brute(seed, mode):
    rng = np.random.default_rng(seed)
    n_docs, n_terms = 2000, 3
    pdf, truth = _random_segment(rng, n_docs, n_terms)
    doc_count, sttf = n_docs, n_docs * 30
    scorers = []
    for ti in range(n_terms):
        df = len(truth[f"t{ti}"][0])
        sc = bm25.BM25Scorer(df, doc_count, sttf)
        scorers.append(bm25_term_scorer(f"t{ti}", sc.weight, sc.cache))
    for k in (1, 7, 50):
        got_d, got_s = segment_wand_topk(pdf, scorers, k, mode)
        want_d, want_s = _brute(truth, scorers, k, mode)
        assert got_d.tolist() == want_d, f"k={k}"
        assert [np.float32(x) for x in got_s] == want_s, f"k={k}"


def test_wand_equals_flat_with_instance_similarity(searcher):
    """A BM25Similarity *instance* with custom k1/b must flow into the WAND
    scorers too (not just the k1=/b= constructor route) — otherwise
    strategy='auto' silently ranks with defaults while flat uses the
    custom parameters."""
    from lucene_spark.search.similarities import BM25Similarity

    s = IndexSearcher(searcher.index, similarity=BM25Similarity(1.5, 0.6))
    assert (s.k1, s.b) == (1.5, 0.6)
    for qtext in ("the", "index AND query", "spark OR vector OR posting"):
        wand = s.search(qtext, k=10, strategy="wand").collect()
        flat = s.search(qtext, k=10, strategy="flat").collect()
        assert [(r.doc_id, r.score, r.rank) for r in wand] == [
            (r.doc_id, r.score, r.rank) for r in flat
        ]


# ----------------------------------------- mixed-Boolean kernel (WAND ≡ flat)


def _mixed_queries():
    from lucene_spark.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )

    def bq(parts, msm=0):
        return BooleanQuery(
            tuple(BooleanClause(occ, q) for occ, q in parts),
            minimum_should_match=msm,
        )

    t = TermQuery
    sub_or = bq([(Occur.SHOULD, t("query")), (Occur.SHOULD, t("vector"))])
    return {
        "must_not": bq([(Occur.MUST, t("index")), (Occur.MUST_NOT, t("query"))]),
        "reqopt": bq([(Occur.MUST, t("index")), (Occur.SHOULD, t("query"))]),
        "filter": bq([(Occur.MUST, t("index")), (Occur.FILTER, t("the"))]),
        "filter_only": bq([(Occur.FILTER, t("index")), (Occur.FILTER, t("query"))]),
        "msm2_of_3": bq(
            [(Occur.SHOULD, t("index")), (Occur.SHOULD, t("query")), (Occur.SHOULD, t("the"))],
            msm=2,
        ),
        "must_msm": bq(
            [(Occur.MUST, t("index")), (Occur.SHOULD, t("query")), (Occur.SHOULD, t("the"))],
            msm=1,
        ),
        "nested_or_in_must": bq([(Occur.MUST, t("index")), (Occur.MUST, sub_or)]),
        "nested_or_not": bq([(Occur.MUST, t("the")), (Occur.MUST_NOT, sub_or)]),
        "kitchen_sink": bq(
            [
                (Occur.MUST, t("the")),
                (Occur.SHOULD, t("index")),
                (Occur.SHOULD, sub_or),
                (Occur.MUST_NOT, t("partition")),
                (Occur.FILTER, t("of")),
            ],
            msm=1,
        ),
        "absent_must_not": bq(
            [(Occur.MUST, t("index")), (Occur.MUST_NOT, t("nosuchterm"))]
        ),
        "absent_should": bq(
            [(Occur.MUST, t("index")), (Occur.SHOULD, t("nosuchterm"))]
        ),
    }


@pytest.mark.parametrize("name", sorted(_mixed_queries().keys()))
@pytest.mark.parametrize("k", [1, 10, 100])
def test_wand_boolean_equals_flat(searcher, name, k):
    q = _mixed_queries()[name]
    wand = searcher.search(q, k=k, strategy="wand").collect()
    flat = searcher.search(q, k=k, strategy="flat").collect()
    assert [(r.doc_id, r.score, r.rank) for r in wand] == [
        (r.doc_id, r.score, r.rank) for r in flat
    ]


def test_wand_with_deletes_equals_flat_antijoin(searcher):
    """Buffered deletes enter the kernel as an exclusion set; results must
    equal the flat path's anti-join bit-for-bit."""
    from lucene_spark.index.builder import delete_by_ids

    spark = searcher.index.postings.sparkSession
    victims = [r.doc_id for r in searcher.search("the", k=7).collect()]
    dels = spark.createDataFrame([(int(d),) for d in victims], "doc_id long")
    s2 = IndexSearcher(delete_by_ids(searcher.index, dels))
    for qtext in ("the", "the AND of", "index OR query"):
        wand = s2.search(qtext, k=20, strategy="wand").collect()
        flat = s2.search(qtext, k=20, strategy="flat").collect()
        assert [(r.doc_id, r.score, r.rank) for r in wand] == [
            (r.doc_id, r.score, r.rank) for r in flat
        ]
        assert not {r.doc_id for r in wand} & set(victims)


def _brute_boolean(truth, clauses, msm, k, exclude=None):
    """Reference evaluation of the Boolean clause algebra over raw postings
    (mirrors the flat plan's float32/double arithmetic)."""
    def clause_scores(members):
        per = {}
        for s in members:
            if s.term not in truth:
                continue
            docs, freqs, norms = truth[s.term]
            sc = s.score(freqs.astype(np.float32), norms)
            for d, v in zip(docs.tolist(), sc.astype(np.float64).tolist()):
                per[d] = per.get(d, 0.0) + v
        return {d: np.float32(v) for d, v in per.items()}

    req = [clause_scores(m) for occ, m in clauses if occ == "must"]
    opt = [clause_scores(m) for occ, m in clauses if occ == "should"]
    proh = set()
    for occ, members in clauses:
        if occ == "not":
            for t in members:
                if t in truth:
                    proh.update(truth[t][0].tolist())
    need = msm if req else max(1, msm)
    docs = set(req[0]) if req else set().union(*opt) if opt else set()
    for c in req[1:]:
        docs &= set(c)
    out = []
    for d in sorted(docs):
        if d in proh or (exclude is not None and d in exclude):
            continue
        cnt = sum(1 for c in opt if d in c)
        if need > 0 and cnt < need:
            continue
        total = sum(float(c[d]) for c in req) + sum(float(c[d]) for c in opt if d in c)
        out.append((np.float32(total), d))
    out.sort(key=lambda x: (-x[0], x[1]))
    out = out[:k]
    return [d for _, d in out], [s for s, _ in out]


@pytest.mark.parametrize("seed", range(10))
def test_kernel_fuzz_boolean_vs_brute(seed):
    """Boolean kernel fuzz: random MUST/SHOULD/MUST_NOT clause structures
    with multi-member OR-groups (the clause-level float32 casts the bound
    math must over-estimate), random msm, random exclusions."""
    from lucene_spark.search.wand import segment_wand_topk_boolean

    rng = np.random.default_rng(seed + 100)
    n_docs, n_terms = 1500, 6
    pdf, truth = _random_segment(rng, n_docs, n_terms)
    doc_count, sttf = n_docs, n_docs * 30
    scorers = {}
    for ti in range(n_terms):
        df = len(truth[f"t{ti}"][0])
        sc = bm25.BM25Scorer(df, doc_count, sttf)
        scorers[f"t{ti}"] = bm25_term_scorer(f"t{ti}", sc.weight, sc.cache)

    terms = list(scorers)
    rng.shuffle(terms)
    clauses = []
    i = 0
    # 1-2 must clauses (possibly multi-member), 1-2 should, maybe a not
    for occ, maxm in (("must", 2), ("should", 2), ("should", 1)):
        nm = int(rng.integers(1, maxm + 1))
        if i + nm > len(terms) - 1:
            break
        clauses.append((occ, [scorers[t] for t in terms[i : i + nm]]))
        i += nm
    clauses.append(("not", [terms[-1]]))
    msm = int(rng.integers(0, 2))
    exclude = np.sort(rng.choice(n_docs, size=50, replace=False)).astype(np.int64)

    for k in (1, 10, 60):
        got_d, got_s = segment_wand_topk_boolean(pdf, clauses, msm, k, exclude)
        want_d, want_s = _brute_boolean(truth, clauses, msm, k, set(exclude.tolist()))
        assert got_d.tolist() == want_d, f"k={k} clauses={[(o, [s.term for s in m] if o != 'not' else m) for o, m in clauses]}"
        assert [np.float32(x) for x in got_s] == want_s, f"k={k}"
