"""Property tests for the posting-block codec (RandomPostingsTester pattern,
SURVEY.md §5: round-trip encode/decode of FOR/VByte blocks, sortedness,
impact-frontier invariants)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.index.codec import (
    BLOCK_SIZE,
    decode_block,
    encode_posting_list,
    impact_frontier,
    pack_bits,
    unpack_bits,
    vbyte_decode,
    vbyte_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40 - 1), min_size=0, max_size=300),
)
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(a), len(a)), a)


@given(
    st.integers(min_value=1, max_value=40),
    st.lists(st.integers(min_value=0), min_size=1, max_size=256),
)
@settings(max_examples=200, deadline=None)
def test_pack_bits_roundtrip(bpv, vals):
    a = np.array([v % (2**bpv) for v in vals], dtype=np.uint64)
    assert np.array_equal(unpack_bits(pack_bits(a, bpv), len(a), bpv), a)


@st.composite
def posting_lists(draw):
    n = draw(st.integers(min_value=1, max_value=4 * BLOCK_SIZE + 17))
    gaps = draw(
        st.lists(st.integers(min_value=1, max_value=10_000), min_size=n, max_size=n)
    )
    docs = np.cumsum(np.array(gaps, dtype=np.int64)) + draw(
        st.integers(min_value=0, max_value=10**9)
    )
    freqs = np.array(
        draw(st.lists(st.integers(min_value=1, max_value=500), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    norms = np.array(
        draw(st.lists(st.integers(min_value=0, max_value=255), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    return docs, freqs, norms


@given(posting_lists())
@settings(max_examples=100, deadline=None)
def test_posting_blocks_roundtrip(pl):
    docs, freqs, norms = pl
    blocks = encode_posting_list(docs, freqs, norms)
    # block shape invariants (FIXTURES.md §5)
    assert sum(b.num_docs for b in blocks) == len(docs)
    for b in blocks[:-1]:
        assert b.num_docs == BLOCK_SIZE
    out_d, out_f = [], []
    prev_last = -1
    for b in blocks:
        d, f = decode_block(b.first_doc, b.num_docs, b.doc_blob, b.freq_blob)
        assert d[0] == b.first_doc and d[-1] == b.last_doc
        assert b.first_doc > prev_last  # strictly increasing across blocks
        prev_last = b.last_doc
        assert np.all(np.diff(d) > 0)  # strictly increasing within block
        out_d.append(d)
        out_f.append(f)
    assert np.array_equal(np.concatenate(out_d), docs)
    assert np.array_equal(np.concatenate(out_f), freqs)


@given(posting_lists())
@settings(max_examples=100, deadline=None)
def test_impact_frontier_dominates_all_pairs(pl):
    docs, freqs, norms = pl
    for b in encode_posting_list(docs, freqs, norms):
        fr = b.impacts
        # frontier sorted by norm asc, freq strictly increasing
        ns = [n for _, n in fr]
        fs = [f for f, _ in fr]
        assert ns == sorted(ns) and len(set(ns)) == len(ns)
        assert fs == sorted(fs) and len(set(fs)) == len(fs)


def test_frontier_dominance_exhaustive():
    rng = np.random.default_rng(7)
    freqs = rng.integers(1, 50, size=400)
    norms = rng.integers(0, 256, size=400)
    fr = impact_frontier(freqs, norms)
    # every observed (freq, norm) pair is dominated by some frontier pair:
    # frontier freq >= freq with frontier norm <= norm (unsigned)
    for f_, n_ in zip(freqs, norms):
        assert any(ff >= f_ and nn <= (int(n_) & 0xFF) for ff, nn in fr)


def test_all_equal_block_is_tiny():
    docs = np.arange(0, BLOCK_SIZE * 2, dtype=np.int64) * 3
    freqs = np.full(BLOCK_SIZE * 2, 7, dtype=np.int64)
    norms = np.full(BLOCK_SIZE * 2, 10, dtype=np.int64)
    blocks = encode_posting_list(docs, freqs, norms)
    # constant gap + constant freq ⇒ all-equal encoding: a couple of bytes
    assert len(blocks[0].doc_blob) <= 3
    assert len(blocks[0].freq_blob) <= 3
    d, f = decode_block(blocks[0].first_doc, blocks[0].num_docs, blocks[0].doc_blob, blocks[0].freq_blob)
    assert np.array_equal(d, docs[:BLOCK_SIZE])
    assert np.array_equal(f, freqs[:BLOCK_SIZE])


def test_plain_vbyte_codec_roundtrip_and_query_parity(spark):
    """The PostingsFormat SPI: 'plain_vbyte' blocks round-trip identically
    and an index built with it answers queries bit-equal to 'lucene_for'
    (the self-describing blob tags keep the decoder format-agnostic)."""
    import numpy as np

    from lucene_spark.index.codec import decode_block, encode_posting_list

    rng = np.random.default_rng(5)
    docs = np.sort(rng.choice(10_000, size=500, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 30, size=500).astype(np.int64)
    norms = rng.integers(1, 200, size=500).astype(np.int64)
    for codec in ("lucene_for", "plain_vbyte"):
        out_d, out_f = [], []
        for b in encode_posting_list(docs, freqs, norms, codec=codec):
            d, f = decode_block(b.first_doc, b.num_docs, b.doc_blob, b.freq_blob)
            out_d.extend(d.tolist())
            out_f.extend(f.tolist())
        assert out_d == docs.tolist() and out_f == freqs.tolist(), codec

    from lucene_spark.index.blocks import build_block_postings
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.searcher import IndexSearcher
    from lucene_spark.session import ship_package
    from lucene_spark.sources.transcripts import synth_transcripts
    from dataclasses import replace

    ship_package(spark)
    turns = synth_transcripts(spark, n_convs=80, seed=13, num_partitions=2)
    idx = build_index(turns, num_segments=2, build_blocks=True).persist()
    plain_blocks = build_block_postings(idx.postings, idx.doclens, codec="plain_vbyte")
    idx_plain = replace(idx, blocks=plain_blocks)
    a = IndexSearcher(idx).search("index OR query", k=15).collect()
    b = IndexSearcher(idx_plain).search("index OR query", k=15, strategy="wand").collect()
    assert [(r.doc_id, r.score, r.rank) for r in a] == [
        (r.doc_id, r.score, r.rank) for r in b
    ]
    idx.unpersist()
