"""Across-docs vectorized 2-term sloppy-phrase kernel (round 5):
``batch_sloppy_pair_freqs`` must be bit-identical to the per-doc
``sloppy_phrase_freq`` pq-leapfrog on two distinct-term streams, for any
positions and slop — the leader-chain equivalence the DuckDB oracle's
recursive CTE also rests on.
"""

import numpy as np

from lucene_spark.search.searcher import (
    batch_sloppy_pair_freqs,
    sloppy_phrase_freq,
)


def _rand_pair(rng, max_len=9, max_pos=30):
    ka, kb = int(rng.integers(1, max_len)), int(rng.integers(1, max_len))
    pa = np.sort(rng.choice(max_pos, size=ka, replace=False)).astype(np.int64)
    # second stream is offset-shifted (s = pos - 1), so -1 is reachable
    pb = np.sort(rng.choice(max_pos, size=kb, replace=False)).astype(np.int64) - 1
    return pa, pb


def test_fuzz_bit_equal_to_leapfrog():
    rng = np.random.default_rng(99)
    for _trial in range(1500):
        slop = int(rng.integers(0, 7))
        ndocs = int(rng.integers(1, 8))
        acol, bcol, want = [], [], []
        for _ in range(ndocs):
            pa, pb = _rand_pair(rng)
            acol.append(pa)
            bcol.append(pb)
            want.append(sloppy_phrase_freq([pa, pb], slop))
        got = batch_sloppy_pair_freqs(acol, bcol, slop)
        assert np.array_equal(got, np.array(want, dtype=np.float32))


def test_edges():
    e = np.array([], dtype=np.int64)
    p = np.array([1, 4], dtype=np.int64)
    assert batch_sloppy_pair_freqs([e], [p], 3)[0] == np.float32(0.0)
    assert batch_sloppy_pair_freqs([p], [e], 3)[0] == np.float32(0.0)
    assert len(batch_sloppy_pair_freqs([], [], 3)) == 0
    # adjacent exact pair: shifted positions collide -> matchLength 0
    pa = np.array([5], dtype=np.int64)
    pb = np.array([5], dtype=np.int64)
    assert batch_sloppy_pair_freqs([pa], [pb], 0)[0] == np.float32(1.0)
    # out of slop everywhere -> matched stays false -> 0
    far_a = np.array([0], dtype=np.int64)
    far_b = np.array([20], dtype=np.int64)
    assert batch_sloppy_pair_freqs([far_a], [far_b], 3)[0] == np.float32(0.0)
