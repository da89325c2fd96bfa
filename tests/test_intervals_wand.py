"""Block-max WAND for interval queries: kernel ≡ flat (CheckHits pattern),
count-bound soundness fuzz, and the conjunctive-envelope gate."""

import numpy as np
import pytest

from lucene_spark.index.builder import build_index
from lucene_spark.search.intervals import (
    IContainedBy,
    IMaxGaps,
    IMaxWidth,
    INotContaining,
    IOr,
    IOrdered,
    ITerm,
    IUnordered,
    eval_intervals,
    freq_count_bound,
    interval_topk,
    interval_topk_wand,
    leaf_terms,
)

VOCAB = ["scan", "sort", "merge", "filter", "group", "table", "value", "pad"]


@pytest.fixture(scope="module")
def idx(spark):
    rng = np.random.default_rng(17)
    rows = []
    for i in range(400):
        words = rng.choice(VOCAB, size=rng.integers(4, 30)).tolist()
        rows.append((f"c{i}", 0, " ".join(words)))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    return build_index(df, with_positions=True, build_blocks=True, num_segments=4)


SHAPES = [
    IMaxWidth(12, IOrdered((ITerm("scan"), ITerm("sort"), ITerm("merge")))),
    IMaxWidth(10, IUnordered((ITerm("filter"), ITerm("group"), ITerm("sort")))),
    IContainedBy(
        ITerm("value"), IMaxWidth(10, IOrdered((ITerm("table"), ITerm("scan"))))
    ),
    IMaxGaps(2, IOrdered((ITerm("scan"), ITerm("merge")))),
    IOrdered((ITerm("group"), ITerm("table"))),
    IUnordered((ITerm("scan"), ITerm("value"))),
]


@pytest.mark.parametrize("shape_i", range(len(SHAPES)))
def test_kernel_matches_flat(idx, shape_i):
    node = SHAPES[shape_i]
    for k in (3, 10):  # k=3 forces θ pruning to engage on 400 docs
        flat = [tuple(r) for r in interval_topk(idx, node, k=k).collect()]
        wand = [tuple(r) for r in interval_topk_wand(idx, node, k=k).collect()]
        assert flat == wand  # bit-exact: same doc ids, same f32 scores, same ranks


def test_kernel_envelope(idx):
    # notContaining's subtrahend and or-of-disjoint-branches are not
    # conjunctive — the kernel refuses, the flat path answers
    for node in (
        INotContaining(IOrdered((ITerm("scan"), ITerm("merge"))), ITerm("table")),
        IOr((ITerm("scan"), ITerm("merge"))),
    ):
        with pytest.raises(ValueError):
            interval_topk_wand(idx, node)


def test_freq_count_bound_sound():
    """Fuzz: the counting bound dominates the emitted-interval count for
    every combinator over random position sets."""
    rng = np.random.default_rng(5)
    nodes = SHAPES + [
        INotContaining(IOrdered((ITerm("scan"), ITerm("merge"))), ITerm("table")),
        IOr((IOrdered((ITerm("scan"), ITerm("sort"))), ITerm("merge"))),
    ]
    for _ in range(200):
        pm = {
            t: np.unique(rng.integers(0, 40, size=rng.integers(0, 8)))
            for t in VOCAB
        }
        for node in nodes:
            tfmap = {
                t: np.array([len(pm[t])], dtype=np.int64)
                for t in leaf_terms(node)
            }
            s, _e, _g = eval_intervals(node, pm)
            assert len(s) <= int(freq_count_bound(node, tfmap)[0])
