"""Fuzz the repeated-term sloppy-phrase SQL oracle against the matcher.

The gate oracle (``oracle_sql.sloppy_phrase_repeats_topk_sql``) simulates
the SloppyPhraseMatcher rptGroups state machine in a recursive CTE; this
test proves that simulation bit-equal to the Python matcher
(:func:`lucene_spark.search.searcher.sloppy_phrase_freq` with
``rpt_groups=((0, 2),)``) on random corpora — the same differential-fuzz
pattern that validated round 2's two-term leader-chain oracle.

No Spark needed: DuckDB vs numpy only.
"""

import random

import duckdb
import numpy as np

from lucene_spark.oracle_sql import sloppy_phrase_repeats_topk_sql
from lucene_spark.search.searcher import sloppy_phrase_freq


def _freq_sql(sql: str) -> str:
    """Truncate the scoring tail: the chain through ``mm(doc_id, freq)``."""
    return (
        sql.split("\nw AS (")[0].rstrip().rstrip(",")
        + "\nSELECT doc_id, freq FROM mm ORDER BY doc_id"
    )


def test_repeats_oracle_fuzz_vs_matcher():
    rng = random.Random(1234)
    vocab = ["xx", "yy", "zz", "qq"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 18))))
        for i in range(400)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in docs)
        + ") AS t(doc_id, text)"
    )
    for slop in (0, 1, 2, 4, 7):
        sql = sloppy_phrase_repeats_topk_sql("xx", "yy", slop, 10)
        got = {
            int(r[0]): np.float32(r[1])
            for r in con.execute(_freq_sql(sql)).fetchall()
        }
        want = {}
        for i, t in docs:
            toks = t.split()
            px = np.array(
                [j for j, w in enumerate(toks) if w == "xx"], dtype=np.int64
            )
            py = np.array(
                [j for j, w in enumerate(toks) if w == "yy"], dtype=np.int64
            )
            if len(px) < 2 or len(py) < 1:
                continue
            f = sloppy_phrase_freq([px, py - 1, px - 2], slop, ((0, 2),))
            if f > 0:
                want[i] = f
        assert set(got) == set(want)
        assert all(got[d] == want[d] for d in want)  # bit-equal float32


def test_repeats_matcher_edge_cases():
    # single occurrence of the repeated term: group init exhausts, no match
    assert sloppy_phrase_freq(
        [np.array([3]), np.array([2]), np.array([1])], 5, ((0, 2),)
    ) == np.float32(0.0)
    # empty stream
    assert sloppy_phrase_freq(
        [np.array([0, 2]), np.array([], dtype=np.int64), np.array([-2, 0])],
        2,
        ((0, 2),),
    ) == np.float32(0.0)
