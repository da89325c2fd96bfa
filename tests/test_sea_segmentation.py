"""SOUTHEAST_ASIAN tokenizer class + dictionary word-break.

Thai fixtures use real words: สวัสดี (hello), ครับ (polite particle),
แมว (cat), กิน (eat), ปลา (fish).
"""

from lucene_spark.analysis.analyzer import (
    StandardAnalyzer,
    make_dictionary_segmenter,
    tokenize,
)

THAI_DICT = ["สวัสดี", "ครับ", "แมว", "กิน", "ปลา"]


def test_sea_run_is_one_token_without_dictionary():
    # StandardTokenizer behavior: the whole no-space run is ONE token,
    # and it does NOT glue to adjacent latin/digits (separate classes)
    assert tokenize("สวัสดีครับ") == ["สวัสดีครับ"]
    assert tokenize("hello สวัสดีครับ 42") == ["hello", "สวัสดีครับ", "42"]
    assert tokenize("abcสวัสดี") == ["abc", "สวัสดี"]
    # combining vowel marks stay inside the run (plain \w would split them)
    assert tokenize("กินปลา") == ["กินปลา"]


def test_dictionary_segmenter_longest_match():
    seg = make_dictionary_segmenter(THAI_DICT + ["กินปลา"])
    assert seg("สวัสดีครับ") == ["สวัสดี", "ครับ"]
    assert seg("กินปลา") == ["กินปลา"]  # longest match wins over กิน+ปลา
    # unknown characters fall back to single-char tokens
    assert seg("สวัสดีๆครับ") == ["สวัสดี", "ๆ", "ครับ"]


def test_analyzer_with_sea_segmenter_positions_and_offsets():
    an = StandardAnalyzer(sea_segmenter=make_dictionary_segmenter(THAI_DICT))
    assert an.analyze("แมวกินปลา") == ["แมว", "กิน", "ปลา"]
    # each segment consumes a position; latin neighbors keep their own
    assert an.analyze_with_positions("cat แมวกินปลา end") == [
        ("cat", 0),
        ("แมว", 1),
        ("กิน", 2),
        ("ปลา", 3),
        ("end", 4),
    ]
    offs = an.analyze_with_offsets("แมวกินปลา ok")
    assert offs == [
        ("แมว", 0, 0, 3),
        ("กิน", 1, 3, 6),
        ("ปลา", 2, 6, 9),
        ("ok", 3, 10, 12),
    ]


def test_segments_flow_through_stops_and_filters():
    # segmented tokens go through the normal chain (lowercase/stops)
    an = StandardAnalyzer(
        stop_words=["ครับ"],
        sea_segmenter=make_dictionary_segmenter(THAI_DICT),
    )
    # the stopped particle leaves a position hole, Lucene semantics
    assert an.analyze_with_positions("สวัสดีครับแมว") == [
        ("สวัสดี", 0),
        ("แมว", 2),
    ]


def test_sea_index_roundtrip(spark):
    from pyspark.sql import functions as F

    from lucene_spark.index.builder import build_index

    an = StandardAnalyzer(sea_segmenter=make_dictionary_segmenter(THAI_DICT))
    rows = [("c0", 0, "แมวกินปลา every day"), ("c0", 1, "no fish here")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    idx = build_index(df, analyzer=an, with_positions=True)
    terms = {
        r.term: r
        for r in idx.positions.filter(F.col("doc_id") == 0).collect()
    }
    assert {"แมว", "กิน", "ปลา", "every", "day"} <= set(terms)
    assert list(terms["ปลา"].positions) == [2]
    assert (terms["ปลา"].start_offsets[0], terms["ปลา"].end_offsets[0]) == (6, 9)
