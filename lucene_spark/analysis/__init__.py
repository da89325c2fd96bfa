from lucene_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    analyze_series,
    java_lower,
    tokenize,
)
from lucene_spark.analysis import smallfloat

__all__ = [
    "ENGLISH_STOP_WORDS",
    "StandardAnalyzer",
    "analyze_series",
    "java_lower",
    "tokenize",
    "smallfloat",
]
