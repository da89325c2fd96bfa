"""lucene_spark — a PySpark-native full-text indexing + BM25 search engine.

A from-scratch rebuild of the capabilities of Apache Lucene's core
indexing/search path (reference: /root/reference) expressed in idiomatic
Spark: DataFrame/SQL plans, vectorized Arrow UDFs for analysis and
block codecs, document-partitioned (segment) index layout, and a
per-segment block-max-WAND top-k kernel with a driver-side TopDocs merge.

Layout:
    analysis/   tokenizer + lowercase + stop filter (StandardAnalyzer parity),
                SmallFloat norm quantization
    index/      docID assignment, posting-list construction, block codec
                (delta + FOR bit-pack + VByte tail), stats tables, merge,
                checkpointed segment builds, CheckIndex invariants
    search/     BM25 float32 math, query tree + classic-syntax parser,
                brute-force oracle scorer, WAND top-k executor
    sources/    deterministic synthetic transcripts generator
    extras/     training-data-pipeline ops: dedup (exact/minhash/simhash/
                ngram-jaccard), ANN similarity, text quality/langid/tokens,
                multimodal column plumbing
"""

__version__ = "0.1.0"
