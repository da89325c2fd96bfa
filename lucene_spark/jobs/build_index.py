"""spark-submit entrypoint: checkpointed segmented index build.

Deployment shape pinned by the north rule ("runs via spark-submit
--py-files at N and 4N executors"):

    cd /root/repo && python -c "from lucene_spark.session import ship_package"  # or:
    zip -r /tmp/lucene_spark.zip lucene_spark
    spark-submit --master <cluster> --py-files /tmp/lucene_spark.zip \
        lucene_spark/jobs/build_index.py \
        --source /data/transcripts_parquet --index-dir /data/idx \
        --num-segments 512 --batch-size 32

The job is idempotent/resumable: re-submitting after an executor or driver
loss skips completed segment batches (manifest checkpoints,
``index/segments.py``).  With ``--synth-convs N`` it generates the
deterministic synthetic transcripts table instead of reading parquet (for
the sandbox two-cluster-size scaling runs).

Prints one JSON line of build metrics (rows, wall seconds, turns/sec).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> dict:
    from pyspark.sql import SparkSession

    p = argparse.ArgumentParser()
    p.add_argument("--source", help="parquet path of the transcripts table")
    p.add_argument("--synth-convs", type=int, help="generate N synthetic conversations")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--num-segments", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument(
        "--with-positions",
        action="store_true",
        help="persist the positional table (positions + offsets, "
        "(segment, tbucket)-partitioned) so the disk index answers "
        "phrase/interval/span/highlight queries",
    )
    p.add_argument(
        "--no-offsets",
        action="store_true",
        help="with --with-positions: skip character-offset arrays "
        "(phrase-only deployments halve the positional payload)",
    )
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("lucene_spark_build").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from lucene_spark.index.segments import build_segments
    from lucene_spark.session import ship_package
    from lucene_spark.sources.transcripts import synth_transcripts

    ship_package(spark)
    if args.synth_convs:
        source = synth_transcripts(spark, n_convs=args.synth_convs, seed=args.seed)
    elif args.source:
        source = spark.read.parquet(args.source)
    else:
        raise SystemExit("one of --source / --synth-convs is required")

    t0 = time.perf_counter()
    plan = build_segments(
        source,
        args.index_dir,
        num_segments=args.num_segments,
        batch_size=args.batch_size,
        with_positions=args.with_positions,
        with_offsets=not args.no_offsets,
    )
    wall = time.perf_counter() - t0
    out = {
        "rows": plan["total_rows"],
        "num_segments": plan["num_segments"],
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(plan["total_rows"] / wall, 1),
        "parallelism": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
