"""CLI entry point — drop-in for the reference's ``ComputeWordScore`` run.

Reference contract (ComputeWordScore.java:138-163, 221-223):

    hadoop jar word-score.jar ComputeWordScore <input> <output>

Here:

    python -m hadoop_word_score_spark <input.jsonl-or-dir> <output-dir>
        [--fail-fast] [--strict-int] [--partitioned] [-D key=value ...]

``-D key=value`` (alias ``--conf``) is the ToolRunner generic-option
passthrough (CWS:144, 221-223): repeatable, applied to the SparkSession the
way ``hadoop jar ... -D mapreduce.job.reduces=4`` feeds the MapReduce Job.

Reads JSON-lines reviews (``stars``, ``text``), writes ``score \\t word``
descending — one file by default (the reference's single-reducer contract),
``--partitioned`` for the at-scale multi-file form. Exit code 2 on usage
error, matching the reference (CWS:140-142); 1 on job failure (CWS:218).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m hadoop_word_score_spark",
        description="word-score over JSONL reviews: score\\tword, descending",
    )
    p.add_argument("input", help="JSONL file/dir of reviews ({stars, text})")
    p.add_argument("output", help="output directory (overwritten)")
    p.add_argument(
        "--fail-fast",
        action="store_true",
        help="die on malformed JSON like the reference (default: quarantine)",
    )
    p.add_argument(
        "--strict-int",
        action="store_true",
        help="32-bit score accumulator parity (reference IntWritable)",
    )
    p.add_argument(
        "--partitioned",
        action="store_true",
        help="multi-file output (scale mode) instead of the single-file contract",
    )
    p.add_argument(
        "-D",
        "--conf",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        dest="confs",
        help="Spark conf override, repeatable (ToolRunner -D parity)",
    )
    try:
        args = p.parse_args(argv)
    except SystemExit:
        return 2  # usage error, reference parity (CWS:140-142)
    extra_confs: dict[str, str] = {}
    for kv in args.confs:
        key, sep, value = kv.partition("=")
        if not sep or not key:
            print(f"bad -D option (want key=value): {kv!r}", file=sys.stderr)
            return 2
        extra_confs[key] = value

    from pyspark.sql import SparkSession

    from .operators.wordscore import word_score, write_word_scores
    from .session import get_spark
    from .sources.reviews import read_reviews_jsonl

    # getOrCreate returns any live session (e.g. a test harness's) — only
    # stop what we started
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("word-score", extra_confs=extra_confs)
    try:
        reviews = read_reviews_jsonl(spark, args.input, fail_fast=args.fail_fast)
        scores = word_score(reviews, strict_int_parity=args.strict_int)
        write_word_scores(scores, args.output, single_file=not args.partitioned)
    except Exception as e:  # job failure → exit 1 (CWS:218)
        print(f"word-score failed: {e}", file=sys.stderr)
        return 1
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
