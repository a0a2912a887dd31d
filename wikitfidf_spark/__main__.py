"""``python -m wikitfidf_spark`` — the reference CLI re-expressed.

Mirrors ``cmd/dothething/dothething.go:13-50`` flag-for-flag where the
flag's concept survives the engine change (language, result dir, date
range, special page list, revert limit, the three top-N limits, test
mode), replacing the reference's dump-channel source with a Spark
table/path source:

    # plainly, or under spark-submit with the package shipped:
    #   spark-submit --py-files wtf.zip wikitfidf_spark/__main__.py <flags>
    python -m wikitfidf_spark \\
        --lang en -d /tmp/out --input /data/revisions.parquet \\
        --revisions -s 2020-01-01 -e 2021-01-01 \\
        --special-list 12-99-105 --rev 10 \\
        --top-pages 50 --top-words 100 --top-topic 100

Pipeline (each stage is the repo's named operator; the reference's
9-stage disk-materialized chain collapses into one Spark lineage):

1. source scan            (sources.read_source — parquet/iceberg/...)
2. S2 page semi-filter    (--special-list, filter.go:15-30)
3. S3 revision range      (-s/-e, filter.go:32-49, strict bounds)
4. S4 top-N-recent        (--rev, dumpreducer.go:44-60 intended
   semantics) + ordered concat of the kept revisions per page
   (dumpreducer's page text), only in ``--revisions`` mode — a
   pre-reduced documents table skips 3/4
5. export_artifacts / write_compat_artifacts (--compat) with the
   language's FULL normalization profile (stopwords, min length,
   letter class, stemmer — textnormalizer.pyx parity; --no-profile
   keeps the raw identifier grammar) and the language's shipped
   badwords list (badwords.go gate)
6. existence check        (Exporter.from_dir — wikitfidf.From parity)

Exit code 0 + one JSON line of totals on success, like a well-behaved
batch job.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_args(argv):
    p = argparse.ArgumentParser(
        prog="python -m wikitfidf_spark",
        description="Build the wikitfidf artifacts from a Spark-readable table.",
    )
    p.add_argument("--lang", required=True, help="corpus language (dothething -lang)")
    p.add_argument("-d", "--dir", required=True, help="result dir (dothething -d)")
    p.add_argument("--input", required=True,
                   help="source: path (parquet/json/...) or table identifier")
    p.add_argument("--format", default=None,
                   help="source format (default: parquet, or $SPARK_GRAFT_SOURCE_FORMAT)")
    p.add_argument("--page-col", default="doc_id", help="page/document id column")
    p.add_argument("--topic-col", default="lang", help="topic column")
    p.add_argument("--text-col", default="text", help="text column")
    p.add_argument("--ts-col", default="ts", help="revision timestamp column (--revisions)")
    p.add_argument("--revisions", action="store_true",
                   help="input is one row per REVISION: apply -s/-e/--rev and "
                        "concatenate the kept revisions per page in time order")
    p.add_argument("-s", "--start", default=None, help="revision starting date (strict >)")
    p.add_argument("-e", "--end", default=None, help="revision ending date (strict <)")
    p.add_argument("--special-list", default=None,
                   help="page ids like id1-id2-...; pages not listed are ignored")
    p.add_argument("--rev", type=int, default=0, help="number of reverts kept per page")
    p.add_argument("--top-pages", type=int, default=0, help="top words per page")
    p.add_argument("--top-words", type=int, default=0, help="top global words")
    p.add_argument("--top-topic", type=int, default=0, help="top words per topic")
    p.add_argument("--compat", action="store_true",
                   help="write the reference's single-gzip artifact shapes "
                        "instead of partitioned JSONL")
    p.add_argument("--no-profile", action="store_true",
                   help="skip per-language normalization (raw identifier grammar)")
    p.add_argument("--test", action="store_true",
                   help="cap the source at 1000 rows and log stage row counts "
                        "to stderr (dothething -test)")
    return p.parse_args(argv)


def _limits(args):
    from wikitfidf_spark.exporter import Limits

    # dothething:36-39: the zero-value Limits struct means
    # ReasonableLimits; any explicitly set flag keeps the struct
    # verbatim — and newBuilder (wikitfidf.go:66-69) then REJECTS any
    # non-positive member, so partially-set flags are an error exactly
    # like the reference
    if not (args.top_pages or args.top_words or args.top_topic or args.rev):
        return Limits()
    lim = Limits(
        words_pages=args.top_pages, global_words=args.top_words,
        topic_words=args.top_topic, reverts=args.rev,
    )
    if min(lim.words_pages, lim.global_words, lim.topic_words, lim.reverts) <= 0:
        raise ValueError(
            "invalid limits: set ALL of --top-pages/--top-words/--top-topic/--rev "
            "or none (wikitfidf.go:66-69 rejects non-positive limits)"
        )
    return lim


def _reduce_revisions(df, args, limits):
    """dumpreducer parity: keep the newest N revisions per page and
    concatenate their texts per page in CHRONOLOGICAL order (the
    reference emits reverts oldest-first into the page text).  The
    text column breaks timestamp ties so selection is a total order
    (two runs over identical input keep identical revisions); the
    page's topic comes from its NEWEST kept revision, not Spark's
    non-deterministic first()."""
    from pyspark.sql import functions as F

    from wikitfidf_spark.operators.topk import top_n_recent_per_group

    kept = top_n_recent_per_group(
        df, args.page_col, args.ts_col, limits.reverts,
        tiebreak_col=args.text_col,
    )
    return kept.groupBy(args.page_col).agg(
        F.max(
            F.struct(F.col(args.ts_col).alias("_ts"),
                     F.col(args.topic_col).alias("_topic"))
        )["_topic"].alias(args.topic_col),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct(args.ts_col, args.text_col))),
                lambda s: s[args.text_col],
            ),
        ).alias(args.text_col),
    )


def main(argv=None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from wikitfidf_spark.exporter import Exporter, export_artifacts, write_compat_artifacts
    from wikitfidf_spark.operators.badwords import flagged_terms_for_lang
    from wikitfidf_spark.operators.filters import semi_filter
    from wikitfidf_spark.sources import read_source

    limits = _limits(args)  # validate-first, like newBuilder

    spark = SparkSession.builder.getOrCreate()
    df = read_source(spark, args.input, args.format)
    if args.test:
        df = df.limit(1000)

    if args.special_list:
        ids = [int(x) for x in args.special_list.split("-") if x]
        df = semi_filter(df, args.page_col, ids)
    if args.start or args.end:
        # the date range applies whether or not the input is
        # revision-shaped — silently ignoring -s/-e off --revisions
        # would ship out-of-range rows with exit code 0
        from wikitfidf_spark.operators.filters import range_filter

        df = range_filter(df, args.ts_col, args.start, args.end)
    if args.revisions:
        df = _reduce_revisions(df, args, limits)
    if args.test:
        print(f"[test] rows entering export: {df.count()}", file=sys.stderr)

    flagged = flagged_terms_for_lang(args.lang)
    if flagged is None:
        # badwords.go:69-72 skips the report for an unlisted language;
        # this exporter always writes all four artifacts (from_dir
        # requires them), so the deviation is an EMPTY report + a loud
        # diagnostic rather than a silent "no bad words found"
        print(
            f"[warn] no badwords list for lang={args.lang!r}: "
            "BadWordsReport will be empty (reference skips it)",
            file=sys.stderr,
        )
        flagged = []
    writer = write_compat_artifacts if args.compat else export_artifacts
    totals = writer(
        spark, df, args.dir, flagged, limits,
        doc_id=args.page_col, topic=args.topic_col, text=args.text_col,
        lang=None if args.no_profile else args.lang,
    )
    # wikitfidf.From parity: validate the artifacts exist before exiting.
    # Compat mode writes the reference's single-gzip FILES (exporter.go
    # checks exactly those); scale mode writes partitioned JSONL dirs
    # with _SUCCESS markers, which Exporter.from_dir validates.
    if args.compat:
        import os

        from wikitfidf_spark import exporter as _ex

        missing = [
            a for a in _ex._ARTIFACTS
            if not os.path.exists(os.path.join(args.dir, a))
        ]
        if missing:
            raise FileNotFoundError(f"missing artifacts in {args.dir}: {missing}")
    else:
        Exporter.from_dir(spark, args.dir)
    print(json.dumps(totals))
    return 0


if __name__ == "__main__":
    sys.exit(main())
