"""CLI entry point mirroring the reference binaries' interface:

    python -m wordcount_spark file1.txt [file2.txt ...]
    python -m wordcount_spark --mode stale --out out.txt raw_text_input/*

Same surface as ``./omp <files...>`` (reference ``omp.cpp:152``): all input
files aggregate into one global count; stdout gets the ``Filename:``
header (argv[1], misleading-by-design parity — ``omp.cpp:220``) and sorted
``[i] word: count`` lines; stage timings go to stderr (``omp.cpp:227-230``).
``--out`` switches to the hybrid-style file sink, which adds the
``Unique words found: N`` line (``hybrid.cpp:445-454``). ``--per-file``
gives the stale sequential binary's per-file grouping (SURVEY.md §0.3),
one block per source file.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(prog="wordcount_spark")
    ap.add_argument("files", nargs="+", help="input text files (UNION ALL)")
    ap.add_argument(
        "--mode",
        choices=["head", "stale"],
        default="head",
        help="normalizer semantics: HEAD sources vs committed stale binaries "
        "(SURVEY.md §0.6)",
    )
    ap.add_argument("--out", default=None, help="write hybrid-style file instead of stdout")
    ap.add_argument(
        "--per-file", action="store_true", help="group counts per source file"
    )
    ap.add_argument(
        "--preserve-bom",
        action="store_true",
        help="count a UTF-8 BOM as word bytes (golden-fidelity path)",
    )
    args = ap.parse_args(argv)

    t0 = time.monotonic()
    own_session = spark is None
    if own_session:
        from wordcount_spark.session import get_spark

        spark = get_spark("wordcount_spark_cli")

    from pyspark.sql import functions as F

    from wordcount_spark.operators.wordcount import count_words
    from wordcount_spark.sources.readers import load_text_corpus
    from wordcount_spark.sources.sinks import write_reference_output

    corpus = load_text_corpus(spark, args.files, preserve_bom=args.preserve_bom)
    group = ["source"] if args.per_file else None
    counts = count_words(corpus, mode=args.mode, group_cols=group).orderBy(
        *(group or []), "word"
    )
    indexed = counts.rdd.zipWithIndex().map(
        lambda p: (int(p[1]), p[0]["word"], int(p[0]["cnt"]))
        if not group
        else (int(p[1]), p[0]["source"], p[0]["word"], int(p[0]["cnt"]))
    )
    t_count = time.monotonic()

    total_words = counts.agg(F.sum("cnt").alias("t")).collect()[0].t or 0
    header_file = args.files[0]
    if args.out:
        ranked = indexed.toDF(
            ["rank_idx", "word", "cnt"]
            if not group
            else ["rank_idx", "source", "word", "cnt"]
        )
        if group:
            ranked = ranked.select(
                "rank_idx",
                F.concat_ws("/", "source", "word").alias("word"),
                "cnt",
            )
        write_reference_output(ranked, args.out, header_file, unique_line=True)
    else:
        # header format = reference's stdout sink: argv[1] even though the
        # counts cover every file (omp.cpp:220 — misleading-by-design parity)
        print(f"Filename: {header_file}, total words: {total_words}")
        for row in indexed.toLocalIterator():
            if group:
                i, src, word, cnt = row
                print(f"[{i}] {src}/{word}: {cnt}")
            else:
                i, word, cnt = row
                print(f"[{i}] {word}: {cnt}")
    t_done = time.monotonic()
    print(
        f"Count stage: {(t_count - t0) * 1000:.1f} ms\n"
        f"Sort & output stage: {(t_done - t_count) * 1000:.1f} ms",
        file=sys.stderr,
    )
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
