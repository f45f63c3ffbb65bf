"""``python -m graphdb_wikidata_spark`` — the reference binary's CLI
surface (cli.rs:16-67) on the Spark engine:

    python -m graphdb_wikidata_spark [-d DIR] server [--port 8005]
    python -m graphdb_wikidata_spark [-d DIR] cli
    python -m graphdb_wikidata_spark [-d DIR] create-db --file dump.json
        [--no-qualifiers] [--lang en de ...] [--mmaped]
    python -m graphdb_wikidata_spark [-d DIR] create-index

DATABASE_DIR (default "wikidata", like the reference) holds the
statements Parquet. ``create-db`` parses a Wikidata JSON export into it;
``server``/``cli`` load it and serve queries; ``create-index`` rewrites
it subject-clustered and predicate-sorted — the Spark analogue of the
reference's four sorted index copies (one table + write-time clustering
replaces index selection, SURVEY §1.4). ``--mmaped`` is accepted for
interface parity and ignored: Parquet + Spark's block manager are
always the larger-than-RAM path.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="graphdb_wikidata_spark", description=__doc__)
    ap.add_argument(
        "-d", "--database-dir", default="wikidata",
        help="statements Parquet directory (created by create-db)",
    )
    sub = ap.add_subparsers(dest="mode")

    p_server = sub.add_parser("server", help="start the HTTP query endpoint")
    p_server.add_argument("-p", "--port", type=int, default=8005)
    p_server.add_argument(
        "--federation", nargs="*", metavar="IRI", default=None,
        help="enable live HTTP SERVICE federation: with IRIs = allowlist "
        "of remote endpoints; bare flag = allow any http(s) endpoint "
        "(off by default — remote fetch from query text is SSRF on a "
        "shared server)",
    )

    sub.add_parser("cli", help="interactive SPARQL REPL")

    p_create = sub.add_parser("create-db", help="build the DB from a Wikidata JSON export")
    p_create.add_argument("-f", "--file", default="./tests/data/first_5_lines.txt")
    p_create.add_argument("-n", "--no-qualifiers", action="store_true")
    p_create.add_argument("-l", "--lang", nargs="*", default=None,
                          help="label/description/alias language filter (unset = all)")
    p_create.add_argument("-m", "--mmaped", action="store_true",
                          help="accepted for parity; Parquet is always the out-of-core path")

    p_index = sub.add_parser(
        "create-index", help="rewrite the DB clustered by subject, sorted by predicate"
    )
    p_index.add_argument(
        "--by-predicate", action="store_true",
        help="also partition into pred_kind= directories (bound-predicate "
        "scans prune whole directories; for predicate-heavy workloads)",
    )

    p_pipe = sub.add_parser(
        "pipeline",
        help="run the training-data pipeline (LSH dedup -> quality gate -> "
        "sequence packing) over an sf-dir and write sharded parquet",
    )
    p_pipe.add_argument("--sf-dir", required=True, help="directory with documents.parquet")
    p_pipe.add_argument("-o", "--out", required=True, help="output shard directory")
    p_pipe.add_argument("--max-records", type=int, default=None,
                        help="rows per parquet shard (default sinks.DEFAULT_SHARD_RECORDS)")

    p_an = sub.add_parser(
        "analyze",
        help="write a corpus-health report over an sf-dir: per-source KL "
        "drift, per-doc readability, chi2 keywords per language, and "
        "event heavy hitters, each as a parquet relation",
    )
    p_an.add_argument("--sf-dir", required=True, help="directory with the testdata tables")
    p_an.add_argument("-o", "--out", required=True, help="output report directory")

    args = ap.parse_args(argv)
    if args.mode is None:
        ap.print_help()
        return 2

    from .session import get_spark

    spark = get_spark("graphdb-wikidata-spark-" + args.mode)
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "create-db":
        from .ingest.wikidata import load_dump, write_statements

        stmts = load_dump(
            spark,
            args.file,
            parse_qualifiers=not args.no_qualifiers,
            language_filter=args.lang,
        )
        write_statements(stmts, args.database_dir)
        n = spark.read.parquet(args.database_dir).count()
        print(f"created {args.database_dir}: {n} statements")
        return 0

    if args.mode == "pipeline":
        from . import sinks
        from .operators.corpus import QUERIES as CORPUS_QUERIES

        packed = CORPUS_QUERIES["corpus_dedup_quality_pack"](spark, args.sf_dir)
        kw = {} if args.max_records is None else {"max_records_per_file": args.max_records}
        sinks.write_training_shards(packed, args.out, **kw)
        n = spark.read.parquet(args.out).count()
        print(f"wrote {args.out}: {n} packed documents")
        return 0

    if args.mode == "analyze":
        import json as _json
        import os as _os

        from .operators.corpus import QUERIES as CORPUS_QUERIES
        from .operators.events import QUERIES as EVENT_QUERIES
        from .operators.text import QUERIES as TEXT_QUERIES

        sections = {
            "source_drift": CORPUS_QUERIES["corpus_source_kl_drift"],
            "readability": TEXT_QUERIES["text_readability"],
            "keywords": TEXT_QUERIES["text_chi2_keywords"],
            "heavy_hitters": EVENT_QUERIES["events_count_min_heavy_hitters"],
        }
        summary = {}
        for name, fn in sections.items():
            # localCheckpoint materializes the section ONCE; the write
            # and the row count then both read the checkpointed blocks
            # instead of recomputing or re-reading the parquet just
            # written (ADVICE r06: the write+re-read doubled IO)
            df = fn(spark, args.sf_dir).localCheckpoint()
            path = _os.path.join(args.out, name)
            df.write.mode("overwrite").parquet(path)
            summary[name] = df.count()
        print(_json.dumps({"report_dir": args.out, "rows": summary}))
        return 0

    if args.mode == "create-index":
        from .ingest.wikidata import write_statements

        tmp = args.database_dir.rstrip("/") + ".reindex"
        df = spark.read.parquet(args.database_dir)
        write_statements(
            df,
            tmp,
            partitions=spark.sparkContext.defaultParallelism,
            partition_by_pred=getattr(args, "by_predicate", False),
        )
        import shutil

        shutil.rmtree(args.database_dir)
        shutil.move(tmp, args.database_dir)
        print(f"reindexed {args.database_dir}")
        return 0

    from .engine import GraphEngine

    engine = GraphEngine.from_parquet(spark, args.database_dir).warm()
    if args.mode == "server":
        from .server import run_server

        if getattr(args, "federation", None) is not None:
            # bare --federation = allow any endpoint; with IRIs = allowlist
            engine.allow_remote_services(args.federation or True)
        srv = run_server(engine, host="0.0.0.0", port=args.port)
        print(f"serving on :{srv.server_port} (GET /query?query=..., frontend at /)")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    from .server import run_cli

    run_cli(engine)
    return 0


if __name__ == "__main__":
    sys.exit(main())
