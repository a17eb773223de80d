"""CLI: parse DSL from a file or stdin and execute (or just compile).

Reference parity: ``python -m dsl.cli [file]`` reads one statement
and prints the compiled SQL (reference: dsl/cli.py:14-46). Our engine
executes directly, so the CLI has two modes:

* ``--plan-only`` (default when no testdata is reachable): parse and
  print the IR — the compile step, errors to stderr, exit 1 on bad
  input (same contract as the reference CLI);
* ``--execute``: build a SparkSession, register the tables under
  ``--sf-dir``, run the statement, print a result sample / metrics.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="declarativeml-spark")
    ap.add_argument("file", nargs="?", help="DSL file (default: stdin)")
    ap.add_argument("--execute", action="store_true", help="run against Spark")
    ap.add_argument(
        "--plan-only",
        action="store_true",
        help="parse and print the IR without executing (the default;"
        " documented flag accepted explicitly)",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--model-dir", default=None)
    args = ap.parse_args(argv)

    if args.file:
        try:
            with open(args.file) as f:
                text = f.read()
        except OSError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
    else:
        text = sys.stdin.read()

    from declarativeml_spark.dsl.parser import parse_script

    try:
        stmts = parse_script(text)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if not stmts:
        print("error: empty input", file=sys.stderr)
        return 1

    if args.plan_only and args.execute:
        print("error: --plan-only and --execute are exclusive", file=sys.stderr)
        return 1
    if not args.execute:
        dumps = [dataclasses.asdict(s) for s in stmts]
        print(
            json.dumps(dumps[0] if len(dumps) == 1 else dumps, default=str, indent=2)
        )
        return 0

    from declarativeml_spark.engine import Engine
    from declarativeml_spark.session import get_spark
    from declarativeml_spark.sources.catalog import register_views

    spark = get_spark("declarativeml-cli")
    register_views(spark, args.sf_dir)
    engine = Engine(spark, model_dir=args.model_dir)
    try:
        results = engine.execute_script(text)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    from pyspark.sql import DataFrame

    for result in results:
        if isinstance(result, DataFrame):
            result.show(20, truncate=False)
        elif dataclasses.is_dataclass(result) and not isinstance(result, type):
            # shallow field dump: pipeline_model is a live JVM handle
            d = {
                f.name: getattr(result, f.name)
                for f in dataclasses.fields(result)
                if f.name != "pipeline_model"
            }
            print(json.dumps(d, default=str, indent=2))
        else:
            print(json.dumps(result, default=str, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
