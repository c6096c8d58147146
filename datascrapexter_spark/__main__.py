"""CLI: the full `datascrapexter` subcommand surface.

    python -m datascrapexter_spark run config.yaml \
        --pages /path/to/pages.parquet [--output out_dir] \
        [--state state_dir] [--rounds N] [--robots robots_dir]
    python -m datascrapexter_spark validate config.yaml [-v]
    python -m datascrapexter_spark template [--type basic|ecommerce|news]
    python -m datascrapexter_spark version

`--pages` is the crawl's page source (url, html[, warc_ts]) — the
deterministic stand-in for live HTTP fetch per BASELINE.json input_hint.
`--robots` is a directory of <host>.txt robots files.
Reference CLI: /root/reference/cmd/datascrapexter/main.go:303-347
(run :312-318, validate :320-326 -> executeValidation :161-183,
template :328-335 -> generateTemplate :66-83, version :336-338).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="datascrapexter_spark")
    sub = parser.add_subparsers(dest="command", required=True)
    run_p = sub.add_parser("run", help="run a scrape job from a config")
    run_p.add_argument("config", help="YAML config path")
    run_p.add_argument("--pages", required=True, help="pages parquet path")
    run_p.add_argument("--output", default=None, help="output path")
    run_p.add_argument("--state", default=None, help="state store dir")
    run_p.add_argument("--rounds", type=int, default=None)
    run_p.add_argument("--robots", default=None,
                       help="dir of <host>.txt robots files")
    run_p.add_argument("--master", default=None)

    val_p = sub.add_parser("validate", help="validate a config file")
    val_p.add_argument("config", help="YAML config path")
    val_p.add_argument("-v", "--verbose", action="store_true")

    tpl_p = sub.add_parser("template", help="print a starter config")
    tpl_p.add_argument("--type", dest="template_type", default="basic",
                       choices=("basic", "ecommerce", "news"))

    sub.add_parser("version", help="print version")

    args = parser.parse_args(argv)
    if args.command == "validate":
        return _validate(args.config, args.verbose)
    if args.command == "template":
        return _template(args.template_type)
    if args.command == "version":
        print("datascrapexter_spark 3.0 (PySpark engine, "
              "DataScrapexter-compatible)")
        return 0

    from .run import run_scrape_job
    from .session import get_spark

    robots = {}
    if args.robots:
        for fn in os.listdir(args.robots):
            if fn.endswith(".txt"):
                with open(os.path.join(args.robots, fn)) as fh:
                    robots[fn[:-4]] = fh.read()

    spark = get_spark("datascrapexter-run", master=args.master)
    try:
        pages = spark.read.parquet(args.pages)
        results, stats = run_scrape_job(
            spark, args.config, pages, output_path=args.output,
            robots_texts=robots, state_root=args.state,
            max_rounds=args.rounds,
        )
        n = results.count()
        for s in stats:
            print(f"round {s['round']}: scheduled={s['scheduled']} "
                  f"fetched={s['fetched']} new={s['new_urls']} "
                  f"pending={s['pending']} ({s['wall_ms']}ms)", file=sys.stderr)
        print(f"{n} results" + (f" -> {args.output}" if args.output else ""))
        return 0
    finally:
        spark.stop()


def _validate(config_path: str, verbose: bool) -> int:
    """`validate` subcommand (executeValidation, main.go:161-183), run
    under the error-recovery service like the reference (main.go:47-63),
    plus the extended cross-field report."""
    from .errors import ErrorRecoveryService, user_friendly_error
    from .extract.config import load_config
    from .extract.config_validation import (
        format_validation_error,
        validate_with_details,
        validation_suggestions,
    )

    svc = ErrorRecoveryService()
    try:
        cfg = svc.execute_with_retry(
            lambda: load_config(config_path), "validation")
        cfg.validate()
        result = validate_with_details(cfg)
    except Exception as e:  # noqa: BLE001 — CLI boundary
        title, message, suggestions = user_friendly_error(e)
        print(f"Error: {title}: {message}", file=sys.stderr)
        for s in suggestions:
            print(f"  - {s}", file=sys.stderr)
        if verbose:
            print(f"  ({e})", file=sys.stderr)
        return 1
    if result.errors:
        print(format_validation_error(result), file=sys.stderr)
        for s in validation_suggestions(result):
            print(f"  - {s}", file=sys.stderr)
        return 1
    for w in result.warnings:
        print(f"warning: {w}", file=sys.stderr)
    print(f"✓ Configuration file '{config_path}' is valid")
    if verbose:
        print("Configuration details:")
        print(f"  Name: {cfg.name}")
        print(f"  Base URL: {cfg.base_url}")
        print(f"  Fields: {len(cfg.fields)}")
        print(f"  Output format: {cfg.output_format}")
    return 0


def _template(template_type: str) -> int:
    """`template` subcommand (generateTemplate, main.go:66-83): YAML to
    stdout, round-trippable through `validate`/`run`."""
    import dataclasses

    import yaml

    from .extract.config_cache import generate_template

    cfg = generate_template(template_type)
    data = {
        "name": cfg.name,
        "base_url": cfg.base_url,
        "fields": [
            # explicit identity/equality checks: `v not in (..., False)`
            # would also drop int/float 0 values (0 == False in Python)
            {k: v for k, v in dataclasses.asdict(f).items()
             if not (v is None or v == "" or v == [] or v is False)}
            for f in cfg.fields
        ],
        "output": {"format": cfg.output_format, "file": cfg.output_file},
        "rate_limit": {"requests_per_second": cfg.requests_per_second},
    }
    print(yaml.safe_dump(data, sort_keys=False), end="")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
