"""CLI: the `datascrapexter run config.yaml` surface.

    python -m datascrapexter_spark run config.yaml \
        --pages /path/to/pages.parquet [--output out_dir] \
        [--state state_dir] [--rounds N] [--robots robots_dir]

`--pages` is the crawl's page source (url, html[, warc_ts]) — the
deterministic stand-in for live HTTP fetch per BASELINE.json input_hint.
`--robots` is a directory of <host>.txt robots files.
Reference CLI: /root/reference/cmd/datascrapexter/main.go:303-347.
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
    args = parser.parse_args(argv)

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


if __name__ == "__main__":
    raise SystemExit(main())
