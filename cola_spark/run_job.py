"""CLI job runner — the analogue of cola's ``coca.py job -u <dir> -r``
(bin/coca.py → cola/commands/job.py): describe a crawl job, run it,
print the result summary.

    python -m cola_spark.run_job --workdir /tmp/crawl1 \
        --n-urls 5000 --n-hosts 50 [--dedup-mode hybrid] [--adaptive] \
        [--rounds 10] [--resume] [--seeds path/to/seeds.parquet]

Seeds default to the deterministic generator; pass --seeds to crawl a
parquet seed list with columns (url, priority, seq, force) instead —
the JobDescription.starts analogue.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Run a cola_spark crawl job")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", help="parquet seed list (url, priority, seq, force)")
    ap.add_argument("--n-urls", type=int, default=5000)
    ap.add_argument("--n-hosts", type=int, default=100)
    ap.add_argument("--n-images", type=int, default=200)
    ap.add_argument("--pages-per-host", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--dedup-mode", default="exact", choices=["exact", "hybrid", "cuckoo"])
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument("--no-decode", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from cola_spark.plans.scheduler import CrawlConfig, latest_round, run_crawl
    from cola_spark.session import get_spark
    from cola_spark.sources import gen_budgets, gen_frontier_seeds, gen_images, gen_robots

    spark = get_spark("cola_spark_job", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    if args.seeds:
        seeds = spark.read.parquet(args.seeds)
        missing = {"url", "priority", "seq", "force"} - set(seeds.columns)
        if missing:
            print(f"error: seed parquet missing columns {sorted(missing)}", file=sys.stderr)
            return 2
    else:
        seeds = gen_frontier_seeds(
            spark, args.n_urls, n_hosts=args.n_hosts, pages_per_host=args.pages_per_host
        )
    cfg = CrawlConfig(
        workdir=args.workdir,
        n_images=args.n_images,
        pages_per_host=args.pages_per_host,
        max_rounds=args.rounds,
        decode=not args.no_decode,
        adaptive=args.adaptive,
        dedup_mode=args.dedup_mode,
    )
    log = run_crawl(
        spark, seeds, gen_robots(spark, args.n_hosts), gen_budgets(spark, args.n_hosts),
        gen_images(spark, args.n_images), cfg, resume=args.resume,
    )
    n = log.count()
    ok = log.filter(F.col("fetch_ok")).count()
    print(json.dumps({
        "workdir": args.workdir, "rounds_completed": latest_round(cfg),
        "crawled": n, "fetched_ok": ok, "dedup_mode": args.dedup_mode,
        "adaptive": args.adaptive,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
