from cola_spark.plans.scheduler import CrawlConfig, run_crawl

__all__ = ["CrawlConfig", "run_crawl"]
