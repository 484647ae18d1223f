from cola_spark.sources.generators import (
    gen_budgets,
    gen_frontier_seeds,
    gen_audio,
    gen_images,
    gen_robots,
)
from cola_spark.sources.tables import load_table

__all__ = ["gen_audio", "gen_images", "gen_frontier_seeds", "gen_robots", "gen_budgets", "load_table"]
