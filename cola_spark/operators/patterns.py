"""UrlPatterns — regex → parser dispatch (cola/core/urls.py ~L10-80).

Reference: ``UrlPatterns(*Url(regex, name, parser_cls))`` with
``matches(url)`` (bool filter — non-matching URLs are dropped from the
frontier) and ``get_parser(url)`` (first matching pattern wins).

Spark re-expression: one chained CASE WHEN rlike expression producing a
``parser_id`` column (JVM regex, whole-stage codegen); ``matches`` is
``parser_id IS NOT NULL``. First-match-wins order is the declaration
order, same as the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class UrlPattern:
    regex: str
    name: str


class UrlPatterns:
    def __init__(self, *patterns: UrlPattern):
        self.patterns = list(patterns)

    def parser_id_col(self, url: Column) -> Column:
        """First matching pattern's name, else NULL (declaration order
        wins, mirroring cola's get_parser scan)."""
        expr = F.lit(None).cast("string")
        for p in reversed(self.patterns):
            expr = F.when(url.rlike(p.regex), F.lit(p.name)).otherwise(expr)
        return expr

    def dispatch(self, df: DataFrame, url_col: str = "url_canon") -> DataFrame:
        """Add parser_id; DROP non-matching rows (cola drops URLs no
        pattern claims)."""
        out = df.withColumn("parser_id", self.parser_id_col(F.col(url_col)))
        return out.filter(F.col("parser_id").isNotNull())

    def matches(self, df: DataFrame, url_col: str = "url_canon") -> DataFrame:
        return df.filter(self.parser_id_col(F.col(url_col)).isNotNull())
