"""Content extraction — the capability of cola's readability port
(cola/core/extractor/__init__.py + preprocess.py, ~500 LoC: tag
stripping, node scoring by text/link density, title extraction),
re-expressed as a pure function + Arrow-vectorized stage.

This is a deliberately compact scoring extractor, not a line-port:
paragraph-level link-density scoring over tag-stripped blocks — the
same shape of computation the reference's readability fork performs.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_SCRIPT = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1>")
_TITLE = re.compile(r"(?is)<title[^>]*>(.*?)</title>")
_ANCHOR = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")
_TAG = re.compile(r"(?s)<[^>]+>")
_BLOCK_SPLIT = re.compile(r"(?i)</?(p|div|br|h[1-6]|li|td|section|article)[^>]*>")
_WS = re.compile(r"\s+")


def extract_title(html: str) -> str:
    m = _TITLE.search(html)
    return _WS.sub(" ", _TAG.sub("", m.group(1))).strip() if m else ""


def extract_main_text(html: str, min_block_chars: int = 20, max_link_density: float = 0.5) -> str:
    """Block-scored main-content extraction: split on block tags, strip
    markup, keep blocks that are long enough and not link farms."""
    body = _SCRIPT.sub(" ", html)
    kept = []
    for block in _BLOCK_SPLIT.split(body):
        if block is None or block.lower() in {"p", "div", "br", "li", "td", "section", "article"}:
            continue
        anchor_text = " ".join(_TAG.sub("", a) for a in _ANCHOR.findall(block))
        text = _WS.sub(" ", _TAG.sub(" ", block)).strip()
        if len(text) < min_block_chars:
            continue
        link_density = len(anchor_text) / max(len(text), 1)
        if link_density <= max_link_density:
            kept.append(text)
    return "\n".join(kept)


def extract_links(html: str) -> list[str]:
    return re.findall(r'(?i)<a\b[^>]*href=["\']([^"\'#>]+)', html)


def extract_content(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Vectorized extraction stage: (keys..., title, text, n_links)."""
    keys = [c for c in pages.columns if c != html_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[keys].copy()
            htmls = [
                h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else (h or "")
                for h in pdf[html_col]
            ]
            out["title"] = [extract_title(h) for h in htmls]
            out["text"] = [extract_main_text(h) for h in htmls]
            out["n_links"] = [len(extract_links(h)) for h in htmls]
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields if f.name != html_col
    )
    return pages.mapInPandas(batches, schema + ", title string, text string, n_links int")
