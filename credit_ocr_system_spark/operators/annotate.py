"""Annotation overlays — the reference's PNG debug sink, dependency-free.

The reference rendered matplotlib overlays per page (bbox rectangles
colored by confidence band, truncated text labels) and uploaded PNGs
(``/root/reference/src/visualization/ocr_visualization.py:9-107``,
bands at ``:47``, truncation at ``:60``). Image libraries aren't part
of this engine's scale path (SURVEY.md §2.1 S8 — explicitly excluded
from the 10^12-row job), so the debug sink emits self-contained SVG —
pure column expressions, zero renderer dependencies, viewable anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BAND_COLORS = {"high": "#2e7d32", "mid": "#ef6c00", "low": "#c62828"}


def _band_color(conf):
    # reference thresholds: green ≥ 0.9, orange ≥ 0.7, red below
    return (F.when(conf >= 0.9, BAND_COLORS["high"])
             .when(conf >= 0.7, BAND_COLORS["mid"])
             .otherwise(BAND_COLORS["low"]))


def annotation_svg(extracted: DataFrame) -> DataFrame:
    """One SVG overlay per (url, page): a rect + truncated label per
    element, colored by confidence band."""
    el = extracted.select(
        "url", F.explode("elements").alias("e")
    ).select(
        "url",
        F.col("e.page_num").alias("page_num"),
        F.col("e.text").alias("text"),
        F.col("e.confidence").alias("confidence"),
        F.col("e.bbox").alias("bbox"),
    )
    # reference truncation: text[:30] + '...'
    label = F.when(
        F.length("text") > 30,
        F.concat(F.substring("text", 1, 30), F.lit("...")),
    ).otherwise(F.col("text"))
    rect = F.concat(
        F.lit('<rect x="'), F.col("bbox.x1").cast("string"),
        F.lit('" y="'), F.col("bbox.y1").cast("string"),
        F.lit('" width="'), F.col("bbox.width").cast("string"),
        F.lit('" height="'), F.col("bbox.height").cast("string"),
        F.lit('" fill="none" stroke="'),
        _band_color(F.col("confidence")),
        F.lit('"/><text x="'), F.col("bbox.x1").cast("string"),
        F.lit('" y="'), (F.col("bbox.y1") - 2).cast("string"),
        F.lit('" font-size="8">'), label, F.lit("</text>"),
    )
    per_page = (
        el.withColumn("shape", rect)
        .groupBy("url", "page_num")
        .agg(
            F.count("*").alias("n_elements"),
            F.concat_ws("\n", F.collect_list("shape")).alias("body"),
            F.max(F.col("bbox.x2")).alias("max_x"),
            F.max(F.col("bbox.y2")).alias("max_y"),
        )
    )
    svg = F.concat(
        F.lit('<svg xmlns="http://www.w3.org/2000/svg" width="'),
        F.ceil(F.col("max_x") + 10).cast("string"),
        F.lit('" height="'),
        F.ceil(F.col("max_y") + 10).cast("string"),
        F.lit('">\n'), F.col("body"), F.lit("\n</svg>"),
    )
    return per_page.select(
        "url", "page_num", "n_elements", svg.alias("svg"))
