"""Annotation overlays — the reference's PNG debug sink, dependency-free.

The reference rendered matplotlib overlays per page (bbox rectangles
colored by confidence band, truncated text labels) and uploaded PNGs
(``/root/reference/src/visualization/ocr_visualization.py:9-107``,
bands at ``:47``, truncation at ``:60``). Image libraries aren't part
of this engine's scale path (SURVEY.md §2.1 S8 — explicitly excluded
from the 10^12-row job), so the debug sink emits self-contained SVG —
pure column expressions, zero renderer dependencies, viewable anywhere.

Cross-engine determinism (the query is oracle-checked):

* coordinates are emitted at integer-pixel granularity
  (``ceil(double) → bigint → string``) — double→string casts format
  differently across engines (Java ``Double.toString`` vs C++
  shortest-round-trip), integer→string never does;
* element order inside a page's SVG body is pinned to ``elem_idx``
  (``array_sort`` on (elem_idx, shape) structs) — a bare
  ``collect_list`` has partition-dependent order.
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


def _px(col):
    """Integer-pixel coordinate string (see module docstring)."""
    return F.ceil(col).cast("string")


def annotation_svg(extracted: DataFrame) -> DataFrame:
    """One SVG overlay per (url, page): a rect + truncated label per
    element, colored by confidence band.

    HTML synthetic geometry is document-absolute (monotonic y across
    pages — the row clusterer needs it), so HTML shapes are rebased
    to page-local coordinates by the fixed page span; PDF elements
    are already page-local (their overlay sits on the page image) and
    get offset 0. The offset is a deterministic function of
    (doc_kind, page_num), mirrored exactly in the SQL oracle.
    """
    from ..kernel.html_extract import ROW_PITCH, ROWS_PER_PAGE

    el = extracted.select(
        "url", "doc_kind", F.explode("elements").alias("e")
    ).select(
        "url",
        F.col("e.elem_idx").alias("elem_idx"),
        F.col("e.page_num").alias("page_num"),
        F.col("e.text").alias("text"),
        F.col("e.confidence").alias("confidence"),
        F.col("e.bbox").alias("bbox"),
        F.when(F.col("doc_kind") == "html",
               (F.col("page_num").cast("double") - 1.0)
               * F.lit(float(ROWS_PER_PAGE * ROW_PITCH)))
        .otherwise(F.lit(0.0)).alias("y_off"),
    )
    # reference truncation: text[:30] + '...'
    label = F.when(
        F.length("text") > 30,
        F.concat(F.substring("text", 1, 30), F.lit("...")),
    ).otherwise(F.col("text"))
    # XML-escape AFTER truncation (the reference truncated rendered
    # text too): extracted text is entity-DECODED by the kernel, so a
    # literal '&' or '<' would make the SVG ill-formed in any viewer.
    # & first so it never double-escapes. Mirrored in the SQL oracle.
    label = F.replace(
        F.replace(
            F.replace(label, F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;")),
        F.lit(">"), F.lit("&gt;"))
    y_local = F.col("bbox.y1") - F.col("y_off")
    shape = F.concat(
        F.lit('<rect x="'), _px(F.col("bbox.x1")),
        F.lit('" y="'), _px(y_local),
        F.lit('" width="'), _px(F.col("bbox.width")),
        F.lit('" height="'), _px(F.col("bbox.height")),
        F.lit('" fill="none" stroke="'),
        _band_color(F.col("confidence")),
        F.lit('"/><text x="'), _px(F.col("bbox.x1")),
        F.lit('" y="'), (F.ceil(y_local) - 2).cast("string"),
        F.lit('" font-size="8">'), label, F.lit("</text>"),
    )
    per_page = (
        el.withColumn("shape", shape)
        .groupBy("url", "page_num")
        .agg(
            F.count("*").alias("n_elements"),
            # deterministic body: sort the (elem_idx, shape) structs
            F.concat_ws("\n", F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("elem_idx"), F.col("shape")))),
                lambda s: s["shape"])).alias("body"),
            F.max(F.ceil(F.col("bbox.x2"))).alias("max_x"),
            F.max(F.ceil(F.col("bbox.y2") - F.col("y_off")))
            .alias("max_y"),
        )
    )
    svg = F.concat(
        F.lit('<svg xmlns="http://www.w3.org/2000/svg" width="'),
        (F.col("max_x") + 10).cast("string"),
        F.lit('" height="'),
        (F.col("max_y") + 10).cast("string"),
        F.lit('">\n'), F.col("body"), F.lit("\n</svg>"),
    )
    return per_page.select(
        "url", "page_num", "n_elements", svg.alias("svg"))
