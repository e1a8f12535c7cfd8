"""STAC item assembly (SURVEY.md §2.2 P10/P11/P13): compose the nested
item document — id, collection_id, bbox, GeoJSON geometry, properties,
assets, links — as ONE Catalyst `select`, the engine's equivalent of the
reference's per-element CreateStacItem(template=..., preprocess=...,
postprocess=...) (avhrr…/recipe.py:128-136, insitu…/recipe.py:162-170).

User hooks (P12/P13) are DataFrame→DataFrame callables applied before /
after assembly — the declarative replacement for the reference's
per-element template functions.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

Hook = Callable[[DataFrame], DataFrame]

MEDIA_TYPE_NETCDF = "application/netcdf"


def geojson_bbox_polygon(w: Column, s: Column, e: Column, n: Column) -> Column:
    """P4: bbox → GeoJSON Polygon string — pure format_string, mirroring
    shapely.geometry.mapping(shapely.box(*bbox)) (avhrr…/recipe.py:59):
    counter-clockwise ring starting at (E, S), closed."""
    return F.format_string(
        '{"type": "Polygon", "coordinates": [[[%.1f, %.1f], [%.1f, %.1f], '
        "[%.1f, %.1f], [%.1f, %.1f], [%.1f, %.1f]]]}",
        e, s, e, n, w, n, w, s, e, s,
    )


def iso_datetime(col: str | Column) -> Column:
    """P1: timestamp → ISO-8601 string (avhrr…/recipe.py:26-29)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")


def build_items(
    metadata: DataFrame,
    *,
    id_col: str = "item_id",
    collection_col: str = "collection_id",
    bbox_cols: tuple[str, str, str, str] = ("west", "south", "east", "north"),
    start_col: str = "start_datetime",
    end_col: str = "end_datetime",
    href_col: str = "source_url",
    preprocess: Hook | None = None,
    postprocess: Hook | None = None,
) -> DataFrame:
    """P11: metadata rows → nested STAC item rows (schema per SURVEY
    §1.1). One wide select; every field whole-stage-codegen'd."""
    if preprocess is not None:
        metadata = preprocess(metadata)
    w, s, e, n = (F.col(c).cast("double") for c in bbox_cols)
    items = metadata.select(
        F.col(id_col).alias("id"),
        F.col(collection_col).alias("collection_id"),
        F.array(w, s, e, n).alias("bbox"),
        geojson_bbox_polygon(w, s, e, n).alias("geometry"),
        F.col(start_col).alias("start_datetime"),
        F.col(end_col).alias("end_datetime"),
        F.struct(
            iso_datetime(start_col).alias("start_datetime"),
            iso_datetime(end_col).alias("end_datetime"),
            F.col(collection_col).alias("collection"),
        ).alias("properties"),
        F.create_map(
            F.lit("data"),
            F.struct(
                F.col(href_col).alias("href"),
                F.lit(MEDIA_TYPE_NETCDF).alias("media_type"),
            ),
        ).alias("assets"),
        F.array(
            F.struct(
                F.lit("collection").alias("rel"),
                F.col(collection_col).alias("target"),
            )
        ).alias("links"),
    )
    if postprocess is not None:
        items = postprocess(items)
    return items


def items_to_json(items: DataFrame) -> DataFrame:
    """STAC-JSON export: the whole nested row as one JSON doc per item."""
    return items.select(
        "id", F.to_json(F.struct(*[c for c in items.columns])).alias("json")
    )
