"""Dissolve: groupBy-key geometric union (the reference's roadmap item
"Dissolving into h3/s2 locations", mundipy README.md:22; the union-fold
itself mirrors the union_spatial_cache's internal union of cached
pieces, mundipy/cache/__init__.py:56-97).

Spark shape: hash-partition by key, applyInPandas fold per group — the
grouped-map UDAF pattern (SURVEY §2.9 st_union_agg). Each group's
geometries union pairwise via the Greiner–Hormann kernel; output is one
row per key with the dissolved (Multi)Polygon.

Scale: the shuffle carries WKB once; groups are independent so skewed
keys benefit from AQE. For tile-dissolve (cell -> union of geometries
per cell) pre-clip each geometry to its cell first (clip_to_rect) so
group payloads stay bounded.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from mundipy_spark.kernels import overlay, wkb


def dissolve(
    df: DataFrame, by: list[str] | str, geom_col: str = "geometry"
) -> DataFrame:
    """One row per key group with the union of the group's geometries."""
    keys = [by] if isinstance(by, str) else list(by)
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keys
    )
    schema = f"{key_schema}, {geom_col} binary"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [
            wkb.loads(bytes(b))
            for b in pdf[geom_col]
            if isinstance(b, (bytes, bytearray, memoryview))
        ]
        # cascaded (pairwise-tree) union: O(n log n) union calls on
        # operands of balanced size instead of a linear fold whose
        # accumulator grows with every step — the large-group tail is
        # what dominates dissolve wall time
        while len(geoms) > 1:
            nxt = [
                overlay.union(geoms[i], geoms[i + 1])
                if i + 1 < len(geoms)
                else geoms[i]
                for i in range(0, len(geoms), 2)
            ]
            geoms = [g for g in nxt if g is not None]
        u = geoms[0] if geoms else None
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out[geom_col] = [wkb.dumps(u) if u is not None else None]
        return pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandas(fold, schema)
