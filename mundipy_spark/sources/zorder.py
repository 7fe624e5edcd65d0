"""Z-order (Morton) locality layout — the row-group-level complement
to sources/tiled.py's partition pruning (the same lever as Delta's
OPTIMIZE ZORDER, public technique). Interleaving the quantized
lat/lon bits and sorting files by the resulting code makes every
parquet row group cover a tiny lat/lon rectangle, so the reader's
row-group min/max statistics prune bbox queries INSIDE each file —
partition pruning picks the directories, Z-order stats skip most row
groups within them.

The Morton code is pure integer bit arithmetic (shift/or/and magic
spreading) — whole-stage codegen on Spark and bit-for-bit
reproducible in DuckDB, so the code column itself is value-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per axis -> 32-bit code

_SPREAD_MASKS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _quant(v: Column, lo: float, hi: float) -> Column:
    """Quantize to [0, 2^BITS): floor((v-lo)/(hi-lo) * 2^BITS), clamped."""
    q = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(1 << BITS)).cast(
        "long"
    )
    return F.greatest(F.lit(0), F.least(F.lit((1 << BITS) - 1), q))


def _spread(c: Column) -> Column:
    for shift, mask in _SPREAD_MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_expr(lon: Column, lat: Column) -> Column:
    """32-bit Morton code of (lon, lat) in WGS84 (lon bits even, lat
    bits odd)."""
    x = _spread(_quant(lon, -180.0, 180.0))
    y = _spread(_quant(lat, -90.0, 90.0))
    return x.bitwiseOR(F.shiftleft(y, 1)).cast("long")


def morton_sql(lon: str, lat: str) -> str:
    """DuckDB twin of morton_expr (same quantization and spreading)."""

    def quant(v: str, lo: float, hi: float) -> str:
        q = f"CAST(floor(({v} - ({lo})) / ({hi - lo}) * {1 << BITS}) AS BIGINT)"
        return f"greatest(0, least({(1 << BITS) - 1}, {q}))"

    def spread(c: str) -> str:
        for shift, mask in _SPREAD_MASKS:
            c = f"(({c} | ({c} << {shift})) & {mask})"
        return c

    x = spread(quant(lon, -180.0, 180.0))
    y = spread(quant(lat, -90.0, 90.0))
    return f"CAST(({x} | ({y} << 1)) AS BIGINT)"


def write_zordered(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partition on the Morton code and sort within partitions —
    every output file covers a contiguous Z-range, every row group a
    tight lat/lon rectangle. At 100 TB this runs once per layer (or
    incrementally per ingest batch) and every later bbox scan pays
    O(result) row groups instead of O(table)."""
    coded = df.withColumn("_z", morton_expr(F.col(lon_col), F.col(lat_col)))
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
