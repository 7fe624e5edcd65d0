"""Dataset / Map: the lazy layer abstractions (reference
mundipy/dataset.py, mundipy/map.py) over Spark DataFrames.

A Dataset wraps a DataFrame whose rows are features (geometry WKB +
property columns). Everything stays lazy exactly like the reference
("does not automatically load features", dataset.py:1-10) because a
DataFrame IS a lazy plan; `geometry_collection()` persists it (the
lru_cache analogue, dataset.py:113-115).

Driver-side probe methods (intersects/within/nearest) mirror the
reference's single-geometry API for interactive use and the pytest
parity suite; set-scale versions live in operators.joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark import StorageLevel

from mundipy_spark.feature import Feature, LocalIndex
from mundipy_spark.functions import st


class Dataset:
    def __init__(self, source, geom_col: str = "geometry", spark: SparkSession | None = None,
                 crs: str = "EPSG:4326", crs_units: str = "meters"):
        """source: DataFrame, GeoJSON path, or parquet path (by suffix).

        crs / crs_units: source coordinate system. Anything other than
        EPSG:4326 is normalized to WGS84 at ingest (reference
        mundipy/dataset.py:85-88 does the same via to_crs), so every
        downstream operator sees one CRS — this is what lets a
        state-plane-feet layer join 4326 layers transparently
        (reference tests/test_mundi_q.py:75-88). Implemented CRSs:
        kernels.proj.crs_transforms."""
        self.geom_col = geom_col
        self.crs = "EPSG:4326"  # post-ingest, always
        self.source_crs = crs
        self._index: LocalIndex | None = None
        if isinstance(source, DataFrame):
            self.df = source
        elif isinstance(source, dict):
            # reference parity: Dataset({'url': 'postgresql://...',
            # 'table': 't'}) (mundipy/dataset.py:50-56) — executes a
            # partitioned JDBC scan with hex-WKB decode (sources/postgis)
            from mundipy_spark.sources import postgis

            spark = spark or SparkSession.getActiveSession()
            extra = {
                k: v for k, v in source.items() if k not in ("url", "table")
            }
            self.df = postgis.decode_geometry(
                postgis.read_postgis(
                    spark, source["url"], source["table"], geom_col=geom_col,
                    **extra,
                ).load(),
                geom_col,
            )
        elif isinstance(source, str):
            spark = spark or SparkSession.getActiveSession()
            if source.endswith((".geojson", ".json")):
                from mundipy_spark.sources.geojson import read_geojson

                self.df = read_geojson(spark, source, geom_col=geom_col)
            elif source.endswith(".shp"):
                from mundipy_spark.sources.shapefile import read_shapefile

                self.df = read_shapefile(spark, source, geom_col=geom_col)
            elif source.endswith(".kml"):
                from mundipy_spark.sources.kml import read_kml

                self.df = read_kml(spark, source, geom_col=geom_col)
            else:
                self.df = spark.read.parquet(source)
        else:
            raise TypeError(f"unsupported source {type(source)}")
        if crs.upper() != "EPSG:4326" or crs_units != "meters":
            self.df = self.df.withColumn(
                geom_col, st.st_to_wgs84(F.col(geom_col), crs, crs_units)
            ).drop("minx", "miny", "maxx", "maxy")
        if "minx" not in self.df.columns:
            b = st.st_bounds(F.col(geom_col))
            self.df = self.df.withColumn("_b", b).select(
                "*", "_b.minx", "_b.miny", "_b.maxx", "_b.maxy"
            ).drop("_b")

    # --- lazy materialization / cache (S3) ---
    def geometry_collection(self) -> DataFrame:
        self.df.persist(StorageLevel.MEMORY_AND_DISK)
        return self.df

    def local_index(self) -> LocalIndex:
        """Collect + index the layer for broadcast (Mundi.q side layers)."""
        if self._index is None:
            cols = [c for c in self.df.columns if c not in ("minx", "miny", "maxx", "maxy")]
            self._index = LocalIndex.from_dataframe(self.df.select(cols), self.geom_col)
        return self._index

    # --- scans (S4, S5) ---
    def inside_bbox(self, bbox) -> DataFrame:
        qminx, qminy, qmaxx, qmaxy = bbox
        return self.df.filter(
            st.bbox_intersects_expr(
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
                F.lit(qminx), F.lit(qminy), F.lit(qmaxx), F.lit(qmaxy),
            )
        )

    def __len__(self) -> int:
        return self.df.count()

    def __iter__(self):
        for r in self.df.toLocalIterator():
            d = r.asDict()
            for k in ("minx", "miny", "maxx", "maxy"):
                d.pop(k, None)
            g = d.pop(self.geom_col)
            yield Feature(bytes(g), d)

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        r = self.df.agg(
            F.min("minx"), F.min("miny"), F.max("maxx"), F.max("maxy")
        ).collect()[0]
        return tuple(r)

    # --- notebook repr (S8, reference dataset.py:208-248) ---
    def _repr_svg_(self, limit: int = 1000) -> str:
        from mundipy_spark.kernels import wkb as wkb_mod
        from mundipy_spark.svg import render_svg

        geoms = [
            wkb_mod.loads(bytes(r[0]))
            for r in self.df.select(self.geom_col).limit(limit).collect()
            if r[0] is not None
        ]
        return render_svg(geoms)

    # --- single-probe joins (J1-J3), driver-side parity API ---
    def intersects(self, probe) -> list[Feature]:
        return self.local_index().intersects(probe)

    def within(self, radius_m: float, probe) -> list[Feature]:
        return self.local_index().within(radius_m, probe)

    def nearest(self, probe) -> Feature | None:
        return self.local_index().nearest(probe)


class Map(dict):
    """Named layer catalog (reference mundipy/map.py:5-12): dict of
    name -> Dataset; also registers each layer as a temp view so
    spark.sql can address them."""

    def __init__(self, layers: dict, spark: SparkSession | None = None):
        super().__init__()
        for name, src in layers.items():
            ds = src if isinstance(src, Dataset) else Dataset(src, spark=spark)
            self[name] = ds
            ds.df.createOrReplaceTempView(name)
