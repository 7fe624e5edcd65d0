"""Spatial joins compiled to tile-cell equi-joins.

The reference expresses joins as per-feature probes of an R-tree/GiST
indexed layer (intersects: mundipy/dataset.py:143-162; within:
dataset.py:164-177; nearest: dataset.py:179-206). At Spark scale the
same filter-then-refine shape becomes:

    polygons --st_cells--> explode cover --+
                                           +--> equi-join on cell --> bbox
    points  --cell_expr (pure JVM)---------+    prefilter (codegen) -->
                                                exact PIP refine (Arrow UDF)

Plan properties (the 100 TB story):
- the point/probe side is never shuffled when the polygon index is
  broadcast (OSM admin layers tile to ~10^6-10^7 cell rows — comfortably
  broadcastable; pass broadcast_index=False to fall back to a shuffled
  equi-join, where AQE skew-join plus optional salting handles hot urban
  cells);
- a point lands in exactly ONE cell at a fixed resolution, so the
  equi-join emits each (point, polygon-cover-row) candidate at most once
  — no dedup shuffle is needed before refinement;
- refinement cost is bounded by candidates, not |points| x |polygons|,
  and the bbox prefilter runs JVM-side so the Arrow UDF only sees
  near-hits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mundipy_spark.functions import st
from mundipy_spark.kernels import tiling

DEFAULT_RES = 8  # ~0.7 deg cells; override per layer via pick_resolution


# ---------------------------------------------------------------------------
# cell helpers (JVM-side)
# ---------------------------------------------------------------------------


def cell_xy_expr(cell: Column) -> tuple[Column, Column, Column]:
    res = F.shiftright(cell, tiling._RES_SHIFT)
    x = F.shiftright(cell, tiling._X_SHIFT).bitwiseAND(F.lit(tiling._XY_MASK))
    y = cell.bitwiseAND(F.lit(tiling._XY_MASK))
    return res, x, y


def parent_cell_expr(cell: Column, steps: int = 1) -> Column:
    """Quadtree parent cell id, pure JVM bit arithmetic (floor
    composition makes parent(cell_r(p)) == cell_{r-steps}(p) exactly)."""
    res, x, y = cell_xy_expr(cell)
    return (
        F.shiftleft(res - steps, tiling._RES_SHIFT)
        .bitwiseOR(F.shiftleft(F.shiftright(x, steps), tiling._X_SHIFT))
        .bitwiseOR(F.shiftright(y, steps))
    )


def cell_bounds_exprs(cell, res: int):
    """(minx, miny, maxx, maxy) of a cell id — pure column arithmetic."""
    nx, ny = tiling.nx_at(res), tiling.ny_at(res)
    _, x, y = cell_xy_expr(cell)
    minx = -180.0 + x.cast("double") * (360.0 / nx)
    miny = -90.0 + y.cast("double") * (180.0 / ny)
    return minx, miny, minx + 360.0 / nx, miny + 180.0 / ny


def rollup_cells(
    df: DataFrame, cell_col: str = "cell", steps: int = 1, aggs: list | None = None
) -> DataFrame:
    """Hypertable-style rollup: re-aggregate a per-cell table to the
    parent resolution. Partial aggregation makes the shuffle carry one
    row per FINE cell, and successive rollups chain (r8 -> r6 -> r4)
    without touching the raw data again."""
    aggs = aggs or [F.sum("n").alias("n")]
    return (
        df.withColumn(cell_col, parent_cell_expr(F.col(cell_col), steps))
        .groupBy(cell_col)
        .agg(*aggs)
    )


def neighbors_expr(cell: Column, res: int, k: int = 1) -> Column:
    """array<long> of the (2k+1)^2 neighborhood of a cell, pure JVM
    arithmetic: longitude wraps, latitude clamps (drops out-of-range)."""
    nx, ny = tiling.nx_at(res), tiling.ny_at(res)
    _, x, y = cell_xy_expr(cell)
    cells = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            xn = (x + dx + nx) % nx
            yn = y + dy
            c = (
                F.shiftleft(F.lit(res).cast("long"), tiling._RES_SHIFT)
                .bitwiseOR(F.shiftleft(xn, tiling._X_SHIFT))
                .bitwiseOR(yn)
            )
            cells.append(F.when((yn >= 0) & (yn < ny), c))
    return F.array_compact(F.array(*cells))


def neighbors_radius_expr(cell: Column, res: int, radius_m: float, lat: Column) -> Column:
    """Latitude-aware neighborhood: enough ±x columns that any point
    within radius_m of a point in `cell` shares a cell with this list.

    Cell HEIGHT in meters is latitude-independent, so res is chosen with
    height >= radius (dy in ±1 suffices); cell WIDTH shrinks by cos(lat),
    so dxmax grows toward the poles — computed per row, fully JVM-side,
    capped at the half-grid (a polar cap where everything is within
    radius)."""
    nx, ny = tiling.nx_at(res), tiling.ny_at(res)
    width_deg = tiling.cell_deg(res)
    _, x, y = cell_xy_expr(cell)
    # effective latitude: |lat| plus one cell of slack for the dy move
    eff = F.least(F.abs(lat) + F.lit(width_deg), F.lit(89.9))
    cosl = F.greatest(F.cos(F.radians(eff)), F.lit(1e-6))
    dxmax = F.least(
        F.ceil(F.lit(radius_m) / (F.lit(width_deg * 111_320.0) * cosl)).cast("long") + 1,
        F.lit(nx // 2),
    )
    dxs = F.sequence(-dxmax, dxmax)

    # NB: F.transform passes (element, index) to a 2-arg lambda — bind yn
    # through a closure factory so the lambda stays single-argument.
    def row_cells(yn):
        def one(dx):
            return (
                F.shiftleft(F.lit(res).cast("long"), tiling._RES_SHIFT)
                .bitwiseOR(F.shiftleft((x + dx + 2 * nx) % nx, tiling._X_SHIFT))
                .bitwiseOR(yn)
            )

        return one

    out = []
    for dy in (-1, 0, 1):
        yn = y + dy
        out.append(
            F.when(
                (yn >= 0) & (yn < ny),
                F.transform(dxs, row_cells(yn)),
            ).otherwise(F.array().cast("array<long>"))
        )
    return F.array_distinct(F.flatten(F.array(*out)))


# ---------------------------------------------------------------------------
# polygon tile index
# ---------------------------------------------------------------------------


def tile_index(
    polys: DataFrame,
    geom_col: str = "geometry",
    res: int = DEFAULT_RES,
    keep: list[str] | None = None,
    null_interior_geom: bool = True,
    refine: str = "arrow",
) -> DataFrame:
    """Explode a polygon layer into its covering cells, carrying bbox
    columns for the JVM-side prefilter. One output row per (polygon,
    cell). This is the broadcast side of every tile join; persist it
    when reused across queries (the Spark analogue of the reference's
    layer lru_cache, mundipy/dataset.py:113-115).

    null_interior_geom drops the WKB payload on interior (cell_full)
    rows — those candidates are accepted from the cell id alone, so the
    bytes would only bloat the broadcast (most covering cells of a big
    polygon are interior). Pass False when downstream needs the
    geometry on every row (e.g. overlap-area computation).

    refine="jvm" additionally precomputes, per BOUNDARY cell, the local
    segment subset + parity bit (`st.st_cell_refine`) and DROPS the WKB
    column entirely: tile_join_points then refines with a pure Catalyst
    expression — zero Python on the probe path, and the broadcast ships
    a few doubles per boundary cell instead of whole-polygon WKB (the
    shape that matters when the probe side is 10^12 rows). Valid only
    for disjoint-interior polygon layers; an invalid overlapping-
    interior multipolygon is flagged with an nring=-1 sentinel by
    st_cell_refine (exact check, kernels.tiling.
    multiparts_interiors_overlap) — the default join path then falls
    back to "arrow" automatically, and using such an index explicitly
    raises. Default "arrow" keeps the geometry column and the
    Arrow-kernel refinement, correct for any layer."""
    if refine not in ("arrow", "jvm"):
        raise ValueError(f"unsupported refine={refine!r}")
    cols = keep if keep is not None else [c for c in polys.columns if c != geom_col]
    # spread the (Python-UDF) cover computation across cores: polygon
    # layers often arrive in one or two partitions and the index build
    # would otherwise serialize
    npart = polys.sparkSession.sparkContext.defaultParallelism
    b = polys.repartition(npart).withColumn("_b", st.st_bounds(F.col(geom_col)))
    idx = (
        b.select(
            *cols,
            F.col(geom_col).alias(geom_col),
            F.col("_b.minx").alias("minx"),
            F.col("_b.miny").alias("miny"),
            F.col("_b.maxx").alias("maxx"),
            F.col("_b.maxy").alias("maxy"),
            F.explode(st.st_cells_classified(F.col(geom_col), F.lit(res))).alias("_c"),
        )
        .withColumn("cell", F.col("_c.cell"))
        .withColumn("cell_full", F.col("_c.full"))
        .drop("_c")
        .withColumn(
            geom_col,
            F.when(~F.col("cell_full"), F.col(geom_col))
            if null_interior_geom
            else F.col(geom_col),
        )
    )
    if refine == "jvm":
        ref = F.when(
            ~F.col("cell_full"), st.st_cell_refine(F.col(geom_col), F.col("cell"))
        )
        idx = (
            idx.withColumn("_ref", ref)
            .withColumn("nring", F.col("_ref.nring"))
            .withColumn("bpar", F.col("_ref.bpar"))
            .withColumn("segs", F.col("_ref.segs"))
            .drop("_ref", geom_col)
        )
    return idx


def add_point_cell(
    df: DataFrame, lon: str = "lon", lat: str = "lat", res: int = DEFAULT_RES,
    out: str = "cell",
) -> DataFrame:
    return df.withColumn(out, st.cell_expr(F.col(lon), F.col(lat), res))


# above this many segments per boundary cell, the unrolled JVM refine
# expression stops paying for itself (and past ~hundreds of terms the
# driver's Column-tree conversion overflows): prefer the Arrow index
# for such layers; a prebuilt dense jvm index falls back to the
# HOF-aggregate form (correct at any k, CodegenFallback-slow)
UNROLL_CAP = 16

# memo keyed by the index DataFrame's logical plan id: the unroll width
# is a property of the (usually persisted, reused across queries) index,
# so the tiny driver-side agg runs once per layer, not once per join
_MAXK_CACHE: dict[int, tuple[int, bool]] = {}


def _index_probe(index: DataFrame) -> tuple[int, bool]:
    """(maxk, unsafe) of a refine="jvm" index: maxk is the max segments
    per boundary cell (the unroll width for st.pip_refine_expr), unsafe
    is True when any layer geometry carries st_cell_refine's nring=-1
    sentinel (invalid overlapping-interior multipolygon — the refine
    expression would return wrong containment; callers must use the
    Arrow path). ONE small driver-side agg over the (broadcast-sized)
    index, memoized per plan; amortized exactly like the build itself."""
    key = index._jdf.queryExecution().logical().semanticHash()
    hit = _MAXK_CACHE.get(key)
    if hit is None:
        row = index.agg(
            F.max(F.size("segs")), F.min(F.coalesce("nring", F.lit(0)))
        ).collect()[0]
        hit = (int(row[0] or 0) // 4, int(row[1] or 0) < 0)
        if len(_MAXK_CACHE) > 1024:
            _MAXK_CACHE.clear()
        _MAXK_CACHE[key] = hit
    return hit


def _index_maxk(index: DataFrame) -> int:
    """Unroll width of a refine="jvm" index, refusing unsafe layers."""
    maxk, unsafe = _index_probe(index)
    if unsafe:
        raise ValueError(
            "tile join: this refine='jvm' index contains an invalid "
            "multipolygon with overlapping member interiors; rebuild it "
            "with tile_index(refine='arrow') (the default join path "
            "does this automatically)"
        )
    return maxk


# ---------------------------------------------------------------------------
# point-in-polygon / intersects join
# ---------------------------------------------------------------------------


def tile_join_points(
    points: DataFrame,
    polys: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    geom_col: str = "geometry",
    res: int = DEFAULT_RES,
    how: str = "inner",
    broadcast_index: bool = True,
    salt: int = 0,
    poly_cols: list[str] | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """Points-vs-polygons intersects join (the reference's canonical
    point-in-polygon tagging workload, tests/test_example.py:10-27).

    how='inner' keeps matching pairs; how='left' keeps all points with
    polygon columns null when unmatched (the 'none' default semantics of
    the reference's tagging loop).

    salt>0 replicates the index rows salt ways and scatters probes by a
    hash — only meaningful when broadcast_index=False (a broadcast join
    has no shuffle to skew).

    index: a prebuilt (and ideally .persist()ed) tile_index(polys, res)
    — at scale the index is built ONCE and amortized over the whole
    probe scan (the Spark analogue of the reference's layer lru_cache,
    mundipy/dataset.py:113-115); pass it here to keep repeated joins
    from re-running the cover UDFs.
    """
    if index is None:
        # default to the JVM refine index: exact PIP without Python on
        # the probe path. Two cases rebuild as an Arrow index instead:
        # layers denser than UNROLL_CAP segments per boundary cell
        # (detailed coastlines vs a fine res — per-batch numpy
        # refinement wins at that density), and layers carrying an
        # invalid overlapping-interior multipolygon (st_cell_refine's
        # nring=-1 sentinel: XOR parity would be wrong there). The
        # index is persisted BEFORE the probe so the expensive build
        # (cover + refine UDFs) runs once — the probe agg materializes
        # it into cache and the join reuses it; without this the build
        # executed twice (once for the agg, once inside the join).
        # Broadcast-sized by contract, so the cache footprint is small;
        # callers who loop many one-shot joins should prebuild +
        # persist + unpersist the index themselves (see docstring).
        index = tile_index(
            polys, geom_col=geom_col, res=res, keep=poly_cols, refine="jvm"
        ).persist()
        maxk, unsafe = _index_probe(index)
        if unsafe or maxk > UNROLL_CAP:
            index.unpersist()
            index = tile_index(
                polys, geom_col=geom_col, res=res, keep=poly_cols, refine="arrow"
            )
    pts = add_point_cell(points, lon, lat, res)

    join_keys = ["cell"]
    if salt > 0 and not broadcast_index:
        index = index.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        pts = pts.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(lon), F.col(lat)), F.lit(salt))
        )
        join_keys = ["cell", "_salt"]

    if how == "left":
        return _tile_join_points_left(
            pts, index, lon, lat, geom_col, join_keys, broadcast_index,
            out_cols=list(points.columns),
        )
    if how != "inner":
        raise ValueError(f"unsupported how={how!r}")

    rhs = F.broadcast(index) if broadcast_index else index
    cand = pts.join(rhs, on=join_keys, how="inner")
    # Interior-cell candidates are PROVEN matches (the whole cell lies
    # inside the polygon) — only boundary-cell rows need the bbox
    # prefilter + exact PIP.
    bbox_ok = (
        (F.col(lon) >= F.col("minx"))
        & (F.col(lon) <= F.col("maxx"))
        & (F.col(lat) >= F.col("miny"))
        & (F.col(lat) <= F.col("maxy"))
    )
    if "segs" in index.columns:
        # JVM refine path (tile_index(refine="jvm")): exact PIP is a
        # flat unrolled Catalyst expression over the per-cell segment
        # subset — no Python anywhere on the probe stream, and
        # cell_full/bbox short-circuit before the segment terms run.
        maxk = _index_maxk(index)
        if maxk <= UNROLL_CAP:
            ref = st.pip_refine_expr(
                F.col(lon), F.col(lat),
                F.col("segs"), F.col("nring"), F.col("bpar"), maxk=maxk,
            )
        else:
            ref = st.pip_refine_agg_expr(
                F.col(lon), F.col(lat),
                F.col("segs"), F.col("nring"), F.col("bpar"),
            )
        return cand.filter(
            F.col("cell_full") | (bbox_ok & F.coalesce(ref, F.lit(False)))
        ).drop(
            "minx", "miny", "maxx", "maxy", "cell", "cell_full",
            "nring", "bpar", "segs", "_salt",
        )
    # Arrow refine path: the kernel receives NULL geometry for interior
    # rows, so the Python stage's decode+PIP work (and its geometry
    # bytes on the Arrow wire) scale with the polygon PERIMETER cells,
    # not the probe stream.
    refine = st.st_point_in_geom(
        F.col(lon), F.col(lat), F.when(~F.col("cell_full"), F.col(geom_col))
    )
    return cand.filter(
        F.col("cell_full") | (bbox_ok & F.coalesce(refine, F.lit(False)))
    ).drop("minx", "miny", "maxx", "maxy", "cell", "cell_full", geom_col, "_salt")


def _tile_join_points_left(
    pts: DataFrame,
    index: DataFrame,
    lon: str,
    lat: str,
    geom_col: str,
    join_keys: list[str],
    broadcast_index: bool,
    out_cols: list[str],
) -> DataFrame:
    """LEFT point-in-polygon tagging in ONE scan of the probe side.

    The index is pre-aggregated to one row per cell carrying its
    candidate polygons as an array of structs, so the probe side left-
    joins on the compact cell key only (never on payload columns like
    the page text, and never re-joined against itself), stays on its
    scan partitioning under a broadcast join, and each probe row decides
    its matches inline:

      candidates --[JVM: cell_full | bbox]--> near
      near_full  auto-accept; near_boundary -> array PIP (Arrow UDF)
      no accepted candidate -> single null-tagged row (left semantics)

    Points whose cell key is null (un-geocoded probes) pass through with
    null polygon columns, which is what lets plans/pipeline.geocode_pages
    run as a single left tile-join over the parsed pages."""
    cand_cols = [c for c in index.columns if c not in join_keys]
    idx_by_cell = index.groupBy(*join_keys).agg(
        F.collect_list(F.struct(*[F.col(c) for c in cand_cols])).alias("_cands")
    )
    rhs = F.broadcast(idx_by_cell) if broadcast_index else idx_by_cell
    j = pts.join(rhs, on=join_keys, how="left")

    elem_type = None
    for f in idx_by_cell.schema.fields:
        if f.name == "_cands":
            elem_type = f.dataType.elementType
    cands = F.coalesce(F.col("_cands"), F.array().cast(T.ArrayType(elem_type)))

    def bbox_ok(c):
        return (
            (F.col(lon) >= c["minx"])
            & (F.col(lon) <= c["maxx"])
            & (F.col(lat) >= c["miny"])
            & (F.col(lat) <= c["maxy"])
        )

    near = F.filter(cands, lambda c: c["cell_full"] | bbox_ok(c))
    full = F.filter(near, lambda c: c["cell_full"])
    bnd = F.filter(near, lambda c: ~c["cell_full"])
    if "segs" in index.columns:
        # JVM refine path: per-candidate exact PIP inline in the same
        # higher-order expression chain — no Arrow round-trip at all
        maxk = _index_maxk(index)

        def _pip(c):
            if maxk <= UNROLL_CAP:
                return st.pip_refine_expr(
                    F.col(lon), F.col(lat), c["segs"], c["nring"], c["bpar"],
                    maxk=maxk,
                )
            return st.pip_refine_agg_expr(
                F.col(lon), F.col(lat), c["segs"], c["nring"], c["bpar"]
            )

        acc_bnd = F.filter(
            bnd, lambda c: F.coalesce(_pip(c), F.lit(False))
        )
    else:
        mask = st.st_points_in_geoms(
            F.col(lon), F.col(lat), F.transform(bnd, lambda c: c[geom_col])
        )
        acc_bnd = F.transform(
            F.filter(
                F.zip_with(bnd, mask, lambda c, m: F.struct(c.alias("c"), m.alias("m"))),
                lambda z: F.coalesce(z["m"], F.lit(False)),
            ),
            lambda z: z["c"],
        )
    accepted = F.concat(full, acc_bnd)
    null_cand = F.lit(None).cast(elem_type)
    padded = F.when(F.size(accepted) > 0, accepted).otherwise(F.array(null_cand))

    keep = [c for c in out_cols if c not in ("_salt",)]
    meta = [
        c for c in cand_cols
        if c not in (
            geom_col, "minx", "miny", "maxx", "maxy", "cell_full",
            "nring", "bpar", "segs",
        )
    ]
    out = j.withColumn("_c", F.explode(padded))
    return out.select(
        *[F.col(c) for c in keep if c != "cell"],
        *[F.col("_c")[c].alias(c) for c in meta],
    )


# ---------------------------------------------------------------------------
# within-radius join (point-point distance join)
# ---------------------------------------------------------------------------


def radius_res(radius_m: float) -> int:
    """Finest resolution whose cell HEIGHT (latitude-independent meters)
    is >= radius; the longitude direction is handled per-row by
    neighbors_radius_expr."""
    for res in range(tiling.MAX_RES, -1, -1):
        if tiling.cell_deg(res) * 111_320.0 >= radius_m:
            return res
    return 0


def within_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    left_lon: str = "lon",
    left_lat: str = "lat",
    right_lon: str = "lon",
    right_lat: str = "lat",
    res: int | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """All (left, right) pairs within radius_m great-circle meters —
    reference `Dataset.within` (mundipy/dataset.py:164-177), but as a
    symmetric distance join instead of probe loops.

    Entirely JVM-side: cell assignment, ring-1 neighbor explode on the
    right, equi-join, haversine refinement — zero Python in the hot path.
    Shuffles both sides on cell unless broadcast_right.
    """
    if res is None:
        res = radius_res(radius_m)
    lcol = add_point_cell(left, left_lon, left_lat, res, out="_lcell")
    r = right
    if right_lon == left_lon:  # disambiguate columns on self-ish joins
        r = right.select(
            *[F.col(c).alias(f"r_{c}") for c in right.columns]
        )
        right_lon, right_lat = f"r_{right_lon}", f"r_{right_lat}"
    rcol = r.withColumn(
        "_lcell",
        F.explode(
            neighbors_radius_expr(
                st.cell_expr(F.col(right_lon), F.col(right_lat), res),
                res,
                radius_m,
                F.col(right_lat),
            )
        ),
    )
    rhs = F.broadcast(rcol) if broadcast_right else rcol
    dist = st.haversine_expr(
        F.col(left_lon), F.col(left_lat), F.col(right_lon), F.col(right_lat)
    )
    return (
        lcol.join(rhs, on="_lcell", how="inner")
        .withColumn("dist_m", dist)
        .filter(F.col("dist_m") <= radius_m)
        .drop("_lcell")
    )


def within_distance_geom_join(
    points: DataFrame,
    polys: DataFrame,
    radius_m: float,
    lon: str = "lon",
    lat: str = "lat",
    geom_col: str = "geometry",
    broadcast_index: bool = True,
    res: int | None = None,
    point_id: str | None = None,
) -> DataFrame:
    """All (point, polygon) pairs with point-to-geometry distance
    <= radius_m — the set-scale form of the reference's
    Dataset.within(radius, probe) against ARBITRARY geometry layers
    (mundipy/dataset.py:164-177), not just point layers.

    Shape: polygon cover cells at a resolution whose cell height covers
    the radius, expanded by the latitude-aware radius neighborhood
    (same guarantee as the point-point join: any point within R of a
    covered point shares a cell with the expanded cover); probe side is
    one JVM cell assignment; refine is the grouped Arrow distance
    kernel over candidates only. Output carries dist_m.

    point_id: compact probe key for the multi-cell candidate dedup.
    When omitted, a 64-bit content hash over the probe columns becomes
    the dedup key, so payload columns are hashed once map-side and never
    become shuffle-comparison keys themselves."""
    if res is None:
        res = radius_res(radius_m)
    idx = tile_index(polys, geom_col=geom_col, res=res, null_interior_geom=False)
    _, cminy, _, cmaxy = cell_bounds_exprs(F.col("cell"), res)
    center_lat = (cminy + cmaxy) / 2.0
    idx = (
        idx.withColumn(
            "cell",
            F.explode(
                neighbors_radius_expr(F.col("cell"), res, radius_m, center_lat)
            ),
        )
        .withColumn("_gid", F.xxhash64(F.col(geom_col)))
        .dropDuplicates(["cell", "_gid"])
    )
    pts = add_point_cell(points, lon, lat, res)
    drop_pid = False
    if point_id is None:
        # derive a compact probe key: one xxhash64 over all probe
        # columns, computed map-side BEFORE the dedup shuffle — distinct
        # probe rows keep distinct keys while payload columns stay out
        # of the comparison path
        point_id, drop_pid = "_pid", True
        pts = pts.withColumn("_pid", F.xxhash64(*[F.col(c) for c in points.columns]))
    rhs = F.broadcast(idx) if broadcast_index else idx
    cand = pts.join(rhs, "cell", "inner").dropDuplicates([point_id, "_gid"])
    d = st.st_point_geom_dist_m(F.col(lon), F.col(lat), F.col(geom_col))
    out = (
        cand.withColumn("dist_m", d)
        .filter(F.col("dist_m") <= radius_m)
        .drop("cell", "cell_full", "minx", "miny", "maxx", "maxy", geom_col, "_gid")
    )
    return out.drop("_pid") if drop_pid else out


# ---------------------------------------------------------------------------
# kNN join (expanding-ring, reference Dataset.nearest semantics)
# ---------------------------------------------------------------------------


def _knn_join_dense(
    probes: DataFrame,
    t: DataFrame,
    k: int,
    probe_lon: str,
    probe_lat: str,
    tie_break: list[str] | None,
) -> DataFrame:
    """kNN against a SMALL target set as a map-only plan: the targets
    become a literal array column; each probe row scores all of them
    with JVM haversine, array_sorts, and keeps the first k. Zero
    shuffles, zero Python — at 10^12 probes this is the plan you want
    (nearest-city tagging is embarrassingly parallel), vs the general
    cell-ring path which pays a window shuffle per resolution level."""
    fields = t.columns
    rows = t.collect()
    tie = [c for c in (tie_break or []) if c in fields]
    rest = [c for c in fields if c not in tie]

    def lit_struct(row):
        return F.struct(*[F.lit(row[f]).alias(f) for f in fields])

    arr = F.array(*[lit_struct(r) for r in rows])

    def scored(tcol):
        dist = st.haversine_expr(
            F.col(probe_lon), F.col(probe_lat), tcol["t_lon"], tcol["t_lat"]
        )
        # field order IS the sort order: dist, then tie-break columns
        return F.struct(
            dist.alias("dist_m"),
            *[tcol[c].alias(c) for c in tie],
            *[tcol[c].alias(c) for c in rest],
        )

    top = F.slice(F.array_sort(F.transform(arr, scored)), 1, k)
    out = probes.withColumn("_nn", F.explode(top))
    return out.select(
        *probes.columns,
        *[F.col(f"_nn.{c}").alias(c) for c in fields],
        F.col("_nn.dist_m").alias("dist_m"),
    )


def knn_join(
    probes: DataFrame,
    targets: DataFrame,
    k: int = 1,
    probe_id: str = "doc_id",
    probe_lon: str = "lon",
    probe_lat: str = "lat",
    target_lon: str = "lon",
    target_lat: str = "lat",
    start_res: int = 7,
    min_res: int = 1,
    broadcast_targets: bool = True,
    tie_break: list[str] | None = None,
    dense_threshold: int = 256,
) -> DataFrame:
    """k-nearest-neighbor join by expanding cells, mirroring the
    reference's expanding-bbox nearest (mundipy/dataset.py:179-206:
    buffers 1e3..1e8 then full scan; returns none on empty layer).

    Strategy: at each resolution (start_res, start_res-2, ...) targets
    explode to their ring-1 neighborhood and equi-join the unmatched
    probes; probes that collected >= k candidates resolve by a window
    top-k on haversine; the rest escalate to the coarser level. A final
    residual broadcast cross-join catches probes in empty regions (the
    reference's full-scan fallback, dataset.py:201-206).

    Ring-boundary correctness (the subtlety the reference's coarse bbox
    shares — SURVEY §7.5.4): ring-1 candidates are only complete out to
    one cell extent in EACH axis, and the longitudinal extent in meters
    shrinks by cos(lat). A match is therefore ACCEPTED only when its
    distance <= cell_deg * 111320 * min(1, cos(|lat|+cell_deg)) — the
    per-row radius ring-1 provably covers; anything farther re-competes
    at the next (coarser) level, and the residual broadcast fallback is
    exhaustive.

    tie_break: target column names ordering equidistant matches
    deterministically (dist_m, then these, ascending).
    """
    t = targets.select(
        F.col(target_lon).alias("t_lon"), F.col(target_lat).alias("t_lat"),
        *[F.col(c).alias(f"t_{c}") for c in targets.columns if c not in (target_lon, target_lat)],
    )
    if dense_threshold > 0 and t.limit(dense_threshold + 1).count() <= dense_threshold:
        return _knn_join_dense(probes, t, k, probe_lon, probe_lat, tie_break)
    unmatched = probes
    results = None
    res = start_res
    while res >= min_res:
        exploded = t.withColumn(
            "_cell",
            F.explode(
                neighbors_expr(st.cell_expr(F.col("t_lon"), F.col("t_lat"), res), res, k=1)
            ),
        )
        rhs = F.broadcast(exploded) if broadcast_targets else exploded
        p = add_point_cell(unmatched, probe_lon, probe_lat, res, out="_cell")
        cand = p.join(rhs, on="_cell", how="left")
        dist = st.haversine_expr(
            F.col(probe_lon), F.col(probe_lat), F.col("t_lon"), F.col("t_lat")
        )
        # per-row guarantee radius: ring-1 is complete out to one cell
        # extent in each axis; the lon axis shrinks by cos(lat)
        wdeg = tiling.cell_deg(res)
        eff_lat = F.least(F.abs(F.col(probe_lat)) + F.lit(wdeg), F.lit(89.9))
        guarantee_m = (
            F.lit(wdeg * 111_320.0 * 0.999)
            * F.least(F.lit(1.0), F.cos(F.radians(eff_lat)))
        )
        cand = cand.withColumn("dist_m", dist)
        order = [F.col("dist_m").asc_nulls_last()] + [
            F.col(c).asc() for c in (tie_break or [])
        ]
        w = W.partitionBy(probe_id).orderBy(*order)
        ranked = cand.withColumn("_rn", F.row_number().over(w))
        got = ranked.filter(
            (F.col("_rn") <= k) & F.col("dist_m").isNotNull() & (F.col("dist_m") <= guarantee_m)
        )
        # a probe is settled only if its k-th candidate is inside the
        # guarantee radius
        settled_ids = (
            got.groupBy(probe_id).count().filter(F.col("count") >= k).select(probe_id)
        )
        settled = got.join(settled_ids, probe_id, "inner").drop("_rn", "_cell")
        results = settled if results is None else results.unionByName(settled)
        unmatched = unmatched.join(settled_ids, probe_id, "left_anti")
        res -= 2
    # residual full cross-join (small by construction)
    w = W.partitionBy(probe_id).orderBy(
        F.col("dist_m").asc(), *[F.col(c).asc() for c in (tie_break or [])]
    )
    residual = (
        unmatched.join(F.broadcast(t), how="cross")
        .withColumn(
            "dist_m",
            st.haversine_expr(
                F.col(probe_lon), F.col(probe_lat), F.col("t_lon"), F.col("t_lat")
            ),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    return results.unionByName(residual) if results is not None else residual


# ---------------------------------------------------------------------------
# overlap-weighted aggregation join (catchment-style, reference J5)
# ---------------------------------------------------------------------------


def overlap_weighted_join(
    zones: DataFrame,
    regions: DataFrame,
    weight_col: str,
    zone_geom: str = "geometry",
    region_geom: str = "geometry",
    zone_id: str = "zone_id",
    res: int = DEFAULT_RES,
    planar: bool = True,
) -> DataFrame:
    """For each zone, sum region weights scaled by the overlapped
    fraction of each region: sum(w * |zone∩region| / |region|)
    (reference docs/tutorials/catchment-area.mdx:152-160).

    planar=True computes both areas in coordinate space — a RATIO needs
    numerator and denominator in one space, and mixing the pairwise
    local-PCS of the intersection with the region's own PCS would skew
    it; planar=False keeps the old meters-based behavior."""
    ia_fn = st.st_intersection_area_planar if planar else st.st_intersection_area
    ra_fn = st.st_area_planar if planar else st.st_area
    zidx = tile_index(
        zones, geom_col=zone_geom, res=res, null_interior_geom=False
    ).withColumnRenamed(zone_geom, "_zgeom")
    # region area + compact id computed BEFORE the tile explode: once
    # per region, not once per (zone, region) candidate pair — the area
    # kernel is Python work, and pairs outnumber regions by the average
    # overlap fan-out. (The compact _rid keys the dedup shuffle; keying
    # on the full WKB payload would hash-compare megabyte keys at scale.)
    regs = regions.select(
        F.col(region_geom),
        F.col(weight_col).alias("_w"),
        ra_fn(F.col(region_geom)).alias("_ra"),
        F.xxhash64(F.col(region_geom)).alias("_rid"),
    )
    ridx = tile_index(
        regs, geom_col=region_geom, res=res, null_interior_geom=False
    ).select(
        F.col("cell"), F.col(region_geom).alias("_rgeom"), "_rid", "_w", "_ra"
    )
    cand = (
        zidx.join(ridx, "cell")
        .dropDuplicates([zone_id, "_rid"])
        .withColumn("_ia", ia_fn(F.col("_zgeom"), F.col("_rgeom")))
        .filter(F.col("_ia") > 0)
    )
    return cand.groupBy(zone_id).agg(
        F.sum(F.col("_w") * F.col("_ia") / F.col("_ra")).alias("weighted_" + weight_col)
    )
