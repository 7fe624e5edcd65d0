"""From-scratch vectorized geometry kernels (numpy only — no GEOS/PROJ/GDAL).

The sandbox (and the design brief) forbid shapely/pyproj/fiona; every
kernel here operates on numpy coordinate arrays and is invoked from Arrow
pandas UDFs so vertex-level work is vectorized even when the per-geometry
dispatch is Python. Point columns get fully-vectorized fast paths (the
hot side of the web-scale join is always points).
"""
