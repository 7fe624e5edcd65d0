"""mundipy_spark — a PySpark-native spatial-join + tiling analytics engine.

A brand-new reimplementation of the capabilities of BuntingLabs/mundipy
(reference at /root/reference) designed Spark-first:

- geometry is a ``BinaryType`` WKB column; properties are ordinary typed
  columns riding along (mundipy's property-propagation semantics,
  reference geometry.py:264, fall out of the DataFrame model for free);
- every geometric kernel (codec, point-in-polygon, distance, buffer,
  projection, tiling) is from-scratch vectorized numpy inside Arrow
  pandas UDFs — never per-row Python;
- spatial predicates are *compiled* to tile-cell equi-joins + exact
  refinement so Catalyst plans them like any relational join (broadcast,
  AQE, skew handling all apply);
- the web-scale pipeline (geoparse -> tile -> join) runs over a
  Common-Crawl-style pages table and writes per-partition lineage to a
  checkpoint table for mid-job resume.

Public API parity layer: :class:`mundipy_spark.dataset.Dataset`,
:class:`mundipy_spark.map.Map`, :class:`mundipy_spark.mundi.Mundi`
(reference mundipy/dataset.py, mundipy/map.py, mundipy/mundi.py).
"""

__version__ = "0.1.0"

from mundipy_spark.session import get_spark  # noqa: F401
