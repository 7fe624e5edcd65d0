"""DataFrame-level operators: spatial joins, dedup, similarity, text stats.

Each operator is a function DataFrame(s) -> DataFrame that composes
built-in Spark ops plus the kernels' Arrow UDFs; none of them collect to
the driver, and each documents its shuffle/broadcast behavior for the
100 TB plan.
"""
