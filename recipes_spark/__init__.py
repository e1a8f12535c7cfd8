"""recipes_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of IAOCEA/recipes (reference read-only at
/root/reference), re-expressed Spark-first.

Design stance (SURVEY.md §7): everything is a DataFrame; the catalog is
partitioned Parquet; Python touches data only inside mapInPandas islands
(NetCDF metadata decode, geometry simplify, surrogate re-encode); zero
custom Catalyst rules — declarative plans let Catalyst do pushdown,
pruning, join selection and AQE.
"""

__version__ = "0.1.0"
