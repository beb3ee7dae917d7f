"""spark_ml_spatialjointransformer_spark — a PySpark-native spatial-join analytics engine.

A from-scratch, DataFrame-first re-expression of the capabilities of the
reference `vasnake/spark.ml.SpatialJoinTransformer` (a Scala Spark-ML
broadcast spatial join transformer), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing, streaming).

Design stance (see SURVEY.md §7): everything compiles to a single Spark
DataFrame expression tree so Catalyst performs pruning/pushdown; geometry
kernels are vectorized numpy inside Arrow pandas_udfs; the hot point-point
paths stay entirely JVM-side (whole-stage codegen).
"""

from spark_ml_spatialjointransformer_spark.transformer import BroadcastSpatialJoin
from spark_ml_spatialjointransformer_spark.operators.spatial_join import spatial_join

__version__ = "0.1.0"

__all__ = ["BroadcastSpatialJoin", "spatial_join", "__version__"]
