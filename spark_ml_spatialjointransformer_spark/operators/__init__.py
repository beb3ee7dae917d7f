from spark_ml_spatialjointransformer_spark.operators.spatial_join import spatial_join

__all__ = ["spatial_join"]
