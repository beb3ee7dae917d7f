# -*- coding: utf-8 -*-
"""Drop-in import-path shim for the reference library.

Reference users import the transformer as
``from me.valik.spark.transformer import BroadcastSpatialJoin``
(reference src/main/python/me/valik/spark/transformer.py:15) or
``from me.valik import BroadcastSpatialJoin``
(reference test_broadcast_spatial_join.py:9).  This module aliases both
paths onto the native pure-PySpark implementation — same 12-string-param
surface, no py4j JVM object behind it.
"""

from spark_ml_spatialjointransformer_spark.transformer import (
    BroadcastSpatialJoin,
)

__all__ = ["BroadcastSpatialJoin"]
