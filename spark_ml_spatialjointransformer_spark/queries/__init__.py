"""The engine's query registry as a package: one module per query
family (split r11 from the former 15k-line single module), all
re-exported here so ``from ...queries import <anything>`` keeps
working for tests, bench, and the driver contract.  Importing the
package imports every family module, which registers every query
into the shared ``QUERIES`` dict in ``_core``."""

from spark_ml_spatialjointransformer_spark.queries import _core
from spark_ml_spatialjointransformer_spark.queries import analytics
from spark_ml_spatialjointransformer_spark.queries import temporal
from spark_ml_spatialjointransformer_spark.queries import streams
from spark_ml_spatialjointransformer_spark.queries import graph
from spark_ml_spatialjointransformer_spark.queries import media
from spark_ml_spatialjointransformer_spark.queries import pipeline
from spark_ml_spatialjointransformer_spark.queries import spatial
from spark_ml_spatialjointransformer_spark.queries import text
from spark_ml_spatialjointransformer_spark.queries import vectors

_mods = (_core, analytics, temporal, streams, graph, media, pipeline, spatial, text, vectors)
for _m in _mods:
    globals().update(
        {k: v for k, v in vars(_m).items() if not k.startswith('__')}
    )
del _m, _mods



QUERIES = {n: QUERIES[n] for n in _driver_rotation_order(list(QUERIES))}
