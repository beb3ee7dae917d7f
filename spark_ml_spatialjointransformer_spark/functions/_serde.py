"""UDF portability: serialize this package's kernel modules by value.

PySpark pickles module-level functions by reference; executors that don't
have this package on their PYTHONPATH (interactive sessions, notebooks,
spark-submit without --py-files) would fail with ModuleNotFoundError inside
every pandas_udf.  cloudpickle's ``register_pickle_by_value`` embeds the
kernel code in the serialized closure instead (a few KB per task — noise),
so the engine works anywhere the *driver* can import it.
"""

from __future__ import annotations

_registered = False


def ensure_udf_portability() -> None:
    global _registered
    if _registered:
        return
    try:
        from pyspark import cloudpickle

        from spark_ml_spatialjointransformer_spark.functions import (
            geodesic,
            geometry,
            hashing,
        )
        from spark_ml_spatialjointransformer_spark.operators import (
            bloom,
            dedup,
            fingerprint,
            multimodal,
            similarity,
        )
        from spark_ml_spatialjointransformer_spark.streaming import windowed
        from spark_ml_spatialjointransformer_spark import toolbox

        for mod in (geodesic, geometry, hashing, toolbox,
                    bloom, dedup, fingerprint, multimodal, similarity,
                    windowed):
            cloudpickle.register_pickle_by_value(mod)
        _registered = True
    except Exception:
        # best-effort: falls back to by-reference pickling (package must then
        # be importable on executors, like any PySpark library)
        _registered = True
