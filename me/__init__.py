# -*- coding: utf-8 -*-
# Drop-in compatibility namespace for users of the reference library
# (vasnake/spark.ml.SpatialJoinTransformer): mirrors the import paths of
# reference src/main/python/me/__init__.py so existing code keeps working.
