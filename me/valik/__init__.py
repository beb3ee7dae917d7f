# -*- coding: utf-8 -*-
# Drop-in re-export matching reference me/valik/__init__.py:3 —
# `from me.valik import BroadcastSpatialJoin` is the import the
# reference's own pytest uses (test_broadcast_spatial_join.py:9).

from .spark.transformer import BroadcastSpatialJoin

__all__ = ["BroadcastSpatialJoin"]
