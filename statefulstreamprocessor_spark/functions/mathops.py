"""Derived-record math from the reference join functions.

* power derivation ``result = (2π/60)·speed·torque`` with the output
  timestamp at the partners' midpoint (reference
  ``ts_join_with_kafka_eos.py:86-89``, ``tester.py:24-26``);
* the Flink comparator variant adds ``abs`` + clamp at 20000 and the
  5-band level (``StreamJoiner.java:146-169``) — see
  ``operators.windows.power_level``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["power_result", "midpoint_ts", "POWER_FACTOR"]

POWER_FACTOR = 2 * math.pi / 60


def power_result(speed: Column, torque: Column) -> Column:
    return F.lit(POWER_FACTOR) * speed * torque


def midpoint_ts(t_left: Column, t_right: Column) -> Column:
    return (t_left.cast("double") + t_right.cast("double")) / F.lit(2.0)
