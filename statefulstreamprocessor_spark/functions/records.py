"""Record shaping: wide→narrow unpivot, series keys, side routing.

Covers the reference's producer-side record plumbing:
* unpivot of wide multi-quantity JSON objects into one narrow record per
  quantity (reference ``01_Simulator/simulatorToKafka.py:51-66``,
  ``03_Stream_Connector/stream_connector.py:38-57``);
* Kafka-style series key ``"{thing}.{quantity}"``
  (``simulatorToKafka.py:66``);
* left/right routing by quantity (``ts_join_with_kafka_eos.py:159-164``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["unpivot_wide", "make_series_key", "route_side", "machine_code"]


def machine_code(quantity: Column) -> Column:
    """Last-3-chars machine group, e.g. 'actSpeed_C11' → 'C11'
    (reference StreamJoiner.java:217-221)."""
    return F.substring(quantity, -3, 3)


def substring_prefilter(raw: Column, needles: list[str]) -> Column:
    """Cheap substring pre-filter applied to raw lines before JSON parsing
    (reference simulator.py:31, test_kafka_eos_joiner.py:149). Catalyst
    won't invent this reordering across from_json, so it stays explicit."""
    cond = F.contains(raw, F.lit(needles[0]))
    for n in needles[1:]:
        cond = cond | F.contains(raw, F.lit(n))
    return cond


def unpivot_wide(
    df: DataFrame,
    id_cols: list[str],
    quantity_cols: list[str],
    quantity_name: str = "quantity",
    value_name: str = "result",
) -> DataFrame:
    """Wide row with one column per quantity → one narrow row per quantity.

    Null quantities are dropped, matching the reference's key-presence
    iteration (``stream_connector.py:41``: quantity set = payload keys minus
    metadata keys — absent keys simply produce no record).
    """
    out = df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in quantity_cols],
        quantity_name,
        value_name,
    )
    return out.filter(F.col(value_name).isNotNull())


def make_series_key(thing: Column, quantity: Column) -> Column:
    """Per-series partition key ``thing.quantity`` (simulatorToKafka.py:66) —
    the unit of ordering and of shuffle partitioning."""
    return F.concat_ws(".", thing, quantity)


def route_side(quantity: Column, left_quantity: str, right_quantity: str) -> Column:
    """'r' / 's' / null side tag by quantity name
    (ts_join_with_kafka_eos.py:159-164)."""
    return (
        F.when(quantity == F.lit(left_quantity), F.lit("r"))
        .when(quantity == F.lit(right_quantity), F.lit("s"))
        .otherwise(F.lit(None))
    )
