"""Assembles the full declared-query registry.

Importing this module imports every operator module, which registers
its queries/oracles via the ``@query`` decorator into
``impala_refresher_spark.registry``.
"""

from __future__ import annotations

import importlib

from impala_refresher_spark.registry import ORACLES, QUERIES

_OPERATOR_MODULES = [
    "impala_refresher_spark.operators.relational",
    "impala_refresher_spark.operators.refresh",
    "impala_refresher_spark.operators.windows",
    "impala_refresher_spark.operators.udfs",
    "impala_refresher_spark.operators.text",
    "impala_refresher_spark.operators.dedup",
    "impala_refresher_spark.operators.similarity",
    "impala_refresher_spark.operators.multimodal",
    "impala_refresher_spark.operators.asof",
    "impala_refresher_spark.operators.pipeline",
    "impala_refresher_spark.operators.rollup_hypertable",
    "impala_refresher_spark.operators.analytics",
    "impala_refresher_spark.functions.scalar",
    "impala_refresher_spark.sources.sinks",
    "impala_refresher_spark.streaming.windows",
]


def _load() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


_load()

__all__ = ["QUERIES", "ORACLES"]
