"""fdi_flow_spark — a PySpark-native analytics engine with the capabilities of
AlexeyMarg/fdi_flow (fault detection & isolation on time series), re-expressed
Spark-first for 100 TB scale.

Canonical data contract: long-format time series
``(series_id STRING, ts LONG, value DOUBLE)`` — every per-series operator
partitions by ``series_id`` and orders by ``ts`` (Spark has no implicit row
order, so ordering is always explicit).

Layout:
    core/        session helper, long/wide adapters, row-index assignment
    sources/     testdata loaders (parquet/CSV), events->series derivation
    operators/   filters, scalers, segmenters (DataFrame -> DataFrame fns)
    models/      dynamic-system simulation + seeded data generation
    observers/   Luenberger / Kalman / sliding-mode batch replay
    ml/          fault-detector Pipelines (MLlib) + hyperparameter search
    forecasting/ supervised windowing + distributed prep (trainer gated)
    pipelines/   LLM-data-pipeline ops: dedup, similarity, text, multimodal,
                 corpus curation (split/quota/PII/packing)
    streaming/   Structured Streaming variants (stateful observers, windows)
    compat       drop-in reference class API (ExponentialSmoothing(...).apply)
"""

__version__ = "0.1.0"
