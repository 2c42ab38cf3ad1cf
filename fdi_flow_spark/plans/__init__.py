from fdi_flow_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
