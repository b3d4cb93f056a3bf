from etl_caic_spark.functions.ordinal import SEVERITY_ORDER, severity_rank

__all__ = ["SEVERITY_ORDER", "severity_rank"]
