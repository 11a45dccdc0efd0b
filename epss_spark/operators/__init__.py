from epss_spark.operators.quantize import changed_scores, quantize
from epss_spark.operators.asof import asof_join

__all__ = ["changed_scores", "quantize", "asof_join"]
