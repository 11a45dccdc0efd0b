from epss_spark.plans.query import Query, compile_predicate

__all__ = ["Query", "compile_predicate"]
