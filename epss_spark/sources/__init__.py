from epss_spark.sources.readers import read_any, read_snapshots

__all__ = ["read_any", "read_snapshots"]
