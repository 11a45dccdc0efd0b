from epss_spark.streaming.scores_stream import daily_change_counts, stream_scores

__all__ = ["stream_scores", "daily_change_counts"]
