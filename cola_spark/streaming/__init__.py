from cola_spark.streaming.stream_scheduler import (
    rate_metrics_stream,
    streaming_frontier,
    token_bucket_gate,
)

__all__ = ["streaming_frontier", "token_bucket_gate", "rate_metrics_stream"]
