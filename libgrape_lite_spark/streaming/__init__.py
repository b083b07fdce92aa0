from libgrape_lite_spark.streaming.sampler import (
    kafka_edge_stream,
    khop_sample,
    make_batch_processor,
    parse_sampler_messages,
    stream_khop_sampler,
)

__all__ = [
    "kafka_edge_stream",
    "khop_sample",
    "make_batch_processor",
    "parse_sampler_messages",
    "stream_khop_sampler",
]
