from libgrape_lite_spark.streaming.sampler import (
    khop_sample,
    make_batch_processor,
    stream_khop_sampler,
)

__all__ = ["khop_sample", "make_batch_processor", "stream_khop_sampler"]
