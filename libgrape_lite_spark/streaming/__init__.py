from libgrape_lite_spark.streaming.sampler import khop_sample, stream_khop_sampler

__all__ = ["khop_sample", "stream_khop_sampler"]
