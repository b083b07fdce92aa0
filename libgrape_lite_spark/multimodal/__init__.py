from libgrape_lite_spark.multimodal.binary_ops import (
    attach_binary_payload,
    decode_image_stub,
    extract_features,
    frame_sample,
)

__all__ = [
    "attach_binary_payload",
    "decode_image_stub",
    "extract_features",
    "frame_sample",
]
