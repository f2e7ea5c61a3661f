from kinesis_s3_spark.multimodal.codecs import (
    IMAGE_META_SCHEMA,
    decode_image_batches,
    fake_decode_dims,
)

__all__ = ["IMAGE_META_SCHEMA", "decode_image_batches", "fake_decode_dims"]
