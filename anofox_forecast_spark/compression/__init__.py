from anofox_forecast_spark.compression.gorilla import (
    compress_chunks,
    decode_timestamps,
    decode_values,
    decompress_chunks,
    encode_timestamps,
    encode_values,
)

__all__ = [
    "compress_chunks",
    "decompress_chunks",
    "encode_timestamps",
    "decode_timestamps",
    "encode_values",
    "decode_values",
]
