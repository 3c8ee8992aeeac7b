"""Multimodal column plumbing: opaque binary payloads + typed metadata."""

from flight_radar_pipeline_spark.multimodal.binary import (
    FEATURE_SCHEMA,
    attach_payload,
    decode_features,
    decode_image_stub,
)

__all__ = ["attach_payload", "decode_features", "decode_image_stub", "FEATURE_SCHEMA"]
