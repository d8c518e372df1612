"""Serving subsystem: production micro-batching inference service.

No reference counterpart (the reference's closest surface is the
single-stream demo app, /root/reference/demo/demo_loftr.py) — this is new
scope for production deployment: a thread-safe service that accepts
image-pair match requests, groups them into static-shape batches per
resolution bucket (XLA compiles once per (bucket, batch-size) rung), and
pipelines host->device dispatch against device compute.
"""
from loftr_tpu.serve.service import (MatchingService, ServiceStats,
                                     pick_bucket, preprocess_to_bucket)

__all__ = ["MatchingService", "ServiceStats", "pick_bucket",
           "preprocess_to_bucket"]
