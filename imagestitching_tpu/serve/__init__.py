"""Serving: batched multi-job stitch queue."""
