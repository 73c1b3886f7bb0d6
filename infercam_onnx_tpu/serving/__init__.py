"""Serving tier: TCP ingest, demand-driven routing, micro-batched
inference, HTTP MJPEG endpoints."""
