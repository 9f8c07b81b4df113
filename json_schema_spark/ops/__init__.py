"""Operational layer: partition-granular checkpoint/resume with lineage
manifests, and streaming validation."""
