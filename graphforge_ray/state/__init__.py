"""Checkpoint / lineage manifests and resume logic (driver-side)."""
