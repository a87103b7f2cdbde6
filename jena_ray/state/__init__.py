"""Lineage manifests and checkpoint/resume state."""
