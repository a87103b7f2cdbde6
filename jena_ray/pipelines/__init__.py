"""End-to-end pipelines (library-level; no ray.init here)."""
