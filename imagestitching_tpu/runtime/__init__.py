"""Runtime: logging, tiling, pipelines, caches, metrics."""
