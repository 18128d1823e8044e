"""Device compute engines: XLA reference path and fused Pallas kernels."""
