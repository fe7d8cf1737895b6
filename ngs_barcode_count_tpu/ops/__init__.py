"""Device-side decode ops (JAX/XLA + Pallas kernels)."""
