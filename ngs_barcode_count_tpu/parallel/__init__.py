"""Multi-chip / multi-host parallelism over a jax.sharding.Mesh."""
