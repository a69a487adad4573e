"""Pure-JAX device ops: jittable, vmappable, shardable building blocks."""
