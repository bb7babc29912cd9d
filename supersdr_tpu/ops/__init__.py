"""Pure-function DSP kernels (JAX). Every function here is jit-safe:
static shapes, no Python control flow on traced values, carries threaded
explicitly so chains compose under `lax.scan`/`shard_map`."""
