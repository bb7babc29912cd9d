"""NCO / complex mixer with drift-free streaming phase.

The tuned frequency is data, not structure: retuning updates a small
parameter pytree (a per-block phase ramp precomputed host-side in float64,
wrapped mod 1) without retracing. Phase is carried across blocks as a
fraction-of-cycle scalar in [0,1), so float32 on device never sees large
phase magnitudes — no accumulated roundoff at long stream lengths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NCOParams(NamedTuple):
    """Host-precomputed tuning for one block size (a pytree — jit-safe).

    ramp:       [block] float32, (n * f_cycles_per_sample) mod 1
    block_inc:  scalar float32, (block * f) mod 1 — per-step phase advance
    """
    ramp: jax.Array
    block_inc: jax.Array

    @staticmethod
    def make(freq_hz, fs: float, block: int) -> "NCOParams":
        """freq_hz may be a scalar or an array [*batch] of per-channel
        frequencies; ramp broadcasts to [*batch, block]."""
        f = np.asarray(freq_hz, np.float64) / np.float64(fs)  # cycles/sample
        n = np.arange(block, dtype=np.float64)
        ramp = np.mod(f[..., None] * n, 1.0)
        inc = np.mod(np.float64(block) * f, 1.0)
        return NCOParams(ramp=jnp.asarray(ramp, jnp.float32),
                         block_inc=jnp.asarray(inc, jnp.float32))


def init_phase(batch_shape: tuple[int, ...] = ()) -> jax.Array:
    return jnp.zeros(batch_shape, jnp.float32)


def mix(params: NCOParams, phase: jax.Array, x: jax.Array
        ) -> tuple[jax.Array, jax.Array]:
    """Multiply x by exp(+j*2π*(phase + ramp)); returns (new_phase, y).

    To shift a signal at +f down to baseband pass freq_hz=-f when building
    the params (y = x · e^{-j2πft}).
    """
    ph = jnp.mod(phase[..., None] + params.ramp, 1.0)
    osc = jnp.exp((2j * jnp.pi) * ph.astype(jnp.float32)).astype(jnp.complex64)
    new_phase = jnp.mod(phase + params.block_inc, 1.0)
    return new_phase, x * osc
