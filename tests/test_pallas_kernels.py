"""Pallas kernels in interpreter mode on CPU (compiled-mode parity runs on
the real chip via bench/profiling)."""

import numpy as np
import jax.numpy as jnp
import pytest

from supersdr_tpu.ops import channelizer
from supersdr_tpu.ops.pallas import pfb_fold


def test_pfb_fold_matches_xla_gather(rng):
    M, K = 128, 8
    plan, proto = channelizer.design(M, K)
    W = channelizer.taps_matrix(plan, proto)
    G = pfb_fold.fold_taps(plan, proto)
    n = M * 512
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    carry = channelizer.init_carry(plan)

    _, ref = channelizer.channelize(plan, W, carry, jnp.asarray(x))
    carry2, got = pfb_fold.channelize_pallas(plan, G, carry, jnp.asarray(x),
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert carry2.shape == (plan.history,)


def test_pfb_fold_streaming_carry(rng):
    M, K = 128, 4
    plan, proto = channelizer.design(M, K)
    G = pfb_fold.fold_taps(plan, proto)
    n = M * 512
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    carry = channelizer.init_carry(plan)
    _, full = pfb_fold.channelize_pallas(plan, G, carry, jnp.asarray(x),
                                         interpret=True)
    carry = channelizer.init_carry(plan)
    carry, p1 = pfb_fold.channelize_pallas(plan, G, carry,
                                           jnp.asarray(x[: n // 2]),
                                           interpret=True)
    _, p2 = pfb_fold.channelize_pallas(plan, G, carry,
                                       jnp.asarray(x[n // 2:]),
                                       interpret=True)
    got = np.concatenate([np.asarray(p1), np.asarray(p2)], axis=-1)
    np.testing.assert_allclose(got, np.asarray(full), atol=1e-4)
