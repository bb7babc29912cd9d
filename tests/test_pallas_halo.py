"""Remote-DMA halo exchange kernel, interpret mode on the 8-device CPU
mesh (compiled ICI path requires multi-chip hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from supersdr_tpu.ops import scans


def test_rdma_halo_matches_ppermute():
    from supersdr_tpu.ops.pallas import halo

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ("t",))
    n_local = 64
    x = np.arange(len(devs) * n_local, dtype=np.float32)

    def body_ref(xl):
        return scans.left_halo(xl, 16, "t")

    def body_rdma(xl):
        return halo.left_halo_rdma(xl, 16, "t", interpret=True)

    ref = jax.jit(jax.shard_map(body_ref, mesh=mesh, in_specs=P("t"),
                                out_specs=P("t"), check_vma=False))(
        jnp.asarray(x))
    try:
        got = jax.jit(jax.shard_map(body_rdma, mesh=mesh, in_specs=P("t"),
                                    out_specs=P("t"), check_vma=False))(
            jnp.asarray(x))
    except Exception as e:  # interpret-mode RDMA support varies by version
        pytest.skip(f"pallas interpret-mode RDMA unavailable: {e}")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
