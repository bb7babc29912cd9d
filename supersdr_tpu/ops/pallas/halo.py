"""Pallas remote-DMA halo exchange over ICI.

The latency-optimized alternative to `lax.ppermute` for the overlap-save
boundary exchange (ops/scans.left_halo): each device pushes its block tail
directly into the right neighbor's receive buffer with
`make_async_remote_copy`, synchronized by a neighbor barrier — one RDMA
hop, no XLA collective scheduling, fusable into larger kernels
(SURVEY.md §2a / §5 halo-exchange requirement).

Usable inside `shard_map` over a 1-D named axis; shard 0 receives zeros
(stream start), matching `left_halo` semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(tail_ref, out_ref, send_sem, recv_sem, *, axis_name: str):
    my_id = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)
    right = jax.lax.rem(my_id + 1, n_dev)

    # neighbor barrier: ensure the right neighbor's out_ref is ready
    barrier = pltpu.get_barrier_semaphore()
    left = jax.lax.rem(my_id - 1 + n_dev, n_dev)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    rdma = pltpu.make_async_remote_copy(
        src_ref=tail_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


@partial(jax.jit, static_argnames=("n", "axis_name", "interpret"))
def left_halo_rdma(x: jax.Array, n: int, axis_name: str,
                   interpret: bool = False) -> jax.Array:
    """Inside shard_map: the last `n` samples of the left neighbor's block
    (shard 0 → zeros). x: [..., local_n] float32/complex64 planes must be
    float — pass .real/.imag separately for complex."""
    tail = x[..., -n:]
    flat = tail.reshape(-1, tail.shape[-1])
    recv = pl.pallas_call(
        partial(_halo_kernel, axis_name=axis_name),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=7),
        interpret=interpret,
    )(flat)
    recv = recv.reshape(tail.shape)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, jnp.zeros_like(recv), recv)
