"""Pallas kernel: polyphase filterbank fold.

The XLA path in `ops.channelizer` materializes overlapping frames
`[n_frames, K·M]` via gather — K× the input in HBM traffic (K taps/branch,
typically 8). This kernel streams the input through VMEM once: with
critical sampling (hop = M) the fold is

    rows[j, r]  = seg[j·M + r]                       (seg reshaped, no copy)
    fold[t, r]  = Σ_k G[k, r] · rows[t + k, r]

a K-tap depthwise convolution down the rows axis — each input row is read
once per grid tile instead of K times from HBM, the K-step accumulation
runs on the VPU in registers.

Complex input is carried as two float32 planes (Mosaic has no complex
vectors); the prototype taps are real so the planes fold independently.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supersdr_tpu.ops import channelizer, cx


def _round_up8(n: int) -> int:
    return (n + 7) & ~7


def _fold_kernel(g_ref, re_ref, im_ref, out_re, out_im, scr_re, scr_im,
                 sems, *, K: int, tile_t: int, win: int):
    """re_ref/im_ref: [padded_frames, M] planes in HBM/ANY; each plane's
    overlapping window (`win` rows, 8-aligned for DMA) is DMA'd into VMEM
    scratch once, then the K-tap fold accumulates on the VPU."""
    i = pl.program_id(0)
    d_re = pltpu.make_async_copy(re_ref.at[pl.ds(i * tile_t, win), :],
                                 scr_re, sems.at[0])
    d_im = pltpu.make_async_copy(im_ref.at[pl.ds(i * tile_t, win), :],
                                 scr_im, sems.at[1])
    d_re.start()
    d_im.start()
    d_re.wait()
    d_im.wait()
    acc_re = g_ref[0][None, :] * scr_re[0:tile_t, :]
    acc_im = g_ref[0][None, :] * scr_im[0:tile_t, :]
    for k in range(1, K):
        acc_re = acc_re + g_ref[k][None, :] * scr_re[k: k + tile_t, :]
        acc_im = acc_im + g_ref[k][None, :] * scr_im[k: k + tile_t, :]
    out_re[:, :] = acc_re
    out_im[:, :] = acc_im


def pfb_fold_c(plan: channelizer.PFBPlan, G: jax.Array, carry: jax.Array,
               x: jax.Array, tile_t: int = 256,
               interpret: bool = False) -> jax.Array:
    """Compute the WOLA fold for a critically-sampled PFB (traced contexts
    only — complex in/out).

    G:     [K, M] float32 — taps arranged so that
           fold[t, r] = Σ_k G[k, r]·rows[t+k, r] (see channelizer:
           G[k, r] = proto_reversed[k·M + r])
    carry: [history] complex64 (history = (K-1)·M)
    x:     [n] complex64, n % M == 0
    Returns fold [n // M, M] complex64 — feed to fft(axis=-1) + the
    channelizer's phase correction.
    """
    if plan.hop != plan.n_chan:
        raise ValueError("pallas fold requires critical sampling (osr=1)")
    M, K = plan.n_chan, plan.taps_per
    # VMEM budget: ~2·tile_t rows per plane live at once (scratch window +
    # output tile, double-buffered); keep under ~8 MB of the 16 MB scoped
    # limit. At M=2560 this caps tile_t at 128.
    cap = max(8, int(8e6 // (16 * M)))
    tile_t = min(tile_t, 1 << (cap.bit_length() - 1))
    n = x.shape[-1]
    n_frames = n // M
    seg = jnp.concatenate([carry, x], axis=-1)
    rows = seg.reshape(n_frames + K - 1, M)

    n_tiles = -(-n_frames // tile_t)
    # DMA windows must be sublane-aligned: round the overlapping window up
    # to a multiple of 8 rows and pad the input so every window is
    # in-bounds; padding rows are zero and their outputs are discarded
    win = _round_up8(tile_t + K - 1)
    pad_frames = (n_tiles - 1) * tile_t + win - (n_frames + K - 1)
    re = jnp.pad(rows.real.astype(jnp.float32), ((0, pad_frames), (0, 0)))
    im = jnp.pad(rows.imag.astype(jnp.float32), ((0, pad_frames), (0, 0)))

    out_re, out_im = pl.pallas_call(
        partial(_fold_kernel, K=K, tile_t=tile_t, win=win),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * tile_t, M), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * tile_t, M), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((K, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tile_t, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((win, M), jnp.float32),
            pltpu.VMEM((win, M), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(G.astype(jnp.float32), re, im)
    fold = (out_re + 1j * out_im).astype(jnp.complex64)[:n_frames]
    return fold


def fold_taps(plan: channelizer.PFBPlan, proto: np.ndarray) -> jnp.ndarray:
    """Arrange the prototype for the kernel: G[k, r] = h_rev[k·M + r]."""
    g = np.asarray(proto)[::-1]
    return jnp.asarray(g.reshape(plan.taps_per, plan.n_chan), jnp.float32)


def channelize_pallas_c(plan: channelizer.PFBPlan, G: jax.Array,
                        carry: jax.Array, x: jax.Array,
                        interpret: bool = False
                        ) -> tuple[jax.Array, jax.Array]:
    """Drop-in for `channelizer.channelize_c` (critical sampling) using the
    Pallas fold. Traced contexts only; returns (new_carry, [M, n_frames])."""
    fold = pfb_fold_c(plan, G, carry, x, interpret=interpret)
    spec = jnp.fft.fft(fold, axis=-1)
    # critical sampling: rot ≡ history ≡ 0 (mod M) — no phase correction
    new_carry = jnp.concatenate([carry, x], axis=-1)[..., -plan.history:]
    return new_carry, jnp.moveaxis(spec, -2, -1)


@partial(jax.jit, static_argnames=("plan", "interpret"))
def _channelize_pallas_cx(plan: channelizer.PFBPlan, G: jax.Array,
                          carry: cx.CX, x: cx.CX, interpret: bool = False
                          ) -> tuple[cx.CX, cx.CX]:
    c, out = channelize_pallas_c(plan, G, cx.to_complex(carry),
                                 cx.to_complex(x), interpret=interpret)
    return cx.split(c), cx.split(out)


def channelize_pallas(plan: channelizer.PFBPlan, G: jax.Array, carry, x,
                      interpret: bool = False) -> tuple[cx.CX, cx.CX]:
    """Public entry with split-complex (TPU-safe) program boundaries."""
    return _channelize_pallas_cx(plan, G, cx.as_cx(carry), cx.as_cx(x),
                                 interpret=interpret)
