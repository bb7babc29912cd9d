"""Fused Pallas channelizer: PFB fold + both DIF FFT stages, one VMEM pass.

The XLA mxu2 path costs ~21 ms in context at the bench shape: the fold
is free, but the two DIF dot_generals plus their bf16 converts and the
chans boundary cost ~15 ms of HBM passes. This kernel streams each
frame tile through VMEM ONCE:

  window DMA → K-tap fold (VPU) → stage A Y[k1·T+t, j2] = Σ_j1
  At[j1,k1,·]·fold[t, j1·n2+·] (VPU row-broadcast accumulate over the
  small n1 axis — the j2 batch lives on the lane dim where a batched
  MXU dot cannot) → stage B contract j2 (ONE [n1·T, n2]·[n2, n2] MXU
  matmul) → tile output [n1, T, n2].

Everything between the input read and the output write stays in VMEM,
and every in-kernel value is 2-D (or reshaped only along sublane dims):
Mosaic rejects reshapes that split the lane dimension, which is why the
fold's [T, M] → [T, n1, n2] view is expressed as lane-aligned column
slices instead.

The kernel emits [n1(k1), nf, n2(k2)]; the wrapper's single XLA
transpose (2,0,1) + reshape delivers the chain's [M, nf] layout with
m = k2·n1 + k1 — the same indexing as `channelizer._fft_rotate`
(`_dif_tables`), so outputs match `channelize_c` to round-off.

Constraints (Mosaic, measured round 3): n2 must be a lane multiple and
the kernel must not sit inside a `lax.scan` body (callers unroll — see
`wideband.process_many`).
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


def _kernel(g_ref, at_r_ref, at_i_ref, c2r_ref, c2i_ref, re_ref, im_ref,
            out_r, out_i, scr_re, scr_im, fold_r, fold_i, y_r, y_i,
            sems, *, K: int, T: int, win: int, n1: int, n2: int,
            bf16_mxu: bool):
    i = pl.program_id(0)
    d_re = pltpu.make_async_copy(re_ref.at[pl.ds(i * T, win), :],
                                 scr_re, sems.at[0])
    d_im = pltpu.make_async_copy(im_ref.at[pl.ds(i * T, win), :],
                                 scr_im, sems.at[1])
    d_re.start()
    d_im.start()
    d_re.wait()
    d_im.wait()
    # K-tap fold (VPU; scratch accumulators keep stack pressure at one
    # live buffer per plane)
    fold_r[:] = g_ref[0][None, :] * scr_re[0:T, :]
    fold_i[:] = g_ref[0][None, :] * scr_im[0:T, :]
    for k in range(1, K):
        fold_r[:] += g_ref[k][None, :] * scr_re[k: k + T, :]
        fold_i[:] += g_ref[k][None, :] * scr_im[k: k + T, :]
    # stage A: for each output sub-index k1, accumulate the n1 input
    # branches. f3[t, j1, j2] is the lane-aligned column block
    # fold[:, j1·n2:(j1+1)·n2]; the table row At2[j1·n1+k1] carries
    # A[j2-major] for that (j1, k1) pair. All values stay 2-D.
    for k1 in range(n1):
        accr = None
        acci = None
        for j1 in range(n1):
            r = j1 * n1 + k1
            ar = at_r_ref[r: r + 1, :]                     # [1, n2]
            ai = at_i_ref[r: r + 1, :]
            xr_ = fold_r[:, j1 * n2:(j1 + 1) * n2]         # [T, n2]
            xi_ = fold_i[:, j1 * n2:(j1 + 1) * n2]
            tr_ = ar * xr_ - ai * xi_
            ti_ = ar * xi_ + ai * xr_
            accr = tr_ if accr is None else accr + tr_
            acci = ti_ if acci is None else acci + ti_
        y_r[k1 * T:(k1 + 1) * T, :] = accr
        y_i[k1 * T:(k1 + 1) * T, :] = acci
    # stage B: contract j2 on the MXU — one [n1·T, n2]·[n2, n2] matmul
    y2r = y_r[:]
    y2i = y_i[:]
    c2r = c2r_ref[:]
    c2i = c2i_ref[:]
    dot = partial(jax.lax.dot_general,
                  dimension_numbers=(((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)
    if bf16_mxu:
        y2r = y2r.astype(jnp.bfloat16)
        y2i = y2i.astype(jnp.bfloat16)
        c2rb = c2r.astype(jnp.bfloat16)
        c2ib = c2i.astype(jnp.bfloat16)
        xr2 = dot(y2r, c2rb) - dot(y2i, c2ib)              # [n1·T, n2]
        xi2 = dot(y2r, c2ib) + dot(y2i, c2rb)
    else:
        # ~f32 product: manual split-bf16 ×3 (hi·hi + hi·lo + lo·hi).
        # Inside Mosaic the MXU rounds f32 operands to bf16 regardless
        # of dtype (precision attrs do not lower), and — unlike XLA —
        # nothing folds the convert round-trip away, so the split works
        def split(v):
            hi = v.astype(jnp.bfloat16)
            lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        def dot3(a, b):
            ah, al = split(a)
            bh, bl = split(b)
            return dot(ah, bh) + dot(ah, bl) + dot(al, bh)

        xr2 = dot3(y2r, c2r) - dot3(y2i, c2i)              # [n1·T, n2]
        xi2 = dot3(y2r, c2i) + dot3(y2i, c2r)
    # reshape splits only the SUBLANE dim (n1·T → n1, T): Mosaic-legal
    out_r[:] = xr2.reshape(n1, T, n2)
    out_i[:] = xi2.reshape(n1, T, n2)


def channelize_fused_c(plan: channelizer.PFBPlan, W: jax.Array,
                       carry: jax.Array, x: jax.Array, *,
                       tile_t: int = 128, bf16_mxu: bool = True,
                       interpret: bool = False
                       ) -> tuple[jax.Array, jax.Array]:
    """Fused channelizer step (traced contexts, critical sampling).

    x: [n] complex64 → (new_carry, chans [M, n//M]) — numerically
    equivalent to `channelize_c` (bf16_mxu=False) or to the DEFAULT-
    precision mxu2 tier (bf16_mxu=True, stage B only; the fold and
    stage A accumulate in f32 — strictly more accurate than the f16
    slice fold + bf16 stage A of the XLA fast profile).
    """
    M, K = plan.n_chan, plan.taps_per
    if plan.hop != M:
        raise ValueError("fused channelizer requires critical sampling")
    fac = channelizer._pick_factors(M)
    if fac is None or fac[1] % 128:
        raise ValueError("fused channelizer needs n_chan with a "
                         "lane-multiple factor (n2 % 128 == 0)")
    n1, n2 = fac
    n = x.shape[-1]
    n_frames = n // M
    Ar, Ai, c2r, c2i = channelizer._dif_tables(M, n1, n2)
    # At2[(j1·n1 + k1), j2] = A[j2, k1, j1]
    At_r = jnp.asarray(np.ascontiguousarray(
        Ar.transpose(2, 1, 0).reshape(n1 * n1, n2)))
    At_i = jnp.asarray(np.ascontiguousarray(
        Ai.transpose(2, 1, 0).reshape(n1 * n1, n2)))
    g2 = W.reshape(-1)[::-1].reshape(K, M)

    seg = jnp.concatenate([carry, x], axis=-1)
    rows = seg.reshape(n_frames + K - 1, M)
    n_tiles = -(-n_frames // tile_t)
    win = _round_up8(tile_t + K - 1)
    pad_frames = (n_tiles - 1) * tile_t + win - (n_frames + K - 1)
    re = jnp.pad(rows.real.astype(jnp.float32), ((0, pad_frames), (0, 0)))
    im = jnp.pad(rows.imag.astype(jnp.float32), ((0, pad_frames), (0, 0)))

    out_r, out_i = pl.pallas_call(
        partial(_kernel, K=K, T=tile_t, win=win, n1=n1, n2=n2,
                bf16_mxu=bf16_mxu),
        out_shape=(
            jax.ShapeDtypeStruct((n1, n_tiles * tile_t, n2), jnp.float32),
            jax.ShapeDtypeStruct((n1, n_tiles * tile_t, n2), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((K, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1 * n1, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1 * n1, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((n1, tile_t, n2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, tile_t, n2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((win, M), jnp.float32),
            pltpu.VMEM((win, M), jnp.float32),
            pltpu.VMEM((tile_t, M), jnp.float32),
            pltpu.VMEM((tile_t, M), jnp.float32),
            pltpu.VMEM((n1 * tile_t, n2), jnp.float32),
            pltpu.VMEM((n1 * tile_t, n2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(g2.astype(jnp.float32), At_r, At_i, jnp.asarray(c2r),
      jnp.asarray(c2i), re, im)

    # [n1(k1), nf, n2(k2)] → chans [m = k2·n1 + k1, nf]: one XLA
    # transpose outside the kernel (the only non-fused pass)
    xr = jnp.transpose(out_r[:, :n_frames, :], (2, 0, 1)).reshape(M, n_frames)
    xi = jnp.transpose(out_i[:, :n_frames, :], (2, 0, 1)).reshape(M, n_frames)
    new_carry = seg[..., -plan.history:]
    return new_carry, jax.lax.complex(xr, xi)
