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

The kernel emits [n1(k1), nf, n2(k2)]. Output layouts:
  * "raw3" (the shipped coupling): the raw planes go STRAIGHT to the
    FIR-fused tail's window DMAs (planar channel order c = k1·n2+k2;
    `wideband.audio_channel_order` is the public row→bin map) — no
    transpose pass anywhere. `out_dtype=bfloat16` halves the coupling
    round-trip (free for the bf16 fast tier).
  * "time"/"chan": one XLA transpose to [nf, M] / [M, nf] bin order
    (m = k2·n1 + k1, matching `channelizer._fft_rotate`).
Inputs arrive as raw CX planes (zero-copy reshape into the window
DMAs; the kernel stitches carry/x/pad itself) or as int16 planes
(in-VMEM dequantize — half the input read).

Constraints (Mosaic, measured rounds 3-4): n2 must be a lane multiple;
DMA sublane offsets must be 8-aligned (`pl.multiple_of` annotations);
the split-bf16 dot3 stage B compiles at tile_t ≤ 112 only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supersdr_tpu.ops import channelizer, cx

# r5 experiment flag (read once at import): stage-B split-bf16 as TWO
# stacked dots instead of three. Compiles at tile 128 (the 3-dot form
# cliffs there) but measured a net LOSS from the in-kernel concats —
# kept as a probe, off by default (docs/PERFORMANCE.md r5 ledger).
import os as _os
STAGEB_2DOT = _os.environ.get("SSDR_STAGEB_2DOT", "0") == "1"


def _round_up8(n: int) -> int:
    return (n + 7) & ~7


def _kernel(g_ref, at_r_ref, at_i_ref, c2r_ref, c2i_ref, head_r_ref,
            head_i_ref, re_ref, im_ref,
            *rest, K: int, T: int, n1: int, n2: int,
            bf16_mxu: bool, n_tiles: int, n_frames: int,
            in_scale: float = 0.0, HR: int = 8, n1_out: int = 0,
            split_levels: int = 0):
    """Input comes as the RAW [n_frames, M] planes plus an HR-row "head"
    holding the K−1 carry rows (zero-padded on top; HR = K−1 rounded up
    to a multiple of 8, minimum 8): the kernel stitches the virtual
    [carry | x | zero-pad] segment itself per tile, so the caller never
    materializes a padded/concatenated copy of the input — at the bench
    shape that concat+pad cost ~1.6 ms of pure HBM traffic (the
    pipeline's largest read).

    in_scale > 0: the input planes are int16 (e.g. a 16-bit ADC / the
    KiwiSDR IQ wire format); window DMAs land in an i16 staging buffer
    (rest = s16_r, s16_i, sems) and convert to f32·in_scale in VMEM —
    the HBM input read is halved. Carry head and all math stay f32.

    n1_out > n1: emit `n1_out − n1` ZERO planes after the real ones
    (padded-planar mesh coupling — the all_to_all's split axis must be
    divisible by the device count; parallel/sharded_wideband).

    split_levels ≥ 1: stage B as L radix-2 DIF butterfly levels (VPU) +
    2^L [·, n2/2^L] DFT matmuls — the MXU MACs halve per level
    (channelizer._stageb_split_tables). c2 refs then hold the
    n2/2^L-point DFT and L extra tw refs (first in `rest`) carry the
    per-level twiddle rows; output column order is
    channelizer.stageb_col_to_k2."""
    i = pl.program_id(0)
    hk = K - 1
    off = HR - hk         # virtual segment row v lives at scr row v+off
                          # (scr rows [off, HR) hold the carry; x tiles
                          # land at row HR — every DMA offset/length is
                          # 8-aligned, which Mosaic's memref slicing
                          # requires; sub-8 VECTOR reads/writes are fine)

    tw_refs = rest[:split_levels]
    rest = rest[split_levels:]
    out_r, out_i, scr_re, scr_im, fold_r, fold_i, y_r, y_i, *rest = rest
    i16 = in_scale > 0
    if i16:
        s16_r, s16_i, sems = rest
    else:
        (sems,) = rest

    def dma(src_start, dst_start, length):
        # Mosaic's divisibility analysis can't prove i·T − 8 ≡ 0 (mod 8)
        # through the affine expression — annotate it
        src = pl.ds(pl.multiple_of(src_start, 8), length)
        if i16:
            d_re = pltpu.make_async_copy(
                re_ref.at[src, :],
                s16_r.at[pl.ds(dst_start, length), :], sems.at[0])
            d_im = pltpu.make_async_copy(
                im_ref.at[src, :],
                s16_i.at[pl.ds(dst_start, length), :], sems.at[1])
            d_re.start()
            d_im.start()
            d_re.wait()
            d_im.wait()
            scr_re[dst_start:dst_start + length, :] = \
                s16_r[dst_start:dst_start + length, :].astype(
                    jnp.float32) * in_scale
            scr_im[dst_start:dst_start + length, :] = \
                s16_i[dst_start:dst_start + length, :].astype(
                    jnp.float32) * in_scale
            return
        d_re = pltpu.make_async_copy(
            re_ref.at[src, :],
            scr_re.at[pl.ds(dst_start, length), :], sems.at[0])
        d_im = pltpu.make_async_copy(
            im_ref.at[src, :],
            scr_im.at[pl.ds(dst_start, length), :], sems.at[1])
        d_re.start()
        d_im.start()
        d_re.wait()
        d_im.wait()

    def zero(lo, hi):
        scr_re[lo:hi, :] = jnp.zeros((hi - lo, scr_re.shape[1]),
                                     scr_re.dtype)
        scr_im[lo:hi, :] = jnp.zeros((hi - lo, scr_im.shape[1]),
                                     scr_im.dtype)

    def head():
        scr_re[0:HR, :] = head_r_ref[0:HR, :]
        scr_im[0:HR, :] = head_i_ref[0:HR, :]

    if n_tiles == 1:
        head()
        dma(0, HR, n_frames)
        if HR + T - (HR + n_frames):
            zero(HR + n_frames, HR + T)
    else:
        # x rows available to the last tile, from the 8-aligned start
        L8 = n_frames - (n_tiles - 1) * T + HR

        @pl.when(i == 0)
        def _():
            head()
            dma(0, HR, T)

        @pl.when((i > 0) & (i < n_tiles - 1))
        def _():
            dma(i * T - HR, 0, HR + T)

        @pl.when(i == n_tiles - 1)
        def _():
            dma(i * T - HR, 0, L8)
            if HR + T - L8:
                zero(L8, HR + T)
    # K-tap fold (VPU; scratch accumulators keep stack pressure at one
    # live buffer per plane); virtual segment row v = scr row v + off
    fold_r[:] = g_ref[0][None, :] * scr_re[off: off + T, :]
    fold_i[:] = g_ref[0][None, :] * scr_im[off: off + T, :]
    for k in range(1, K):
        fold_r[:] += g_ref[k][None, :] * scr_re[off + k: off + k + T, :]
        fold_i[:] += g_ref[k][None, :] * scr_im[off + k: off + k + T, :]
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
    # stage B: contract j2 on the MXU
    c2r = c2r_ref[:]
    c2i = c2i_ref[:]
    dot = partial(jax.lax.dot_general,
                  dimension_numbers=(((1,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)

    def cdot(ar, ai):
        """(ar + i·ai) · (c2r + i·c2i) at the tier's MXU precision."""
        if bf16_mxu:
            ab_r = ar.astype(jnp.bfloat16)
            ab_i = ai.astype(jnp.bfloat16)
            c2rb = c2r.astype(jnp.bfloat16)
            c2ib = c2i.astype(jnp.bfloat16)
            return (dot(ab_r, c2rb) - dot(ab_i, c2ib),
                    dot(ab_r, c2ib) + dot(ab_i, c2rb))
        # ~f32 product: manual split-bf16 ×3 (hi·hi + hi·lo + lo·hi).
        # Inside Mosaic the MXU rounds f32 operands to bf16 regardless
        # of dtype (precision attrs do not lower), and — unlike XLA —
        # nothing folds the convert round-trip away, so the split works

        def split(v):
            hi = v.astype(jnp.bfloat16)
            lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        two_dot = STAGEB_2DOT

        def dot3(a, b):
            ah, al = split(a)
            bh, bl = split(b)
            if two_dot:
                # same three partial products in TWO MXU ops: the
                # cross terms ah·bl + al·bh ride one stacked dot with
                # a 2·n2 contraction (r5 probe of VERDICT r3 #3's
                # "stage-B split" idea at the instruction level)
                a2 = jnp.concatenate([ah, al], axis=1)
                b2 = jnp.concatenate([bl, bh], axis=0)
                return dot(ah, bh) + dot(a2, b2)
            return dot(ah, bh) + dot(ah, bl) + dot(al, bh)

        return (dot3(ar, c2r) - dot3(ai, c2i),
                dot3(ar, c2i) + dot3(ai, c2r))

    def store(xr2, xi2, lo, hi):
        # reshape splits only the SUBLANE dim (n1·T → n1, T) and the
        # column slice is lane-aligned: Mosaic-legal. Padded-planar
        # zero planes k1 ∈ [n1, n1_out) are written in-kernel (an XLA
        # concat would re-copy the whole raw buffer).
        w = hi - lo
        out_r[0:n1, :, lo:hi] = xr2.reshape(n1, T, w).astype(out_r.dtype)
        out_i[0:n1, :, lo:hi] = xi2.reshape(n1, T, w).astype(out_i.dtype)
        if n1_out > n1:
            z = jnp.zeros((n1_out - n1, T, w), out_r.dtype)
            out_r[n1:n1_out, :, lo:hi] = z
            out_i[n1:n1_out, :, lo:hi] = z

    if split_levels:
        # L radix-2 DIF butterfly levels over the j2 blocks (VPU) +
        # 2^L n2/2^L-DFT matmuls — the stage-B MXU MACs halve per
        # level. Block order is u|v per level; column→k2 is
        # channelizer.stageb_col_to_k2. Blocks live as value pairs
        # (per-block [n1·T, w] arrays) — no ref round-trip between
        # levels.
        blocks = [(y_r[:], y_i[:])]
        W = n2
        for lev in range(split_levels):
            w = W // 2
            twr = tw_refs[lev][0:1, :]
            twi = tw_refs[lev][1:2, :]
            nxt = []
            for br, bi in blocks:
                y0r, y1r = br[:, 0:w], br[:, w:W]
                y0i, y1i = bi[:, 0:w], bi[:, w:W]
                d_r, d_i = y0r - y1r, y0i - y1i
                nxt.append((y0r + y1r, y0i + y1i))
                nxt.append((d_r * twr - d_i * twi,
                            d_r * twi + d_i * twr))
            # u|v stay adjacent per parent (block index bit ℓ-from-MSB
            # = this level's branch) — matches stageb_col_to_k2
            blocks = nxt
            W = w
        for b, (br, bi) in enumerate(blocks):
            store(*cdot(br, bi), b * W, (b + 1) * W)
    else:
        # one [n1·T, n2]·[n2, n2] matmul
        store(*cdot(y_r[:], y_i[:]), 0, n2)


def channelize_fused_c(plan: channelizer.PFBPlan, W: jax.Array,
                       carry: jax.Array, x: jax.Array, *,
                       tile_t: int = 128, bf16_mxu: bool = True,
                       interpret: bool = False, out_layout: str = "chan",
                       out_dtype=jnp.float32,
                       factors: tuple[int, int] | None = None,
                       n1_pad: int | None = None,
                       split2: bool = False,
                       split_levels: int | None = None
                       ) -> tuple[jax.Array, jax.Array]:
    """Fused channelizer step (traced contexts, critical sampling).

    x: [n] complex64 → (new_carry, chans [M, n//M]) — numerically
    equivalent to `channelize_c` (bf16_mxu=False) or to the DEFAULT-
    precision mxu2 tier (bf16_mxu=True, stage B only; the fold and
    stage A accumulate in f32 — strictly more accurate than the f16
    slice fold + bf16 stage A of the XLA fast profile).

    out_layout="time" returns chans TIME-MAJOR [n//M, M] instead —
    the layout the fused chain tail consumes — so the whole wideband
    fast path runs time-major with ONE layout rotation total (this
    wrapper's transpose; the per-channel m index is identical in both
    layouts).

    factors: override the DIF (n1, n2) split (n1·n2 == M, n2 a lane
    multiple) — the mesh picks the factoring whose k1-plane axis the
    device count divides (parallel/sharded_wideband).
    n1_pad > n1 (raw3 only): emit `n1_pad − n1` trailing ZERO planes
    so the raw buffer's plane axis is divisible by the device count.
    split_levels ≥ 1 (raw3 only, n2 % (128·2^L) == 0): L-level radix-2
    stage-B split — the stage-B MXU MACs halve per level; the raw
    column order becomes `channelizer.stageb_col_to_k2(n2, L)`, which
    `wideband.audio_channel_order` folds into the public row→bin map.
    `split2=True` is the L=1 shorthand.
    """
    from supersdr_tpu.ops import cx as cx_mod
    i16_in = (isinstance(x, tuple)
              and not isinstance(x, cx.CX))   # (re_i16, im_i16) planes
    if i16_in:
        xs = None
        re16, im16 = x
    else:
        xs = cx_mod.as_cx(x) if not isinstance(x, cx_mod.CX) else x
    cs = cx_mod.as_cx(carry) if not isinstance(carry, cx_mod.CX) else carry

    M, K = plan.n_chan, plan.taps_per
    if plan.hop != M:
        raise ValueError("fused channelizer requires critical sampling")
    fac = factors if factors is not None else channelizer._pick_factors(M)
    if fac is None or fac[1] % 128 or fac[0] * fac[1] != M:
        raise ValueError("fused channelizer needs n_chan with a "
                         "lane-multiple factor (n2 % 128 == 0)")
    n1, n2 = fac
    HR = max(8, _round_up8(K - 1))     # head rows (8-aligned DMA unit)
    if tile_t < HR:
        raise ValueError(f"tile_t must be >= the {HR}-row history head")
    n1o = n1 if n1_pad is None else n1_pad
    if n1o != n1 and out_layout != "raw3":
        raise ValueError("n1_pad is only for the raw3 coupling")
    if n1o < n1:
        raise ValueError("n1_pad must be >= n1")
    L = split_levels if split_levels is not None else (1 if split2 else 0)
    if L and (out_layout != "raw3"
              or not channelizer.stageb_split_ok(n2, L)):
        raise ValueError("the stage-B split needs the raw3 coupling and "
                         f"n2 % {128 << L} == 0 (every block "
                         "lane-aligned at every level)")
    n = (re16 if i16_in else xs.re).shape[-1]
    n_frames = n // M
    Ar, Ai, c2r, c2i = channelizer._dif_tables(M, n1, n2)
    n2c = n2          # stage-B DFT size (n2/2^L under the split)
    tws = []
    if L:
        c2r_h, c2i_h, twpairs = channelizer._stageb_split_tables(n2, L)
        c2r, c2i = c2r_h, c2i_h
        n2c = n2 >> L
        for tw_r, tw_i in twpairs:
            # twiddle row pair padded to an 8-row block (rows 0/1=re/im)
            t8 = np.zeros((8, tw_r.shape[1]), np.float32)
            t8[0], t8[1] = tw_r[0], tw_i[0]
            tws.append(t8)
    # At2[(j1·n1 + k1), j2] = A[j2, k1, j1]
    At_r = jnp.asarray(np.ascontiguousarray(
        Ar.transpose(2, 1, 0).reshape(n1 * n1, n2)))
    At_i = jnp.asarray(np.ascontiguousarray(
        Ai.transpose(2, 1, 0).reshape(n1 * n1, n2)))
    g2 = W.reshape(-1)[::-1].reshape(K, M)

    n_tiles = -(-n_frames // tile_t)
    if n_frames % 8:
        raise ValueError("fused channelizer needs n_frames % 8 == 0 "
                         "(8-aligned window DMAs)")
    # raw input planes, zero-copy [n_frames, M] views — the kernel
    # stitches carry/x/pad itself (no concat, no pad pass)
    in_scale = 0.0
    if i16_in:
        in_scale = 1.0 / 32768.0
        re = re16.reshape(n_frames, M)
        im = im16.reshape(n_frames, M)
    else:
        re = xs.re.reshape(n_frames, M)
        im = xs.im.reshape(n_frames, M)
    # HR-row head: zeros on top, the K−1 carry rows at the bottom
    head_r = jnp.concatenate(
        [jnp.zeros((HR - (K - 1), M), jnp.float32),
         cs.re.reshape(K - 1, M)], axis=0)
    head_i = jnp.concatenate(
        [jnp.zeros((HR - (K - 1), M), jnp.float32),
         cs.im.reshape(K - 1, M)], axis=0)

    out_r, out_i = pl.pallas_call(
        partial(_kernel, K=K, T=tile_t, n1=n1, n2=n2,
                bf16_mxu=bf16_mxu, n_tiles=n_tiles, n_frames=n_frames,
                in_scale=in_scale, HR=HR, n1_out=n1o, split_levels=L),
        out_shape=(
            jax.ShapeDtypeStruct((n1o, n_tiles * tile_t, n2), out_dtype),
            jax.ShapeDtypeStruct((n1o, n_tiles * tile_t, n2), out_dtype),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((K, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1 * n1, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1 * n1, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2c, n2c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2c, n2c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HR, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HR, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [pl.BlockSpec(t8.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for t8 in tws],
        out_specs=(
            pl.BlockSpec((n1o, tile_t, n2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1o, tile_t, n2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((HR + tile_t, M), jnp.float32),
            pltpu.VMEM((HR + tile_t, M), jnp.float32),
            pltpu.VMEM((tile_t, M), jnp.float32),
            pltpu.VMEM((tile_t, M), jnp.float32),
            pltpu.VMEM((n1 * tile_t, n2), jnp.float32),
            pltpu.VMEM((n1 * tile_t, n2), jnp.float32),
        ] + ([pltpu.VMEM((HR + tile_t, M), jnp.int16),
              pltpu.VMEM((HR + tile_t, M), jnp.int16)] if i16_in else [])
        + [pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(g2.astype(jnp.float32), At_r, At_i, jnp.asarray(c2r),
      jnp.asarray(c2i), head_r, head_i, re, im,
      *(jnp.asarray(t8) for t8 in tws))

    # [n1(k1), nf, n2(k2)] → one XLA transpose outside the kernel (the
    # only non-fused pass): chans [m = k2·n1 + k1, nf] ("chan") or the
    # time-major [nf, m] ("time" — reshape of [nf, n2, n1] flattens to
    # the same m = k2·n1 + k1 channel index)
    h = plan.history
    if i16_in:
        new_carry = jax.lax.complex(
            re16[..., -h:].astype(jnp.float32) * in_scale,
            im16[..., -h:].astype(jnp.float32) * in_scale)
    else:
        new_carry = jax.lax.complex(xs.re[..., -h:], xs.im[..., -h:])
    if out_layout != "raw3" and out_dtype != jnp.float32:
        raise ValueError("out_dtype != f32 is only for the raw3 coupling")
    if out_layout == "raw3":
        # zero-copy coupling: hand the raw [n1, nf, n2] planes to a
        # consumer that DMAs planar channel blocks directly (the
        # FIR-fused tail) — no transpose pass at all. Requires exact
        # frame tiling so no pad rows leak into the stream.
        if n_frames % tile_t:
            raise ValueError("raw3 needs n_frames % tile_t == 0")
        return new_carry, (out_r, out_i)
    if out_layout == "time":
        xr = jnp.transpose(out_r[:, :n_frames, :], (1, 2, 0)
                           ).reshape(n_frames, M)
        xi = jnp.transpose(out_i[:, :n_frames, :], (1, 2, 0)
                           ).reshape(n_frames, M)
        return new_carry, jax.lax.complex(xr, xi)
    xr = jnp.transpose(out_r[:, :n_frames, :], (2, 0, 1)).reshape(M, n_frames)
    xi = jnp.transpose(out_i[:, :n_frames, :], (2, 0, 1)).reshape(M, n_frames)
    return new_carry, jax.lax.complex(xr, xi)
