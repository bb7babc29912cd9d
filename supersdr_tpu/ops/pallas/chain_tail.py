"""Fused Pallas "chain tail": AM demod → DC block → AGC → 4× resample.

After the fused channelizer and the Toeplitz passband, the remaining
back half of the receiver chain is ~15-20 XLA elementwise/scan passes
over [n_chan, chunk] buffers. This kernel runs all of it per VMEM tile
in TIME-MAJOR layout ([T, C] — time on sublanes, channels on lanes),
which makes every recurrence a sublane-shift problem:

  envelope |y| → DC block (first-order IIR via log-depth doubling
  scan) → AGC (peak tracker as a decayed cummax via doubling-max,
  kneed gain law, attack one-pole via a second doubling scan) →
  4× polyphase resample (9-tap × 4-phase shifted FMA, phases stacked
  along sublanes so the audio interleave is a sublane reshape).

Streaming state (DC x/y, AGC peak/gain, resample tail) lives in VMEM
scratch that persists across the sequential grid: tiles iterate
(channel-group outer, time inner), carries reset from the state inputs
at t==0 and write back to state outputs at the last tile — bit-exact
chunk chaining, same carry semantics as the XLA ops.

Layout contract: inputs are the TRANSPOSED passband output planes
[chunk, n_chan] (one XLA transpose upstream); audio comes back
[chunk·4, n_chan] (one XLA transpose downstream). n_chan must be a
lane multiple; chunk a multiple of the time tile.

Squelch and RSSI stay outside (they gate on whole-chunk statistics).
The AGC hang window and noise blanker are not fused (callers keep the
XLA path when those are enabled).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ENV_FLOOR = 1e-9
_LOG10_E20 = 8.685889638065035      # 20/ln(10)
_LN10_D20 = 0.11512925464970229     # ln(10)/20


def _shift_down(w, s, T, fill):
    """w shifted down s sublanes, top filled with `fill` (concat form —
    jnp.pad does not lower through Mosaic here)."""
    top = jnp.full((s, w.shape[1]), fill, w.dtype)
    return jnp.concatenate([top, w[: T - s, :]], axis=0)


def _doubling_linear(w, a_pows, T):
    """y[n] = Σ_{k≤n} a^(n-k)·w[k] via log-depth doubling; a_pows[s] is
    the scalar a^(2^s) (f32). Sublane shifts only."""
    s = 1
    idx = 0
    while s < T:
        w = w + a_pows[idx] * _shift_down(w, s, T, 0.0)
        s *= 2
        idx += 1
    return w


def _doubling_max(w, T):
    """cummax along sublanes via log-depth doubling-max."""
    s = 1
    while s < T:
        w = jnp.maximum(w, _shift_down(w, s, T, -3.0e38))
        s *= 2
    return w


def _n_pows(T):
    n = 0
    s = 1
    while s < T:
        n += 1
        s *= 2
    return n


def _kernel(par_ref, ramp_ref, yr_ref, yi_ref, st_in_ref,
            audio_ref, st_out_ref, carry, *, T: int, C: int, n_t: int,
            L: int, PER: int, taps: tuple, ssb: bool,
            accum_pow: bool = False):
    """Grid (c_group, t): par_ref [8,1] SMEM scalars
    (r_dc, decay_d, thresh, slope, target, man_gain, agc_on, attack);
    ramp_ref [T, 1] iota ramp; p_ref [8·?, L...] resample taps
    (row m, col p → taps P[m, p]) padded; yr/yi [T, C] passband planes;
    audio [T·L, C]; st_in/st_out [8, C] per-group stream state rows:
      0 dc_x, 1 dc_y, 2 peak_db, 3 gain_db, 4.. resample tail (PER-1),
      then (accum_pow) one per-chunk Σ|y|² accumulator row — the
      passband power the XLA path reads back for RSSI, folded here so
      the wideband pipeline never re-reads y from HBM.
    carry: VMEM scratch persisted across the t dimension.
    """
    t = pl.program_id(1)
    r_dc = par_ref[0, 0]
    d = par_ref[1, 0]              # decay per sample (positive dB)
    thresh = par_ref[2, 0]
    slope = par_ref[3, 0]
    target = par_ref[4, 0]
    man_gain = par_ref[5, 0]
    agc_on = par_ref[6, 0]
    attack = par_ref[7, 0]

    @pl.when(t == 0)
    def _():
        carry[:, :] = st_in_ref[:, :]

    yr = yr_ref[:]
    yi = yi_ref[:]
    if accum_pow:
        pw = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)   # [1, C]
        row = 4 + PER - 1

        @pl.when(t == 0)
        def _():
            carry[row: row + 1, :] = jnp.zeros_like(pw)
        carry[row: row + 1, :] += pw
    n_pows = _n_pows(T)
    if ssb:
        # USB/LSB/CW: the one-sided passband makes y analytic — audio is
        # the real part; no envelope, no DC block (demod_ssb semantics)
        audio0 = yr
    else:
        env = jnp.sqrt(yr * yr + yi * yi)
        # ---- DC block: y[n] = (env[n] − env[n−1]) + r·y[n−1]
        prev_env = jnp.concatenate([carry[0:1, :], env[:T - 1, :]], axis=0)
        diff = env - prev_env
        # doubling scan needs scalar a^(2^s): repeated squaring
        a = r_dc
        pows = []
        for _i in range(n_pows):
            pows.append(a)
            a = a * a
        audio0 = _doubling_linear(diff, pows, T)
        # initial condition: + r^(n+1) · y0
        rn1 = jnp.exp(jnp.log(jnp.maximum(r_dc, 1e-12))
                      * (ramp_ref[:] + 1.0))
        audio0 = audio0 + rn1 * carry[1:2, :]
        carry[0:1, :] = env[T - 1: T, :]
        carry[1:2, :] = audio0[T - 1: T, :]

    # ---- AGC peak tracker: p[n] = max(p[n−1] − d, env_db[n])
    env_db = _LOG10_E20 * jnp.log(jnp.maximum(jnp.abs(audio0), ENV_FLOOR))
    jd = ramp_ref[:] * d                         # [T, 1] broadcasts
    s_arr = env_db + jd                          # b[j] − j·a with a = −d
    cm = _doubling_max(s_arr, T)
    peak = jnp.maximum(cm, carry[2:3, :] - d) - jd
    carry[2:3, :] = peak[T - 1: T, :]

    # ---- kneed gain law (agc.apply semantics)
    max_gain = target - thresh
    above = (target - peak) + slope * ((peak - thresh)
                                       / jnp.maximum(-thresh, 1e-6))
    auto_gain = jnp.where(peak <= thresh, max_gain, above)
    gain_db = jnp.where(agc_on > 0, auto_gain, man_gain - 50.0)

    # ---- attack smoothing: g[n] = attack·g[n−1] + (1−attack)·gain[n]
    w = (1.0 - attack) * gain_db
    a2 = attack
    pows2 = []
    for _i in range(n_pows):
        pows2.append(a2)
        a2 = a2 * a2
    g = _doubling_linear(w, pows2, T)
    an1 = jnp.exp(jnp.log(jnp.maximum(attack, 1e-12)) * (ramp_ref[:] + 1.0))
    g = g + an1 * carry[3:4, :]
    carry[3:4, :] = g[T - 1: T, :]
    audio1 = audio0 * jnp.exp(_LN10_D20 * g)

    # ---- 4× polyphase resample: y[(n)·L + p] = Σ_m seg[n−(PER−1)+m]·P[m,p]
    # seg = [tail (PER−1) | audio1]; per phase a PER-tap shifted FMA
    seg = jnp.concatenate([carry[4: 4 + PER - 1, :], audio1], axis=0)
    phases = []
    for p in range(L):
        acc = None
        for m in range(PER):
            term = taps[m * L + p] * seg[m: m + T, :]
            acc = term if acc is None else acc + term
        phases.append(acc)
    carry[4: 4 + PER - 1, :] = audio1[T - (PER - 1): T, :]
    # interleave: [T, L, C] stacked on sublanes → [T·L, C] (concat of
    # sublane-split reshapes — jnp.stack does not lower through Mosaic)
    out = jnp.concatenate([ph.reshape(T, 1, C) for ph in phases],
                          axis=1).reshape(T * L, C)
    audio_ref[:] = out.astype(audio_ref.dtype)
    st_out_ref[:, :] = carry[:, :]


def chain_tail_am(yT_r: jax.Array, yT_i: jax.Array, state_rows: jax.Array,
                  params_vec: jax.Array, P: jax.Array, *,
                  tile_t: int = 1024, lane_c: int = 128, L: int = 4,
                  ssb: bool = False, interpret: bool = False,
                  accum_pow: bool = False, audio_dtype=jnp.float32
                  ) -> tuple[jax.Array, jax.Array]:
    """Run the fused AM tail.

    yT_r/yT_i:  [chunk, n_chan] transposed passband planes
    state_rows: [n_groups, 4 + PER − 1 (+1 with accum_pow), lane_c]
                stream state (rows: dc_x, dc_y, peak_db, gain_db,
                resample tail[PER−1], then the Σ|y|² accumulator row —
                per-chunk scratch, reset at t==0, valid on OUTPUT only)
    params_vec: [8] f32 (r_dc, decay/sample, thresh, slope, target,
                man_gain, agc_on, attack)
    P:          [PER, L] polyphase matrix (resample.plan_interp)
    audio_dtype: output plane dtype — float16/bfloat16 halve the audio
                HBM write (the largest buffer the pipeline touches);
                gate the quantization on the bench oracle SNR.
    Returns (audioT [chunk·L, n_chan], new_state_rows).
    """
    chunk, M = yT_r.shape
    if M % lane_c:
        raise ValueError("n_chan must be a multiple of the lane tile")
    if chunk % tile_t:
        raise ValueError("chunk must be a multiple of tile_t")
    PER = P.shape[0]
    n_groups = M // lane_c
    n_t = chunk // tile_t
    rows_in = state_rows.shape[1]
    rows = (rows_in + 7) & ~7          # Mosaic: sublane dim multiple of 8
    st_pad = jnp.concatenate(
        [state_rows.astype(jnp.float32),
         jnp.zeros((n_groups, rows - rows_in, lane_c), jnp.float32)],
        axis=1) if rows != rows_in else state_rows.astype(jnp.float32)
    st2d = st_pad.reshape(n_groups * rows, lane_c)
    par = params_vec.astype(jnp.float32).reshape(8, 1)
    ramp = jnp.arange(tile_t, dtype=jnp.float32).reshape(tile_t, 1)
    # resample taps are STATIC (they depend only on the rate pair, which
    # is static config) — bake them as compile-time constants; Mosaic
    # miscompiles (opaque 500) when 36 SMEM scalar reads feed the big
    # interleave expression at T≥1008
    taps = tuple(float(v) for v in np.asarray(P, np.float64).reshape(-1))

    audio, st_out = pl.pallas_call(
        partial(_kernel, T=tile_t, C=lane_c, n_t=n_t, L=L, PER=PER,
                taps=taps, ssb=ssb, accum_pow=accum_pow),
        out_shape=(
            jax.ShapeDtypeStruct((chunk * L, M), audio_dtype),
            jax.ShapeDtypeStruct((n_groups * rows, lane_c), jnp.float32),
        ),
        grid=(n_groups, n_t),
        in_specs=[
            pl.BlockSpec((8, 1), lambda c, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_t, 1), lambda c, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, lane_c), lambda c, t: (t, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, lane_c), lambda c, t: (t, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, lane_c), lambda c, t: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_t * L, lane_c), lambda c, t: (t, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, lane_c), lambda c, t: (c, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, lane_c), jnp.float32),
        ],
        interpret=interpret,
    )(par, ramp, yT_r, yT_i, st2d)
    st_out = st_out.reshape(n_groups, rows, lane_c)[:, :rows_in, :]
    return audio, st_out
