"""Fused Pallas "chain tail": [passband FIR →] demod → DC → AGC → resample.

The entire back half of the receiver chain runs per VMEM tile in
TIME-MAJOR layout ([T, C] — time on sublanes, channels on lanes),
which makes every recurrence a sublane-shift problem:

  (optional, `_kernel_fir`) blocked-Toeplitz PASSBAND on the MXU with
  triple-buffered window DMAs — next tile's copy overlaps this tile's
  compute; windows read either 2-D [chunk, C] time-major planes or the
  channelizer's RAW [n1, chunk, n2] output directly (planar channel
  blocks live inside one k1 plane → the channelizer→tail coupling has
  ZERO transpose passes), in f32, bf16 (half-width coupling, the fast
  profile) or int16 (ADC/wire-format ingest, upstream kernel) →
  envelope |y| → DC block (first-order IIR via log-depth doubling
  scan) → AGC (peak tracker as a decayed cummax via doubling-max,
  kneed gain law, attack one-pole via a second doubling scan) →
  L× polyphase resample (shifted FMA per phase, phases stacked along
  sublanes so the audio interleave is a sublane reshape), plus an
  in-kernel Σ|y|² RSSI accumulator row (`accum_pow`).

Streaming state (DC x/y, AGC peak/gain, resample tail) lives in VMEM
scratch that persists across the sequential grid: tiles iterate
(channel-group outer, time inner), carries reset from the state inputs
at t==0 and write back to state outputs at the last tile — bit-exact
chunk chaining, same carry semantics as the XLA ops. The FIR precision
ladder matches the pipeline's: 1-pass bf16 or split-bf16 ×3 (~f32 —
the trick XLA folds away but Mosaic preserves).

Demodulators (r5): AM (envelope + DC block), SSB/CW (Re{y}), and NBFM
(quadrature discriminator via an in-kernel polynomial atan2 — Mosaic
has no atan2 primitive). The AGC hang window is fused as a
tile-granular block-max ring (effective window within [W, W+2·tile]).
Squelch stays outside the kernel but gates from the IN-KERNEL RSSI on
the time-major path, so none of the three reference controls forfeits
the fused tier anymore (VERDICT r4 items 3-5). The noise blanker is
not fused (callers keep the XLA path when NB is on). Measured context
costs and the triple-buffer lesson (the unbuffered fusion was SLOWER)
are in docs/PERFORMANCE.md.
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

# atan(t)/t ≈ Σ c_k (t²)^k on |t| ≤ √2−1 (half-angle-reduced range),
# near-minimax LSQ fit, poly error < 2.1e-8 — the f32 rounding floor
# dominates. Mosaic has no atan2 primitive (probed r5), so the NBFM
# discriminator evaluates this in-kernel.
_ATAN_C = (9.999999871192e-01, -3.333291434784e-01, 1.997836560818e-01,
           -1.389320141551e-01, 8.119900505293e-02)
_PI = 3.14159265358979323846


def _atan2(y, x):
    """Elementwise atan2 on [T, C] tiles (VPU: abs/min/max/div/sqrt/
    where + a degree-4 polynomial after half-angle range reduction).
    Max abs error ~2.4e-7 rad vs numpy (f32 epsilon scale)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    z = mn / jnp.maximum(mx, 1e-30)          # [0, 1]
    t = z / (1.0 + jnp.sqrt(1.0 + z * z))    # [0, √2−1]
    s = t * t
    p = _ATAN_C[4]
    for k in (3, 2, 1, 0):
        p = p * s + _ATAN_C[k]
    a = 2.0 * p * t
    a = jnp.where(ay > ax, 0.5 * _PI - a, a)
    a = jnp.where(x < 0, _PI - a, a)
    return jnp.where(y < 0, -a, a)


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


def _tail_core(yr, yi, t, par_ref, ramp_ref, audio_ref, st_out_ref, carry,
               *, T: int, C: int, L: int, PER: int, taps: tuple,
               demod: str, accum_pow: bool, wrs_ref=None,
               rs_dot3: bool = False, RB: int = 0, hang_tiles: int = 0,
               n_t: int = 1, st_rows_n: int = 0):
    """The demod→DC→AGC→resample tail math on one [T, C] tile of the
    passband planes (values, already in VMEM/registers).

    demod: "am" (envelope + DC block; carry rows 0/1 = DC state),
    "ssb" (Re{y}), or "nbfm" (quadrature discriminator via the
    in-kernel `_atan2`; carry rows 0/1 = previous complex sample, and
    par[0] carries fs/(2π·max_dev) instead of the AM DC pole).
    hang_tiles > 0: AGC hang — the peak used by the gain law is the max
    of the in-tile running peak and the previous `hang_tiles` tile
    maxima (carried in scratch rows; reset each chunk, matching the XLA
    `scans.sliding_max` left-edge −inf semantics at tile granularity).
    """
    r_dc = par_ref[0, 0]
    d = par_ref[1, 0]              # decay per sample (positive dB)
    thresh = par_ref[2, 0]
    slope = par_ref[3, 0]
    target = par_ref[4, 0]
    man_gain = par_ref[5, 0]
    agc_on = par_ref[6, 0]
    attack = par_ref[7, 0]

    if accum_pow:
        pw = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)   # [1, C]
        row = 4 + PER - 1

        @pl.when(t == 0)
        def _():
            carry[row: row + 1, :] = jnp.zeros_like(pw)
        carry[row: row + 1, :] += pw
    n_pows = _n_pows(T)
    if demod == "ssb":
        # USB/LSB/CW: the one-sided passband makes y analytic — audio is
        # the real part; no envelope, no DC block (demod_ssb semantics)
        audio0 = yr
    elif demod == "nbfm":
        # quadrature discriminator angle(y[n]·conj(y[n−1]))·scale
        # (demod_nbfm semantics); carry rows 0/1 hold the previous
        # complex sample across tiles/chunks, par[0] the ±1-at-±max_dev
        # scale fs/(2π·max_dev)
        prev_r = jnp.concatenate([carry[0:1, :], yr[:T - 1, :]], axis=0)
        prev_i = jnp.concatenate([carry[1:2, :], yi[:T - 1, :]], axis=0)
        dotp = yr * prev_r + yi * prev_i       # Re{y·conj(prev)}
        cross = yi * prev_r - yr * prev_i      # Im{y·conj(prev)}
        mag = jnp.abs(dotp) + jnp.abs(cross)
        # mute below the numerical floor (demod.NBFM_MUTE_FLOOR): the
        # angle there is denormal noise that differs across backends
        audio0 = jnp.where(mag > 1e-12, _atan2(cross, dotp) * r_dc, 0.0)
        carry[0:1, :] = yr[T - 1: T, :]
        carry[1:2, :] = yi[T - 1: T, :]
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

    peak_used = peak
    if hang_tiles > 0:
        # tile-granular hang: the sliding-window max over `hang_window`
        # samples is approximated by max(in-tile running max, previous
        # `hang_tiles` tile maxima) — an effective window within
        # [hang_tiles·T+1, (hang_tiles+1)·T] samples, i.e. never
        # shorter than the exact window and at most ~2 tiles longer
        # (tests bound the deviation against the XLA scans.sliding_max
        # at both window extremes). Ring rows live past the state rows
        # in the carry scratch; reset each chunk like the XLA
        # sliding-max's left-edge −inf padding.
        hang_on = par_ref[8, 0]
        R0 = st_rows_n
        KH = hang_tiles

        @pl.when(t == 0)
        def _():
            carry[R0: R0 + KH, :] = jnp.full((KH, C), -3.0e38,
                                             jnp.float32)
        m1 = _doubling_max(peak, T)          # in-tile running raw max
        hist = jnp.max(carry[R0: R0 + KH, :], axis=0, keepdims=True)
        held = jnp.maximum(m1, hist)
        peak_used = jnp.where(hang_on > 0, held, peak)
        for k in range(KH - 1):
            carry[R0 + k: R0 + k + 1, :] = \
                carry[R0 + k + 1: R0 + k + 2, :]
        carry[R0 + KH - 1: R0 + KH, :] = m1[T - 1: T, :]

        # state peak carries the HELD value at the chunk end (XLA
        # agc.apply stores the post-hang peak); intermediate tiles
        # chain the RAW peak so the decay ballistics match
        @pl.when(t == n_t - 1)
        def _():
            carry[2:3, :] = jnp.where(hang_on > 0, held[T - 1: T, :],
                                      peak[T - 1: T, :])

    # ---- kneed gain law (agc.apply semantics)
    max_gain = target - thresh
    above = (target - peak_used) + slope * ((peak_used - thresh)
                                            / jnp.maximum(-thresh, 1e-6))
    auto_gain = jnp.where(peak_used <= thresh, max_gain, above)
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

    # ---- L× polyphase resample: y[n·L + p] = Σ_m seg[n−(PER−1)+m]·P[m,p]
    seg = jnp.concatenate([carry[4: 4 + PER - 1, :], audio1], axis=0)
    carry[4: 4 + PER - 1, :] = audio1[T - (PER - 1): T, :]
    if wrs_ref is not None:
        # MXU form: per RB-sample block, out rows [L·RB, C] =
        # Wrs [L·RB, RB+PER−1] · seg window — the interleave rides the
        # matmul's row order (Wrs row n·L+p carries P[·, p] at offset n)
        dot = partial(jax.lax.dot_general,
                      dimension_numbers=(((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32)
        w = wrs_ref[:]
        for b in range(T // RB):
            z = seg[b * RB: b * RB + RB + PER - 1, :]
            if rs_dot3:
                def split(v):
                    hi = v.astype(jnp.bfloat16)
                    lo = (v.astype(jnp.float32)
                          - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    return hi, lo

                wh, wl = split(w)
                zh, zl = split(z)
                o = dot(wh, zh) + dot(wh, zl) + dot(wl, zh)
            else:
                o = dot(w.astype(jnp.bfloat16), z.astype(jnp.bfloat16))
            audio_ref[b * RB * L:(b + 1) * RB * L, :] = \
                o.astype(audio_ref.dtype)
        st_out_ref[:, :] = carry[0: st_rows_n, :] if hang_tiles \
            else carry[:, :]
        return
    # VPU form: per phase a PER-tap shifted FMA, interleave via a
    # sublane reshape (jnp.stack does not lower through Mosaic)
    phases = []
    for p in range(L):
        acc = None
        for m in range(PER):
            term = taps[m * L + p] * seg[m: m + T, :]
            acc = term if acc is None else acc + term
        phases.append(acc)
    out = jnp.concatenate([ph.reshape(T, 1, C) for ph in phases],
                          axis=1).reshape(T * L, C)
    audio_ref[:] = out.astype(audio_ref.dtype)
    st_out_ref[:, :] = carry[0: st_rows_n, :] if hang_tiles \
        else carry[:, :]


def _kernel(par_ref, ramp_ref, yr_ref, yi_ref, st_in_ref,
            audio_ref, st_out_ref, carry, *, T: int, C: int, n_t: int,
            L: int, PER: int, taps: tuple, demod: str,
            accum_pow: bool = False, hang_tiles: int = 0,
            st_rows_n: int = 0):
    """Grid (c_group, t): par_ref [9,1] SMEM scalars
    (r_dc | nbfm_scale, decay_d, thresh, slope, target, man_gain,
    agc_on, attack, hang_on);
    ramp_ref [T, 1] iota ramp; yr/yi [T, C] passband planes;
    audio [T·L, C]; st_in/st_out per-group stream state rows:
      0 dc_x, 1 dc_y, 2 peak_db, 3 gain_db, 4.. resample tail (PER-1),
      then (accum_pow) one per-chunk Σ|y|² accumulator row — the
      passband power the XLA path reads back for RSSI, folded here so
      the wideband pipeline never re-reads y from HBM.
    carry: VMEM scratch persisted across the t dimension.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry[0: st_rows_n, :] = st_in_ref[:, :]

    _tail_core(yr_ref[:], yi_ref[:], t, par_ref, ramp_ref, audio_ref,
               st_out_ref, carry, T=T, C=C, L=L, PER=PER, taps=taps,
               demod=demod, accum_pow=accum_pow, hang_tiles=hang_tiles,
               n_t=n_t, st_rows_n=st_rows_n)


def _kernel_fir(par_ref, ramp_ref, w2_ref, *args, T: int, C: int,
                n_t: int, L: int, PER: int, taps: tuple, demod: str,
                accum_pow: bool, B: int, n_prev: int, dot3: bool,
                RB: int = 0, rs_dot3: bool = False,
                hang_tiles: int = 0, st_rows_n: int = 0,
                fir_real: bool = False):
    if RB:
        (wrs_ref, pbh_r_ref, pbh_i_ref, xr_ref, xi_ref, st_in_ref,
         audio_ref, st_out_ref, carry, win_r, win_i, y_r, y_i,
         sems) = args
    else:
        wrs_ref = None
        (pbh_r_ref, pbh_i_ref, xr_ref, xi_ref, st_in_ref,
         audio_ref, st_out_ref, carry, win_r, win_i, y_r, y_i,
         sems) = args
    """Tail kernel with the Toeplitz PASSBAND fused in front: the
    standalone time-major FIR matmul materialized a [2·2B, C]-per-block
    window buffer (2× the stream) AND round-tripped y through HBM —
    ~3 ms in context at the bench shape. Here each tile DMAs its raw
    channelizer rows once, assembles windows in VMEM (history rows ride
    a scratch self-copy between sequential t-steps), runs the
    [4B, 2B]ᵀ·[4B, C] block dots on the MXU, and feeds the y tile
    straight into the tail math — y never touches HBM.

    w2_ref: [4B, 2B] fir_matmul.build_w_free(B, 1, taps) matrix.
    pbh_*: [B, C] head rows (zeros | carry) for tile 0.
    xr/xi: full [chunk, M] planes in ANY memory (windows DMA'd).
    """
    c = pl.program_id(0)
    t = pl.program_id(1)
    n_slots = 3
    PH = n_prev * B        # history rows per window buffer
    W = (n_prev + 1) * B   # window span per FIR block

    @pl.when(t == 0)
    def _():
        carry[0: st_rows_n, :] = st_in_ref[:, :]

    def x_dma(tt, slot):
        """Async copy of x tile `tt` into window slot `slot` rows
        [B, B+T); descriptors are recreated identically to wait.

        2-D src: [chunk, M] time-major planes, m-order lane groups.
        3-D src (planar coupling): the channelizer's raw [n1, chunk, n2]
        planes — lane group c covers planar channels c·C..(c+1)·C,
        i.e. plane k1 = c·C//n2, columns (c·C) mod n2 .. +C."""
        rows = pl.ds(pl.multiple_of(tt * T, 8), T)
        if len(xr_ref.shape) == 3:
            n2 = xr_ref.shape[2]
            q = n2 // C
            k1 = c // q
            o = pl.multiple_of((c % q) * C, 128)
            src_r = xr_ref.at[k1, rows, pl.ds(o, C)]
            src_i = xi_ref.at[k1, rows, pl.ds(o, C)]
        else:
            lanes = pl.ds(pl.multiple_of(c * C, 128), C)
            src_r = xr_ref.at[rows, lanes]
            src_i = xi_ref.at[rows, lanes]
        d_r = pltpu.make_async_copy(src_r, win_r.at[slot, pl.ds(PH, T), :],
                                    sems.at[slot, 0])
        d_i = pltpu.make_async_copy(src_i, win_i.at[slot, pl.ds(PH, T), :],
                                    sems.at[slot, 1])
        return d_r, d_i

    # TRIPLE-buffered windows: tile t's DMA was started in step t−1;
    # wait for it, kick off t+1's into slot (t+1)%3, then compute — the
    # copy overlaps the FIR matmuls + tail math of this step. Three
    # slots keep the in-flight DMA target, this tile's buffer, and the
    # previous tile (whose tail provides this tile's history rows)
    # pairwise distinct — no DMA-vs-vector ordering hazards.
    slot = jax.lax.rem(t, n_slots)
    nslot = jax.lax.rem(t + 1, n_slots)
    pslot = jax.lax.rem(t + n_slots - 1, n_slots)

    @pl.when(t == 0)
    def _():
        d_r, d_i = x_dma(t, slot)
        d_r.start()
        d_i.start()
    d_r, d_i = x_dma(t, slot)
    d_r.wait()
    d_i.wait()

    @pl.when(t + 1 < n_t)
    def _():
        d_r, d_i = x_dma(t + 1, nslot)
        d_r.start()
        d_i.start()

    # history rows for THIS slot: tile 0 head from the state/head input,
    # else the previous slot's x-tile tail
    @pl.when(t == 0)
    def _():
        win_r[slot, 0:PH, :] = pbh_r_ref[:, :].astype(win_r.dtype)
        win_i[slot, 0:PH, :] = pbh_i_ref[:, :].astype(win_i.dtype)

    @pl.when(t > 0)
    def _():
        win_r[slot, 0:PH, :] = win_r[pslot, T: T + PH, :]
        win_i[slot, 0:PH, :] = win_i[pslot, T: T + PH, :]

    # ---- blocked Toeplitz passband on the MXU
    dot = partial(jax.lax.dot_general,
                  dimension_numbers=(((0,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32)

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v.astype(jnp.float32)
              - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def fdot(w, z):
        if dot3:
            # ~f32: manual split-bf16 ×3 (see channelize_fused stage B —
            # Mosaic's MXU rounds f32 operands to bf16, and nothing
            # folds the convert round-trip away, so the split holds).
            # Requires f32 windows (a bf16 source has no lo plane).
            wh, wl = split(w)
            zh, zl = split(z)
            return dot(wh, zh) + dot(wh, zl) + dot(wl, zh)
        return dot(w.astype(jnp.bfloat16), z.astype(jnp.bfloat16))

    for b in range(T // B):
        w2 = w2_ref[:]
        if fir_real:
            # real symmetric-passband taps: y.re/y.im filter separately
            # with the [W, B] real matrix — HALF the complex form's MACs
            y_r[b * B:(b + 1) * B, :] = \
                fdot(w2, win_r[slot, b * B: b * B + W, :])
            y_i[b * B:(b + 1) * B, :] = \
                fdot(w2, win_i[slot, b * B: b * B + W, :])
        else:
            z = jnp.concatenate([win_r[slot, b * B: b * B + W, :],
                                 win_i[slot, b * B: b * B + W, :]],
                                axis=0)
            o = fdot(w2, z)
            y_r[b * B:(b + 1) * B, :] = o[:B]
            y_i[b * B:(b + 1) * B, :] = o[B:]

    _tail_core(y_r[:], y_i[:], t, par_ref, ramp_ref, audio_ref,
               st_out_ref, carry, T=T, C=C, L=L, PER=PER, taps=taps,
               demod=demod, accum_pow=accum_pow, wrs_ref=wrs_ref,
               rs_dot3=rs_dot3, RB=RB, hang_tiles=hang_tiles,
               n_t=n_t, st_rows_n=st_rows_n)


def chain_tail_am(yT_r: jax.Array, yT_i: jax.Array, state_rows: jax.Array,
                  params_vec: jax.Array, P: jax.Array, *,
                  tile_t: int = 1024, lane_c: int = 128, L: int = 4,
                  demod: str = "am", interpret: bool = False,
                  accum_pow: bool = False, audio_dtype=jnp.float32,
                  fir: dict | None = None, hang_window: int = 0
                  ) -> tuple[jax.Array, jax.Array]:
    """Run the fused AM tail.

    yT_r/yT_i:  [chunk, n_chan] transposed passband planes. With `fir`
                these carry the PRE-passband (channelizer) planes
                instead, consumed from ANY memory via window DMAs —
                pass them through fir["x_r"]/fir["x_i"] and give
                yT_r/yT_i the same arrays (shape source only).
    fir:        fuse the Toeplitz passband in front (keys: w2 [4B, 2B]
                from fir_matmul.build_w_free(B, 1, taps); head_r/head_i
                [B, n_chan] tile-0 history rows; x_r/x_i [chunk,
                n_chan]; B int; dot3 bool for the ~f32 split-bf16 dot).
    state_rows: [n_groups, 4 + PER − 1 (+1 with accum_pow), lane_c]
                stream state (rows: dc_x, dc_y, peak_db, gain_db,
                resample tail[PER−1], then the Σ|y|² accumulator row —
                per-chunk scratch, reset at t==0, valid on OUTPUT only)
    params_vec: [9] f32 (r_dc | nbfm_scale, decay/sample, thresh,
                slope, target, man_gain, agc_on, attack, hang_on);
                a length-8 vector is padded with hang_on = 0
    demod:      "am", "ssb" or "nbfm" (see _tail_core)
    hang_window: AGC hang window in samples (0/1 = off): fused as a
                tile-granular block-max ring (see _tail_core; window
                deviation ≤ ~2 tiles, bounded by tests)
    P:          [PER, L] polyphase matrix (resample.plan_interp)
    audio_dtype: output plane dtype — float16/bfloat16 halve the audio
                HBM write (the largest buffer the pipeline touches);
                gate the quantization on the bench oracle SNR.
    Returns (audioT [chunk·L, n_chan], new_state_rows).
    """
    if fir is not None and fir["x_r"].ndim == 3:
        n1_, chunk, n2_ = fir["x_r"].shape
        M = n1_ * n2_
        if n2_ % lane_c:
            raise ValueError("planar source needs n2 % lane_c == 0")
    else:
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
    if params_vec.shape[0] == 8:       # legacy callers: hang_on = 0
        params_vec = jnp.concatenate(
            [params_vec, jnp.zeros(1, params_vec.dtype)])
    par = params_vec.astype(jnp.float32).reshape(9, 1)
    ramp = jnp.arange(tile_t, dtype=jnp.float32).reshape(tile_t, 1)
    hang_tiles = (-(-(hang_window - 1) // tile_t)
                  if hang_window and hang_window > 1 else 0)
    scr_rows = rows + ((hang_tiles + 7) & ~7 if hang_tiles else 0)
    # resample taps are STATIC (they depend only on the rate pair, which
    # is static config) — bake them as compile-time constants; Mosaic
    # miscompiles (opaque 500) when 36 SMEM scalar reads feed the big
    # interleave expression at T≥1008
    taps = tuple(float(v) for v in np.asarray(P, np.float64).reshape(-1))

    if fir is not None:
        B = fir["B"]
        n_prev = fir["n_prev"]
        PH = n_prev * B
        RB = fir.get("rs_block", 0)
        wrs_in = []
        wrs_specs = []
        if RB:
            if tile_t % RB:
                raise ValueError("rs_block must divide the tail tile")
            # Wrs[n·L+p, s] = P[s−n, p] — the audio interleave rides the
            # matmul's output row order (ops/resample.plan_interp taps)
            S = RB + PER - 1
            Wrs = np.zeros((L * RB, S), np.float32)
            for n in range(RB):
                for pph in range(L):
                    for m in range(PER):
                        Wrs[n * L + pph, n + m] = taps[m * L + pph]
            wrs_in = [jnp.asarray(Wrs)]
            wrs_specs = [pl.BlockSpec((L * RB, S), lambda c, t: (0, 0),
                                      memory_space=pltpu.VMEM)]
        audio, st_out = pl.pallas_call(
            partial(_kernel_fir, T=tile_t, C=lane_c, n_t=n_t, L=L,
                    PER=PER, taps=taps, demod=demod, accum_pow=accum_pow,
                    B=B, n_prev=n_prev, dot3=fir["dot3"], RB=RB,
                    rs_dot3=fir.get("rs_dot3", False),
                    hang_tiles=hang_tiles, st_rows_n=rows,
                    fir_real=fir.get("real", False)),
            out_shape=(
                jax.ShapeDtypeStruct((chunk * L, M), audio_dtype),
                jax.ShapeDtypeStruct((n_groups * rows, lane_c),
                                     jnp.float32),
            ),
            grid=(n_groups, n_t),
            in_specs=[
                pl.BlockSpec((8, 1), lambda c, t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_t, 1), lambda c, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tuple(fir["w2"].shape),
                             lambda c, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + wrs_specs + [
                pl.BlockSpec((PH, lane_c), lambda c, t: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PH, lane_c), lambda c, t: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
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
                pltpu.VMEM((scr_rows, lane_c), jnp.float32),
                pltpu.VMEM((3, PH + tile_t, lane_c), fir["x_r"].dtype),
                pltpu.VMEM((3, PH + tile_t, lane_c), fir["x_r"].dtype),
                pltpu.VMEM((tile_t, lane_c), jnp.float32),
                pltpu.VMEM((tile_t, lane_c), jnp.float32),
                pltpu.SemaphoreType.DMA((3, 2)),
            ],
            interpret=interpret,
        )(par, ramp, fir["w2"], *wrs_in, fir["head_r"], fir["head_i"],
          fir["x_r"], fir["x_i"], st2d)
        st_out = st_out.reshape(n_groups, rows, lane_c)[:, :rows_in, :]
        return audio, st_out

    audio, st_out = pl.pallas_call(
        partial(_kernel, T=tile_t, C=lane_c, n_t=n_t, L=L, PER=PER,
                taps=taps, demod=demod, accum_pow=accum_pow,
                hang_tiles=hang_tiles, st_rows_n=rows),
        out_shape=(
            jax.ShapeDtypeStruct((chunk * L, M), audio_dtype),
            jax.ShapeDtypeStruct((n_groups * rows, lane_c), jnp.float32),
        ),
        grid=(n_groups, n_t),
        in_specs=[
            pl.BlockSpec((9, 1), lambda c, t: (0, 0),
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
            pltpu.VMEM((scr_rows, lane_c), jnp.float32),
        ],
        interpret=interpret,
    )(par, ramp, yT_r, yT_i, st2d)
    st_out = st_out.reshape(n_groups, rows, lane_c)[:, :rows_in, :]
    return audio, st_out
