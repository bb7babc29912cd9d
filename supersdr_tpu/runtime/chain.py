"""Receiver chain: the complete IQ→audio demodulation program.

This is the TPU-native replacement for the KiwiSDR server-side DSP the
reference only *controls* (channel selection, passband filtering,
demodulation, AGC — SURVEY.md §0): one pure jittable function

    process(params, state, iq_chunk) -> (state, ChainOutput)

composing  NCO mix → overlap-save passband filter → demodulator → AGC →
polyphase resample to the audio rate.  Design points:

* Chunk size is static but arbitrary: 512 samples for low-latency
  streaming, 2^18+ for offline/wideband throughput — the same program, one
  trace per shape. Internally the passband filter runs as *batched*
  overlap-save over `os_block`-sized rows (one big FFT batch, no serial
  per-block loop), and every recurrence (DC block, AGC tracking) is an
  associative scan, so a whole chunk evaluates with no sequential
  sample-rate dependency anywhere.
* All tuning (frequency, passband taps, AGC settings) is runtime data —
  retuning never retraces.
* State (NCO phase, filter history, demod memory, AGC level, resampler
  tail) is an explicit pytree; consecutive chunks are sample-exact
  continuous, and the whole chain vmaps over a leading channel axis for
  multi-receiver operation (the generalization of the reference's dual-RX,
  supersdr.py:624-639).

Reference control surface being reproduced: `SET mod=… low_cut=… high_cut=…
freq=…` and `SET agc=…` (utils_supersdr.py:976-980,1022-1029).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from supersdr_tpu.ops import agc as agc_ops
from supersdr_tpu.ops import cx
from supersdr_tpu.ops import demod as demod_ops
from supersdr_tpu.ops import fir_matmul, firdesign, mixer, overlap_save, \
    passband, resample
from supersdr_tpu.ops import smeter
from supersdr_tpu.ops import squelch as squelch_ops


@dataclass(frozen=True)
class ChainConfig:
    """Static chain structure (hashable; changing any field retraces)."""
    mode: str = "AM"
    iq_rate: int = 12000
    audio_rate: int = 48000
    chunk: int = 2048          # IQ samples per process() call
    os_block: int = 2048       # internal overlap-save row length
    n_taps: int = 513          # fixed passband FIR budget (odd)
    hang_ms: float = 500.0
    hang_enabled: bool = False  # static: compile the hang sliding-max in
    agc_decimation: int = 1     # static: AGC ballistics decimation (perf)
    max_dev_hz: float = 5000.0  # NBFM deviation full-scale
    blanker_enabled: bool = False  # static: compile the noise blanker in
                                   # (its median = a device sort; never pay
                                   # for it when NB is off)
    squelch_enabled: bool = False  # static: compile the squelch gate in
                                   # (its ramp/multiply passes cost real
                                   # HBM on wideband audio; like the
                                   # blanker, toggling retraces — the
                                   # thresh/hyst stay runtime data)
    nco_enabled: bool = True    # static: False skips the mixer pass when
                                # the input is already channel-centered
                                # (PFB output — offsets structurally 0)
    passband_impl: str = "fft"  # static: "fft" = overlap-save FFT,
                                # "matmul" = blocked-Toeplitz MXU FIR
                                # (ops/fir_matmul.py; A/B'd on-chip in
                                # docs/PERFORMANCE.md)
    passband_precision: str = "highest"  # matmul impl only: "highest"
                                # (6-pass bf16, ~f32-exact), "high"
                                # (3-pass, ~98 dB) or "default"
                                # (1-pass bf16); gate on oracle SNR
    resample_impl: str = "einsum"  # "einsum" (stacked frames → MXU),
                                # "fma" (broadcast FMA chain), or "matmul"
                                # (blocked-Toeplitz interleaving matmul —
                                # full-lane layouts, ops/resample.py);
                                # identical outputs, A/B'd on-chip
    resample_precision: str = "highest"  # matmul resampler precision
                                # (same ladder as passband_precision)
    tail_impl: str = "xla"      # "pallas": fuse demod+DC+AGC+resample
                                # into one Mosaic kernel
                                # (ops/pallas/chain_tail.py). Static
                                # requirements — AM/USB/LSB/CW/NBFM,
                                # integer upsample, 1-D batch ≥ 128, a
                                # chunk tile ≤ 1008 — fall back to the
                                # XLA path otherwise. Hang is fused as
                                # a tile-granular block-max ring; the
                                # squelch gate applies at the audio
                                # rate (identical when disabled — the
                                # default; same time-constant when on)

    def __post_init__(self):
        if self.chunk % self.os_block:
            raise ValueError("chunk must be a multiple of os_block")
        if self.n_taps % 2 == 0:
            raise ValueError("n_taps must be odd")
        if self.passband_impl not in ("fft", "fftmxu", "matmul",
                                      "matmul_real"):
            raise ValueError("passband_impl must be 'fft', 'fftmxu', "
                             "'matmul' or 'matmul_real'")
        if self.passband_impl == "fftmxu" and self.chunk != self.os_block:
            raise ValueError("passband_impl='fftmxu' runs one overlap-save"
                             " row per chunk (os_block must equal chunk)")
        if self.audio_rate % self.iq_rate:
            _, M = self.resample_LM
            if self.chunk % M:
                raise ValueError(
                    f"rational resampling {self.iq_rate}->{self.audio_rate} "
                    f"needs chunk % {M} == 0 (got chunk={self.chunk}); e.g. "
                    f"20250->48000 is L/M=32/13.5 -> 64/27 after gcd")

    @property
    def os_plan(self) -> overlap_save.OSPlan:
        return overlap_save.plan_for(self.os_block, self.n_taps)

    @property
    def fir_plan(self) -> fir_matmul.FIRMatmulPlan:
        return fir_matmul.plan_for(self.chunk, self.n_taps)

    @property
    def is_rational(self) -> bool:
        """True when audio_rate / iq_rate is not an integer (e.g. the
        reference's 20.25 kHz 3-channel kiwis → 48 kHz,
        /root/reference/utils_supersdr.py:1126)."""
        return self.audio_rate % self.iq_rate != 0

    @property
    def resample_LM(self) -> tuple[int, int]:
        g = int(np.gcd(self.iq_rate, self.audio_rate))
        return self.audio_rate // g, self.iq_rate // g

    @property
    def upsample(self) -> int:
        if self.is_rational:
            raise ValueError("non-integer rate ratio; use resample_LM")
        return self.audio_rate // self.iq_rate

    @property
    def audio_chunk(self) -> int:
        """Audio samples produced per process() call."""
        L, M = self.resample_LM
        return self.chunk * L // M

    @property
    def hang_window(self) -> int:
        if not self.hang_enabled:
            return 1
        return agc_ops.hang_samples(self.iq_rate, self.hang_ms)

    @property
    def interp_plan(self) -> resample.InterpPlan:
        plan, _ = resample.design_interp(self.iq_rate, self.audio_rate)
        return plan

    @property
    def interp_matmul_plan(self) -> resample.InterpMatmulPlan:
        return resample.plan_interp_matmul(self.interp_plan, self.chunk)

    @property
    def rational_plan(self) -> resample.RationalPlan:
        plan, _ = resample.plan_rational(self.iq_rate, self.audio_rate)
        return plan


class ChainParams(NamedTuple):
    """Runtime tuning (a pytree of arrays; swap freely without retracing).

    All complex quantities are split-complex `cx.CX` float pairs: the TPU
    runtime rejects complex64 buffers at program boundaries (VERDICT r1),
    and params cross that boundary on every dispatch.
    """
    nco: mixer.NCOParams
    H_pass: cx.CX              # [fft_size] split-complex passband response
    P_interp: jax.Array        # [per, L] polyphase interpolation matrix
    agc: agc_ops.AGCParams
    squelch: squelch_ops.SquelchParams
    blanker: squelch_ops.BlankerParams
    W_pass: jax.Array | None = None  # [2·window, 2·block] Toeplitz matmul
                                     # matrix (passband_impl="matmul"), or
                                     # [window, block] real prototype matrix
                                     # (passband_impl="matmul_real")
    rot_in: cx.CX | None = None      # matmul_real: e^{-jωn} input rotation
                                     # [chunk] (None when the passband is
                                     # symmetric — ω snapped to fs/chunk)
    rot_out: cx.CX | None = None     # matmul_real: e^{+jω(n-c)} output
                                     # rotation [chunk]
    W_interp: jax.Array | None = None  # [window, L·block_in] blocked-
                                     # Toeplitz interpolation matrix
                                     # (resample_impl="matmul")
    mode_id: jax.Array | None = None  # [*batch] int32 per-slot demod
                                     # select (cfg.mode == "MULTI" only;
                                     # ops/demod.MODE_IDS)
    W_tailpass: jax.Array | None = None  # [4B, 2B] Toeplitz matrix for
                                     # the passband FUSED INTO the
                                     # Pallas tail kernel (time-major
                                     # wideband path; B =
                                     # fir_matmul.tail_fir_block)


class ChainState(NamedTuple):
    phase: jax.Array
    os_carry: cx.CX            # split-complex filter history
    demod: demod_ops.DemodState
    agc: agc_ops.AGCState
    interp_carry: jax.Array
    squelch: squelch_ops.SquelchState


class ChainOutput(NamedTuple):
    audio: jax.Array     # [*batch, chunk * upsample] float32 at audio_rate
                         # (IQ mode: split-complex cx.CX baseband instead)
    rssi: jax.Array      # [*batch, chunk/os_block] per-row RSSI dB
    baseband: cx.CX      # [*batch, chunk] passband-filtered split-complex


def make_params(cfg: ChainConfig,
                freq_offset_hz: float | np.ndarray = 0.0,
                delta_low: float = 0.0, delta_high: float = 0.0,
                low_cut: float | None = None,
                high_cut: float | None = None,
                agc_kwargs: dict | None = None,
                squelch_kwargs: dict | None = None,
                blanker_kwargs: dict | None = None) -> ChainParams:
    """Host-side parameter build (float64 design, device float32 results).

    `freq_offset_hz` is the receiver offset within the incoming IQ span
    (0 for an already-centered capture). Passband defaults follow the
    app-level mode conventions unless explicit cuts are given.
    """
    if low_cut is None or high_cut is None:
        lc, hc = passband.supersdr_passband(cfg.mode, delta_low, delta_high)
    else:
        lc, hc = low_cut, high_cut
    plan = cfg.os_plan
    taps = firdesign.complex_bandpass_taps(lc, hc, cfg.iq_rate, n=cfg.n_taps)
    H = overlap_save.taps_to_freq(plan, taps)
    W_interp = None
    if cfg.is_rational:
        # P_interp carries the rational-resampler prototype taps instead
        # of a polyphase matrix (resample_poly semantics, utils:1126)
        _, P = resample.plan_rational(cfg.iq_rate, cfg.audio_rate)
    else:
        itaps = firdesign.lowpass_taps(cfg.iq_rate / 2, cfg.audio_rate)
        _, P = resample.plan_interp(cfg.upsample, itaps)
        if cfg.resample_impl == "matmul":
            W_interp = resample.build_w_interp(cfg.interp_matmul_plan, itaps)
    nco = mixer.NCOParams.make(-np.asarray(freq_offset_hz, np.float64),
                               cfg.iq_rate, cfg.chunk)
    agc_p = agc_ops.make_params(cfg.iq_rate, **(agc_kwargs or {}))
    W_pass, rot_in, rot_out = None, None, None
    if cfg.passband_impl == "matmul":
        W_pass = fir_matmul.build_w(cfg.fir_plan, taps)
    elif cfg.passband_impl == "matmul_real":
        # modulated-prototype form: filter the basebanded stream with the
        # REAL lowpass prototype (half the matmul FLOPs), rotating in/out
        # by e^{∓jωn}. ω is snapped to the fs/chunk grid (≤ fs/2chunk Hz
        # error) so the rotation vectors are chunk-periodic and streaming
        # needs no phase state; ω = 0 (symmetric passband, e.g. AM)
        # statically drops the rotations entirely.
        center = 0.5 * (lc + hc)
        half_width = 0.5 * (hc - lc)
        grid = cfg.iq_rate / cfg.chunk
        center_s = round(center / grid) * grid
        proto = firdesign.lowpass_taps_n(half_width, cfg.iq_rate, cfg.n_taps)
        W_pass = fir_matmul.build_w_real(cfg.fir_plan, proto)
        if center_s != 0.0:
            w = 2.0 * np.pi * center_s / cfg.iq_rate
            ns = np.arange(cfg.chunk)
            c = (cfg.n_taps - 1) / 2.0
            rot_in = cx.CX(jnp.asarray(np.cos(-w * ns), jnp.float32),
                           jnp.asarray(np.sin(-w * ns), jnp.float32))
            rot_out = cx.CX(jnp.asarray(np.cos(w * (ns - c)), jnp.float32),
                            jnp.asarray(np.sin(w * (ns - c)), jnp.float32))
    W_tailpass = None
    if cfg.passband_impl == "matmul" and not cfg.is_rational:
        bn = fir_matmul.tail_fir_block(cfg.chunk, cfg.n_taps,
                                       _tail_tile(cfg.chunk, cfg.n_taps))
        if bn is not None:
            B, n_prev = bn
            if fir_matmul.taps_are_real(taps):
                # symmetric passband (AM/NBFM defaults): the complex-
                # folded matrix is block-diagonal with zero off-blocks —
                # the REAL [W, B] form halves the in-kernel FIR MACs
                # (r5 quality-gap work, docs/PERFORMANCE.md)
                W_tailpass = jnp.asarray(
                    fir_matmul.build_w_free_real(B, n_prev, taps))
            else:
                W_tailpass = jnp.asarray(
                    fir_matmul.build_w_free(B, n_prev, taps))
    return ChainParams(nco=nco, H_pass=H, P_interp=jnp.asarray(P, jnp.float32),
                       agc=agc_p,
                       squelch=squelch_ops.make_squelch(**(squelch_kwargs or {})),
                       blanker=squelch_ops.make_blanker(**(blanker_kwargs or {})),
                       W_pass=W_pass, rot_in=rot_in, rot_out=rot_out,
                       W_interp=W_interp, W_tailpass=W_tailpass)


def init_state(cfg: ChainConfig, batch_shape: tuple[int, ...] = ()
               ) -> ChainState:
    plan = cfg.os_plan
    if cfg.is_rational:
        icarry = jnp.zeros(batch_shape + (cfg.rational_plan.history,),
                           jnp.float32)
    else:
        icarry = resample.init_carry(cfg.interp_plan, batch_shape)
    return ChainState(
        phase=mixer.init_phase(batch_shape),
        os_carry=overlap_save.init_carry(plan, batch_shape),
        demod=demod_ops.init_state(batch_shape),
        agc=agc_ops.init_state(batch_shape),
        interp_carry=icarry,
        squelch=squelch_ops.init_squelch(batch_shape),
    )


def _tail_tile(chunk: int, n_taps: int | None = None) -> int:
    """Chunk divisor ≤ 1008, multiple of 8 (Mosaic miscompiles the fused
    tail above ~1008 sublanes). With `n_taps`, prefer the tile whose
    minimal in-tail FIR block B is smallest (FIR FLOPs scale with B:
    the T=768/B=256 pairing measured 7.25 ms vs 7.55 for T=1008/B=336
    at the bench shape), breaking ties toward the larger tile."""
    cands = [t for t in range(8, 1009, 8) if chunk % t == 0]
    if not cands:
        return 0
    if n_taps is None:
        return cands[-1]
    best = None
    for t in cands:
        bn = fir_matmul.tail_fir_block(chunk, n_taps, t)
        flops = (bn[1] + 1) * bn[0] if bn is not None else 1 << 30
        key = (flops, -t)
        if best is None or key < best[0]:
            best = (key, t)
    return best[1]


def _pallas_tail_ok(cfg: ChainConfig, batch: tuple) -> bool:
    # batches ≥128 that aren't lane multiples (e.g. a mesh shard of
    # 2560/8 = 320 channels) run with the channel axis zero-padded to
    # the next multiple of 128; smaller batches take the XLA path (the
    # padding waste would dominate, and small configs are cheap there).
    # Since r5 NBFM (in-kernel atan2 discriminator) and the AGC hang
    # (tile-granular block-max ring) are fused too — enabling them no
    # longer forfeits the fast tier (VERDICT r4 #3/#5); agc_decimation
    # stays an XLA-only perf knob.
    return (cfg.mode.upper() in ("AM", "USB", "LSB", "CW", "NBFM")
            and not cfg.is_rational
            and cfg.agc_decimation == 1
            and len(batch) == 1 and batch[0] >= 128
            and _tail_tile(cfg.chunk, cfg.n_taps) >= 8)


def _tail_demod(cfg: ChainConfig) -> str:
    m = cfg.mode.upper()
    return {"AM": "am", "USB": "ssb", "LSB": "ssb", "CW": "ssb",
            "NBFM": "nbfm"}[m]


def _tail_params_vec(params: ChainParams, cfg: ChainConfig | None = None
                     ) -> jax.Array:
    ag = params.agc
    # slot 0 is demod-dependent: the AM DC pole, or (NBFM) the
    # discriminator scale fs/(2π·max_dev) — demod_nbfm semantics
    if cfg is not None and cfg.mode.upper() == "NBFM":
        slot0 = jnp.asarray(cfg.iq_rate
                            / (2.0 * np.pi * cfg.max_dev_hz), jnp.float32)
    else:
        slot0 = jnp.asarray(0.999, jnp.float32)
    return jnp.stack([
        slot0,
        jnp.asarray(ag.decay_per_sample_db, jnp.float32),
        jnp.asarray(ag.thresh_db, jnp.float32),
        jnp.asarray(ag.slope_db, jnp.float32),
        jnp.asarray(ag.target_db, jnp.float32),
        jnp.asarray(ag.man_gain_db, jnp.float32),
        jnp.asarray(ag.on, jnp.float32),
        jnp.asarray(ag.attack_coeff, jnp.float32),
        jnp.asarray(ag.hang, jnp.float32),           # runtime hang flag
    ])


def _process_tail_pallas(cfg: ChainConfig, params: ChainParams,
                         state: ChainState, phase, y, y_rows, rssi,
                         os_carry) -> tuple["ChainState", "ChainOutput"]:
    """Fused back half: ops/pallas/chain_tail.py. State packing mirrors
    the XLA ops exactly, so chunks chain bit-compatibly across impl
    switches (same ChainState pytree)."""
    from supersdr_tpu.ops.pallas import chain_tail
    import numpy as _np

    C = y.shape[0]
    Cp = -(-C // 128) * 128            # lane-padded channel count
    G = Cp // 128
    PER = cfg.interp_plan.per
    rows = 4 + (PER - 1)
    params_vec = _tail_params_vec(params, cfg)
    _, P = resample.plan_interp(
        cfg.upsample, firdesign.lowpass_taps(cfg.iq_rate / 2,
                                             cfg.audio_rate))

    def cpad(a):
        # zero-pad the channel axis (axis 0) to the lane multiple
        if Cp == C:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((Cp - C,) + a.shape[1:], a.dtype)], axis=0)

    nbfm = cfg.mode.upper() == "NBFM"
    # carry rows 0/1 are demod-dependent: AM DC state, or (NBFM) the
    # previous complex sample (demod.last_sample)
    r0 = state.demod.last_sample.re if nbfm else state.demod.dc_x
    r1 = state.demod.last_sample.im if nbfm else state.demod.dc_y
    st_rows = jnp.concatenate([
        cpad(r0).reshape(G, 1, 128),
        cpad(r1).reshape(G, 1, 128),
        cpad(state.agc.peak_db).reshape(G, 1, 128),
        cpad(state.agc.gain_db).reshape(G, 1, 128),
        jnp.swapaxes(cpad(state.interp_carry).reshape(G, 128, PER - 1),
                     1, 2),
    ], axis=1)
    yTr = cpad(jnp.real(y)).T            # [chunk, Cp]
    yTi = cpad(jnp.imag(y)).T
    interpret = jax.default_backend() not in ("tpu", "axon")
    audioT, st2 = chain_tail.chain_tail_am(
        yTr, yTi, st_rows, params_vec,
        _np.asarray(P), tile_t=_tail_tile(cfg.chunk, cfg.n_taps), L=cfg.upsample,
        demod=_tail_demod(cfg), interpret=interpret,
        hang_window=(cfg.hang_window if cfg.hang_enabled else 0))
    audio = audioT.T[:C]                              # [C, chunk·L]

    # squelch gate at the audio rate (statically compiled out when off,
    # like the serial path); when enabled the ramp is rescaled so its
    # duration in seconds matches the serial 12 kHz gate
    if cfg.squelch_enabled:
        sq = params.squelch._replace(ramp=params.squelch.ramp
                                     / float(cfg.upsample))
        sq_state, audio = squelch_ops.apply_squelch(
            sq, state.squelch, audio, jnp.mean(rssi, axis=-1))
    else:
        sq_state = state.squelch

    o0 = st2[:, 0, :].reshape(Cp)[:C]
    o1 = st2[:, 1, :].reshape(Cp)[:C]
    if nbfm:
        dstate = demod_ops.DemodState(last_sample=cx.CX(o0, o1),
                                      dc_x=state.demod.dc_x,
                                      dc_y=state.demod.dc_y)
    else:
        dstate = demod_ops.DemodState(
            last_sample=state.demod.last_sample, dc_x=o0, dc_y=o1)
    astate = agc_ops.AGCState(peak_db=st2[:, 2, :].reshape(Cp)[:C],
                              gain_db=st2[:, 3, :].reshape(Cp)[:C])
    icarry = jnp.swapaxes(st2[:, 4:4 + PER - 1, :], 1, 2).reshape(
        Cp, PER - 1)[:C]
    new_state = ChainState(phase=phase, os_carry=os_carry, demod=dstate,
                           agc=astate, interp_carry=icarry,
                           squelch=sq_state)
    return new_state, ChainOutput(audio=audio, rssi=rssi,
                                  baseband=cx.split(y))


def process_tail_tmajor(cfg: ChainConfig, params: ChainParams,
                        state: ChainState, phase, yT: cx.CX | None,
                        os_carry: cx.CX, *, audio_dtype=jnp.float32,
                        fir_x: cx.CX | None = None,
                        fir_x3: tuple | None = None,
                        chan_order: np.ndarray | None = None
                        ) -> tuple["ChainState", jax.Array, jax.Array]:
    """TIME-MAJOR fused back half: yT [chunk, C] split-complex passband
    (lane-major channels) → (state, audioT [chunk·L, C], rssi [C, 1]).

    The zero-transpose variant of `_process_tail_pallas` for the
    wideband fast path: the tail kernel consumes yT directly, RSSI is
    accumulated IN the kernel (Σ|y|² carried across time tiles — y is
    never re-read from HBM), and the audio comes back time-major in
    `audio_dtype`. State packing is identical to the channel-major
    path, so chunks chain bit-compatibly across layouts.

    With `fir_x` (the PRE-passband channelizer planes [chunk, C]) and
    params.W_tailpass present, the Toeplitz passband itself fuses into
    the kernel (ops/pallas/chain_tail._kernel_fir): yT is ignored, y
    never exists in HBM, and `os_carry` should carry fir_x's input
    tail as usual.

    With `fir_x3` (the channelizer's RAW (out_r, out_i) [n1, chunk, n2]
    planes) the coupling is fully zero-copy: the kernel DMAs planar
    channel blocks straight out of the raw buffer — no transpose pass
    anywhere. Audio/RSSI rows come back in PLANAR channel order;
    `chan_order` (planar row → bin index) permutes the per-channel
    STREAM STATE in/out so ChainState stays bin-ordered and
    layout-switch compatible.

    Requires n_rows == 1 (os_block == chunk): the in-kernel power
    accumulator yields one RSSI per chunk, the wideband configuration.
    """
    from supersdr_tpu.ops.pallas import chain_tail
    import numpy as _np

    if cfg.chunk != cfg.os_block:
        raise ValueError("time-major tail needs os_block == chunk "
                         "(one RSSI row per chunk)")
    if fir_x3 is not None:
        n1_, _, n2_ = fir_x3[0].shape
        C = n1_ * n2_
        if chan_order is None:
            raise ValueError("fir_x3 needs chan_order")
        order = np.asarray(chan_order)
        inv = np.argsort(order)

        def to_planar(v):
            return v[..., order] if v.ndim == 1 else v[order]

        def to_bin(v):
            return v[..., inv] if v.ndim == 1 else v[inv]
    else:
        C = yT.shape[-1]

        def to_planar(v):
            return v

        def to_bin(v):
            return v
    Cp = -(-C // 128) * 128
    G = Cp // 128
    PER = cfg.interp_plan.per
    params_vec = _tail_params_vec(params, cfg)
    _, P = resample.plan_interp(
        cfg.upsample, firdesign.lowpass_taps(cfg.iq_rate / 2,
                                             cfg.audio_rate))

    def cpad_lane(a):
        # zero-pad the LANE (channel) axis — last dim
        if Cp == C:
            return a
        return jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (Cp - C,), a.dtype)], axis=-1)

    def cpad0(a):
        if Cp == C:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((Cp - C,) + a.shape[1:], a.dtype)], axis=0)

    nbfm = cfg.mode.upper() == "NBFM"
    r0 = state.demod.last_sample.re if nbfm else state.demod.dc_x
    r1 = state.demod.last_sample.im if nbfm else state.demod.dc_y
    st_rows = jnp.concatenate([
        cpad0(to_planar(r0)).reshape(G, 1, 128),
        cpad0(to_planar(r1)).reshape(G, 1, 128),
        cpad0(to_planar(state.agc.peak_db)).reshape(G, 1, 128),
        cpad0(to_planar(state.agc.gain_db)).reshape(G, 1, 128),
        jnp.swapaxes(cpad0(to_planar(state.interp_carry)
                           ).reshape(G, 128, PER - 1), 1, 2),
        jnp.zeros((G, 1, 128), jnp.float32),     # Σ|y|² accumulator row
    ], axis=1)
    interpret = jax.default_backend() not in ("tpu", "axon")
    fir = None
    if yT is not None:
        xr, xi = cpad_lane(yT.re), cpad_lane(yT.im)
    else:
        xr = xi = None
    if fir_x is not None or fir_x3 is not None:
        if params.W_tailpass is None:
            raise ValueError("fir_x given but params.W_tailpass missing")
        # [W, B] real form vs [2W, 2B] complex-folded form: the real
        # matrix is recognized by bn (the static block plan) — both
        # share (B, n_prev), the real one has half the rows AND cols
        bn = fir_matmul.tail_fir_block(cfg.chunk, cfg.n_taps,
                                       _tail_tile(cfg.chunk, cfg.n_taps))
        B, n_prev = bn
        fir_real = params.W_tailpass.shape[1] == B
        PH = n_prev * B
        ov = cfg.n_taps - 1
        if fir_x3 is not None:
            fxr, fxi = fir_x3
        else:
            fxr, fxi = cpad_lane(fir_x.re), cpad_lane(fir_x.im)
        # tile-0 history head [PH, Cp]: zero rows, then the carried
        # n_taps-1 input tail (state os_carry [C, ov] bin-order —
        # permuted to the kernel's lane order). Head dtype follows the
        # source planes (bf16 raw3 coupling on the fast profile).
        hd = fxr.dtype
        hz = jnp.zeros((PH - ov, (Cp if fir_x3 is None else C)), hd)
        head_r = jnp.concatenate(
            [hz, cpad_lane(to_planar(state.os_carry.re).T).astype(hd)],
            axis=0)
        head_i = jnp.concatenate(
            [hz, cpad_lane(to_planar(state.os_carry.im).T).astype(hd)],
            axis=0)
        fir = dict(w2=params.W_tailpass, head_r=head_r, head_i=head_i,
                   x_r=fxr, x_i=fxi, B=B, n_prev=n_prev,
                   dot3=(cfg.passband_precision != "default"),
                   real=fir_real)
        if cfg.resample_impl == "matmul":
            # resample on the MXU too (blocked-Toeplitz; the interleave
            # rides the matmul row order) — "fma" keeps the VPU form
            tile = _tail_tile(cfg.chunk, cfg.n_taps)
            rb = 32 if tile % 32 == 0 else (16 if tile % 16 == 0 else 0)
            if rb:
                fir["rs_block"] = rb
                fir["rs_dot3"] = cfg.resample_precision != "default"

        if fir_x3 is None:
            xr, xi = fxr, fxi
    audioT, st2 = chain_tail.chain_tail_am(
        xr, xi, st_rows, params_vec,
        _np.asarray(P), tile_t=_tail_tile(cfg.chunk, cfg.n_taps), L=cfg.upsample,
        demod=_tail_demod(cfg),
        interpret=interpret, accum_pow=True, audio_dtype=audio_dtype,
        fir=fir, hang_window=(cfg.hang_window if cfg.hang_enabled
                              else 0))
    audioT = audioT[:, :C]

    from supersdr_tpu.ops import smeter as smeter_ops
    pw = st2[:, 4 + PER - 1, :].reshape(Cp)[:C] / cfg.chunk
    rssi = jnp.maximum(
        10.0 * jnp.log10(jnp.maximum(pw, 1e-30)) + smeter_ops.DEFAULT_CAL_DB,
        smeter_ops.RSSI_FLOOR_DB)[:, None]           # [C, 1]

    # squelch gate at the audio rate from the in-kernel RSSI — the same
    # post-kernel gate the chan-major path applies, so enabling squelch
    # no longer forfeits the time-major tier (VERDICT r4 #4); the ramp
    # rescale keeps the serial 12 kHz gate's time constant
    if cfg.squelch_enabled:
        sq = params.squelch._replace(ramp=params.squelch.ramp
                                     / float(cfg.upsample))
        sq_planar = jax.tree.map(to_planar, state.squelch)
        sq2, audioT = squelch_ops.apply_squelch_tmajor(
            sq, sq_planar, audioT, rssi[:, 0])
        sq_state = jax.tree.map(to_bin, sq2)
    else:
        sq_state = state.squelch

    o0 = to_bin(st2[:, 0, :].reshape(Cp)[:C])
    o1 = to_bin(st2[:, 1, :].reshape(Cp)[:C])
    if nbfm:
        dstate = demod_ops.DemodState(last_sample=cx.CX(o0, o1),
                                      dc_x=state.demod.dc_x,
                                      dc_y=state.demod.dc_y)
    else:
        dstate = demod_ops.DemodState(
            last_sample=state.demod.last_sample, dc_x=o0, dc_y=o1)
    astate = agc_ops.AGCState(peak_db=to_bin(st2[:, 2, :].reshape(Cp)[:C]),
                              gain_db=to_bin(st2[:, 3, :].reshape(Cp)[:C]))
    icarry = to_bin(jnp.swapaxes(st2[:, 4:4 + PER - 1, :], 1, 2).reshape(
        Cp, PER - 1)[:C])
    new_state = ChainState(phase=phase, os_carry=os_carry, demod=dstate,
                           agc=astate, interp_carry=icarry,
                           squelch=sq_state)
    return new_state, audioT, rssi


def process_traced(cfg: ChainConfig, params: ChainParams, state: ChainState,
                   iq: cx.CX) -> tuple[ChainState, ChainOutput]:
    """Chain body for traced contexts (inside jit/scan/shard_map).

    iq: [*batch, chunk] split-complex. Complex math happens freely inside;
    every leaf of the returned pytrees is float (CX for complex values) so
    the enclosing program's boundary stays TPU-legal.
    """
    plan = cfg.os_plan
    batch = iq.shape[:-1]
    n_rows = cfg.chunk // cfg.os_block
    iqc = cx.to_complex(iq)

    # 0. impulse noise blanker on the raw IQ (SET nb equivalent);
    # statically gated — toggling NB retraces, like a mode change
    if cfg.blanker_enabled:
        iqc = squelch_ops.apply_blanker(params.blanker, iqc)

    # 1. tune: complex mix by -freq_offset (statically skipped for
    #    channel-centered inputs, e.g. PFB output)
    if cfg.nco_enabled:
        phase, x = mixer.mix(params.nco, state.phase, iqc)
    else:
        phase, x = state.phase, iqc

    # 2. passband selection: batched overlap-save rows, or the FFT-free
    #    blocked-Toeplitz MXU matmul (same streaming state either way)
    if cfg.passband_impl == "matmul":
        prec = cx.resolve_precision(cfg.passband_precision)
        _, y_cx = fir_matmul.fir_matmul_stream_c(cfg.fir_plan, params.W_pass,
                                                 state.os_carry, cx.split(x),
                                                 precision=prec)
        y = cx.to_complex(y_cx)
        y_rows = y.reshape(*batch, n_rows, cfg.os_block)
    elif cfg.passband_impl == "matmul_real":
        prec = cx.resolve_precision(cfg.passband_precision)
        xs = cx.split(x)
        carry = state.os_carry
        if params.rot_in is not None:
            rin = params.rot_in
            xs = xs * rin
            if plan.overlap:
                carry = carry * rin[..., -plan.overlap:]
        _, u = fir_matmul.fir_matmul_stream_real_c(cfg.fir_plan,
                                                   params.W_pass, carry, xs,
                                                   precision=prec)
        if params.rot_out is not None:
            u = u * params.rot_out
        y = cx.to_complex(u)
        y_rows = y.reshape(*batch, n_rows, cfg.os_block)
    elif cfg.passband_impl == "fftmxu":
        # layout-rotating MXU overlap-save (round 3): forward FFT rotates
        # the batch axis into the lanes ([B, F] → [F, B]), the passband
        # mask multiplies down the major axis, the inverse runs major-
        # axis in place, and ONE transpose returns [B, chunk]. All FFT
        # FLOPs are dot_generals with full-lane minor dims — the formula
        # that made round 2 reject FFT passbands (~3× off roofline) was
        # an artifact of the old small-dim-swapping four-step layout.
        prec = cx.resolve_precision(cfg.passband_precision)
        xs = cx.split(x)
        F = plan.fft_size
        seg_r = jnp.concatenate([state.os_carry.re, xs.re], axis=-1)
        seg_i = jnp.concatenate([state.os_carry.im, xs.im], axis=-1)
        pad = F - seg_r.shape[-1]
        if pad:
            zpad = jnp.zeros((*seg_r.shape[:-1], pad), jnp.float32)
            seg_r = jnp.concatenate([seg_r, zpad], axis=-1)
            seg_i = jnp.concatenate([seg_i, zpad], axis=-1)
        b2r = seg_r.reshape(-1, F)
        b2i = seg_i.reshape(-1, F)
        Xr, Xi = cx.fft_rotate(b2r, b2i, precision=prec)      # [F, B]
        Hr = params.H_pass.re[:, None]
        Hi = params.H_pass.im[:, None]
        Yr = Xr * Hr - Xi * Hi
        Yi = Xr * Hi + Xi * Hr
        zr, zi = cx.ifft_major(Yr, Yi, precision=prec)        # [F, B]
        sl = slice(plan.overlap, plan.overlap + cfg.chunk)
        yr = zr[sl, :].T.reshape(*batch, cfg.chunk)
        yi = zi[sl, :].T.reshape(*batch, cfg.chunk)
        y = jax.lax.complex(yr, yi)
        y_rows = y.reshape(*batch, n_rows, cfg.os_block)
    else:
        rows = x.reshape(*batch, n_rows, cfg.os_block)
        H = cx.to_complex(params.H_pass)
        if params.H_pass.re.ndim > 1:
            # per-slot passbands (batched multi-receiver): broadcast the
            # [*batch, fft] responses over the rows axis
            H = H[..., None, :]
        y_rows = overlap_save.overlap_save_batch_c(plan, H,
                                                   cx.to_complex(state.os_carry),
                                                   rows)
        y = y_rows.reshape(*batch, cfg.chunk)
    # NB x[..., -0:] would be the whole array — guard the overlap-0 case
    os_carry = cx.split(x[..., -plan.overlap:] if plan.overlap
                        else x[..., :0])

    # 3. per-row RSSI from the passband signal (the reference receives one
    #    RSSI per 512-sample SND frame; here one per overlap-save row)
    rssi = smeter.rssi_db(y_rows)

    # 4-6 fused (tail_impl="pallas"): demod+DC+AGC+resample as one
    # Mosaic kernel in time-major tiles (ops/pallas/chain_tail.py);
    # squelch gates the audio-rate output (identical when disabled)
    if cfg.tail_impl == "pallas" and _pallas_tail_ok(cfg, batch):
        return _process_tail_pallas(cfg, params, state, phase, y, y_rows,
                                    rssi, os_carry)

    # 4. demodulate (MULTI: per-slot runtime select — mode changes on a
    #    batched multi-receiver program never retrace)
    if cfg.mode.upper() == "MULTI":
        dstate, audio = demod_ops.demodulate_runtime(
            state.demod, y, cfg.iq_rate, params.mode_id, cfg.max_dev_hz)
    else:
        dstate, audio = demod_ops.demodulate(cfg.mode, state.demod, y,
                                             cfg.iq_rate,
                                             max_dev_hz=cfg.max_dev_hz)

    # 5. AGC
    astate, audio = agc_ops.apply(params.agc, state.agc, audio,
                                  hang_window=cfg.hang_window,
                                  decimation=cfg.agc_decimation)

    # 5b. squelch gate on the chunk RSSI (SET squelch equivalent);
    # statically compiled out when off — the default, like the blanker
    if cfg.squelch_enabled:
        sq_state, audio = squelch_ops.apply_squelch(
            params.squelch, state.squelch, audio, jnp.mean(rssi, axis=-1))
    else:
        sq_state = state.squelch

    # 6. resample to the audio rate (IQ mode keeps complex baseband as-is)
    if cfg.mode.upper() == "IQ":
        out_audio = cx.split(audio)
        icarry = state.interp_carry
    elif cfg.is_rational:
        icarry, out_audio = resample.rational_resample_block(
            cfg.rational_plan, params.P_interp, state.interp_carry,
            audio.astype(jnp.float32))
    elif cfg.resample_impl == "matmul":
        icarry, out_audio = resample.interpolate_matmul(
            cfg.interp_matmul_plan, params.W_interp, state.interp_carry,
            audio.astype(jnp.float32),
            precision=cx.resolve_precision(cfg.resample_precision))
    else:
        icarry, out_audio = resample.interpolate(cfg.interp_plan,
                                                 params.P_interp,
                                                 state.interp_carry,
                                                 audio.astype(jnp.float32),
                                                 cfg.resample_impl)

    new_state = ChainState(phase=phase, os_carry=os_carry, demod=dstate,
                           agc=astate, interp_carry=icarry,
                           squelch=sq_state)
    return new_state, ChainOutput(audio=out_audio, rssi=rssi,
                                  baseband=cx.split(y))


_process_cx = partial(jax.jit, static_argnums=0)(process_traced)


def process(cfg: ChainConfig, params: ChainParams, state: ChainState,
            iq) -> tuple[ChainState, ChainOutput]:
    """Run one chunk through the full chain. iq: [*batch, chunk] — CX,
    complex numpy (split host-side, TPU-safe), or a complex array on
    backends with complex buffers."""
    return _process_cx(cfg, params, state, cx.as_cx(iq))


def run_offline(cfg: ChainConfig, params: ChainParams, iq: np.ndarray,
                state: ChainState | None = None
                ) -> tuple[ChainState, np.ndarray, np.ndarray]:
    """Host convenience: stream an arbitrary-length IQ signal through the
    chain in `cfg.chunk` slices (zero-padding the tail), returning
    (final_state, audio, rssi_rows)."""
    if state is None:
        state = init_state(cfg, iq.shape[:-1])
    n = iq.shape[-1]
    pad = (-n) % cfg.chunk
    iqp = np.pad(np.asarray(iq, np.complex64),
                 [(0, 0)] * (iq.ndim - 1) + [(0, pad)])
    audio_parts, rssi_parts = [], []
    for i in range(0, iqp.shape[-1], cfg.chunk):
        state, out = process(cfg, params, state, iqp[..., i:i + cfg.chunk])
        audio_parts.append(np.asarray(out.audio))
        rssi_parts.append(np.asarray(out.rssi))
    audio = np.concatenate(audio_parts, axis=-1)
    rssi = np.concatenate(rssi_parts, axis=-1)
    if cfg.mode.upper() != "IQ":
        L, M = cfg.resample_LM
        audio = audio[..., : n * L // M]
    return state, audio, rssi
