"""Wideband receiver: one capture → polyphase channelizer → N demod chains.

BASELINE.md's channelizer config: a full MW-band capture (e.g. 1.2 MHz of
IQ) split into 100 AM channels of 12 kHz each, all demodulated at once.
With n_chan chosen so fs_in / n_chan equals the chain's IQ rate, the PFB
output feeds the standard receiver chain batched over its channel axis —
two fused device programs end-to-end, versus the reference's
two-sockets-per-receiver ceiling (supersdr.py:624-639).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from supersdr_tpu.ops import channelizer, cx
from supersdr_tpu.runtime import chain


# On-chip A/B-winning kernel tuning (measured ladder in
# docs/PERFORMANCE.md). Both profiles run the whole pipeline TIME-MAJOR
# through the two fused Pallas kernels — the channelizer
# (ops/pallas/channelize_fused.py: fold + both DIF FFT stages per VMEM
# tile, kernel-stitched input windows) and the FIR-fused chain tail
# (ops/pallas/chain_tail.py: Toeplitz passband + demod + DC + AGC +
# resample, triple-buffered window DMAs, in-kernel RSSI):
# "fast" = 7746 Msps/chip at ~54 dB oracle audio SNR (1-pass bf16 MXU;
# 8861 Msps at int16 ingest; round 5);
# "quality" = 5808 Msps at ~82 dB (split-bf16 ×3 in-kernel dots — the
# precision trick XLA folds away but Mosaic preserves — on the min-n1
# (5, 512) tree with the 2-level stage-B split; 6640 Msps at int16
# ingest). The kernels
# need a working Mosaic toolchain and lane-multiple n_chan factors;
# other shapes fall back to the XLA paths automatically (the SMALL
# integrity gate exercises exactly that fallback).
PROFILES = {
    # round 4: "fast" runs the whole pipeline TIME-MAJOR with the
    # PLANAR zero-transpose coupling (kernel-stitched input windows,
    # in-tail FIR, in-kernel RSSI, bf16 coupling buffer) — the full
    # optimization ladder is in docs/PERFORMANCE.md. Audio returns
    # [frames·L, n_chan] float32, rows ordered per
    # `audio_channel_order` (bf16/f16 audio planes measured: bf16
    # saved nothing, f16 is unsupported by Mosaic on this runtime).
    "fast": dict(passband_impl="matmul", passband_precision="default",
                 chan_impl="mxu2fused", chan_precision="default",
                 resample_impl="matmul",
                 resample_precision="high", tail_impl="pallas",
                 time_major=True),
    # round 4: "quality" also goes fully fused + time-major — the
    # in-kernel split-bf16 dot3 stage B (precision "high") now compiles
    # at tile_t ≤ 112 (the r3 compile cliff starts at 128 for the dot3
    # path; benchmarks/sweep_quality.py records the sweep): 4200 Msps
    # at 81.8 dB MID-gate SNR vs 1394 Msps at 82.8 dB for the r3
    # XLA-FFT form. chan_tile_t=64 so the MID integrity gate's
    # 512-frame chunk divides the tile and exercises the SAME planar
    # coupling the headline runs (r5 re-sweep with the stage-B split:
    # tile 112 is +2 % — 5723 vs 5603 — but breaks that gate
    # alignment; tile 128 still hits the Mosaic dot3 compile cliff
    # even at the split's 128-wide dots).
    "quality": dict(passband_impl="matmul", passband_precision="high",
                    chan_impl="mxu2fused", chan_precision="high",
                    resample_impl="matmul",
                    resample_precision="high", tail_impl="pallas",
                    time_major=True, chan_tile_t=64),
}


@dataclass(frozen=True)
class WidebandConfig:
    """fs_in must equal n_chan * chain.iq_rate (critical sampling)."""
    fs_in: int = 1_200_000
    n_chan: int = 100
    taps_per: int = 8
    mode: str = "AM"
    chunk_in: int = 1_200_000 // 4      # input samples per call
    audio_rate: int = 48000
    n_taps: int = 257
    agc_decimation: int = 1             # AGC ballistics decimation (perf)
    hang_enabled: bool = False          # AGC hang (fused in-kernel since
                                        # r5 — no tier loss; tile-granular
                                        # window, see ops/pallas/chain_tail)
    hang_ms: float = 500.0
    squelch_enabled: bool = False       # audio-rate squelch gate (fused
                                        # tiers apply it post-kernel from
                                        # the in-kernel RSSI — no tier
                                        # loss since r5)
    max_dev_hz: float = 5000.0          # NBFM full-scale deviation
    pallas_fold: bool = False           # PFB fold via the Pallas DMA kernel
                                        # instead of the XLA gather (A/B'd
                                        # on-chip in docs/PERFORMANCE.md)
    passband_impl: str = "fft"          # chain passband: "fft" overlap-save,
                                        # "matmul" Toeplitz MXU FIR, or
                                        # "matmul_real" (modulated real
                                        # prototype, half the matmul FLOPs)
    passband_precision: str = "highest"  # matmul precision (see ChainConfig)
    resample_impl: str = "einsum"       # see ChainConfig.resample_impl
    resample_precision: str = "highest"  # see ChainConfig
    mxu_chan_fft: bool = False          # channelizer FFT via the MXU
                                        # four-step instead of the FFT HLO
    chan_impl: str = "legacy"           # "legacy" (channelize_c, honoring
                                        # mxu_chan_fft) or "mxu2" /
                                        # "mxu2conv" — the lane-layout
                                        # zero-transpose channelizer
                                        # (ops/channelizer.py, round 3)
    chan_fold_dtype: str = "f32"        # "f16": store the PFB fold input
                                        # window in float16 (halves fold
                                        # HBM reads; f32 accumulation)
    chan_precision: str = "highest"     # mxu2 FFT matmul precision:
                                        # "highest" (6-pass, ~f32),
                                        # "high" (3-pass, ~98 dB) or
                                        # "default" (1-pass bf16,
                                        # ~55 dB end-to-end); gate on
                                        # the oracle SNR
    tail_impl: str = "xla"              # "pallas": fused demod+AGC+
                                        # resample tail (see ChainConfig)
    chan_fft_form: str = "dif"          # "dif" (twiddle folded into a
                                        # j2-batched stage-A dot) or
                                        # "dit" (no batched dot dims,
                                        # separate twiddle pass) — same
                                        # math, different XLA layout
                                        # behavior; A/B'd in context
    time_major: bool = False            # run the whole fast path in
                                        # TIME-MAJOR layout ([frames,
                                        # n_chan] — channels on lanes):
                                        # the fused channelizer emits
                                        # time-major, the passband rides
                                        # the dot output dim order, and
                                        # the fused tail consumes/emits
                                        # time-major with in-kernel
                                        # RSSI — zero transpose passes
                                        # between stages. AUDIO COMES
                                        # BACK [frames·L, n_chan].
                                        # Configs the fused kernels
                                        # can't serve fall back to the
                                        # chan-major path + transpose
                                        # (the output contract per cfg
                                        # is fixed).
    chan_tile_t: int = 128              # fused channelizer frame-tile
                                        # (ops/pallas/channelize_fused);
                                        # sweep knob for the in-kernel
                                        # dot3 quality path
    chan_split2: str = "auto"           # radix-2 stage-B split on the
                                        # planar fused path ("auto" |
                                        # "on" | "off"): the stage-B
                                        # MXU MACs halve per level,
                                        # down to 128-wide dots (r5
                                        # A/B in docs/PERFORMANCE.md)
    chan_factors: tuple | None = None   # override the planar DIF
                                        # factoring (n1, n2), e.g.
                                        # (5, 512) on 2560 channels:
                                        # radix-5 stage A (half the
                                        # radix-10 VPU work) + 2-level
                                        # stage-B split. None = the
                                        # default _pick_factors tree
    audio_dtype: str = "f32"            # audio output plane: "f32",
                                        # "f16" (halves the audio HBM
                                        # write, ~66 dB quantization
                                        # floor) or "bf16"; gate on the
                                        # bench oracle SNR

    def __post_init__(self):
        if self.fs_in % self.n_chan:
            raise ValueError("n_chan must divide fs_in")
        if self.chunk_in % self.n_chan:
            raise ValueError("chunk_in must be a multiple of n_chan")
        if self.time_major and self.mode.upper() == "IQ":
            raise ValueError("time_major is an audio-path layout (IQ "
                             "mode keeps complex baseband)")
        if self.audio_dtype not in ("f32", "f16", "bf16"):
            raise ValueError("audio_dtype must be 'f32', 'f16' or 'bf16'")
        if self.chan_split2 not in ("auto", "on", "off"):
            raise ValueError("chan_split2 must be 'auto', 'on' or 'off'")
        if self.chan_factors is not None:
            n1f, n2f = self.chan_factors
            if n1f * n2f != self.n_chan or n2f % 128:
                raise ValueError("chan_factors must multiply to n_chan "
                                 "with a lane-multiple n2")
        if self.chan_impl not in ("legacy", "mxu2", "mxu2conv",
                                  "mxu2pallas", "mxu2fused", "stub",
                                  "nofft"):
            raise ValueError("chan_impl must be 'legacy', 'mxu2', "
                             "'mxu2conv', 'mxu2pallas', 'mxu2fused', "
                             "'stub' or 'nofft' (stub/nofft: knockout "
                             "profiling)")

    @property
    def iq_rate(self) -> int:
        return self.fs_in // self.n_chan

    @property
    def chunk_per_chan(self) -> int:
        return self.chunk_in // self.n_chan

    @property
    def chain_cfg(self) -> chain.ChainConfig:
        # PFB output is channel-centered (offsets structurally zero —
        # make_params forbids overriding them), so the NCO pass is
        # statically compiled out
        return chain.ChainConfig(mode=self.mode, iq_rate=self.iq_rate,
                                 audio_rate=self.audio_rate,
                                 chunk=self.chunk_per_chan,
                                 os_block=self.chunk_per_chan,
                                 n_taps=self.n_taps,
                                 agc_decimation=self.agc_decimation,
                                 hang_enabled=self.hang_enabled,
                                 hang_ms=self.hang_ms,
                                 squelch_enabled=self.squelch_enabled,
                                 max_dev_hz=self.max_dev_hz,
                                 nco_enabled=False,
                                 passband_impl=self.passband_impl,
                                 passband_precision=self.passband_precision,
                                 resample_impl=self.resample_impl,
                                 resample_precision=self.resample_precision,
                                 tail_impl=self.tail_impl)


class WidebandParams(NamedTuple):
    W_pfb: jax.Array
    chain: chain.ChainParams


class WidebandState(NamedTuple):
    pfb_carry: cx.CX           # split-complex PFB history (TPU boundary)
    chain: chain.ChainState


def make_params(cfg: WidebandConfig, **chain_kwargs) -> WidebandParams:
    plan, proto = channelizer.design(cfg.n_chan, cfg.taps_per)
    W = channelizer.taps_matrix(plan, proto)
    cp = chain.make_params(cfg.chain_cfg,
                           freq_offset_hz=np.zeros(cfg.n_chan),
                           **chain_kwargs)
    return WidebandParams(W_pfb=W, chain=cp)


def init_state(cfg: WidebandConfig) -> WidebandState:
    plan, _ = channelizer.design(cfg.n_chan, cfg.taps_per)
    return WidebandState(pfb_carry=channelizer.init_carry(plan),
                         chain=chain.init_state(cfg.chain_cfg, (cfg.n_chan,)))


def pfb_plan(cfg: WidebandConfig) -> channelizer.PFBPlan:
    # plan is pure structure — building it directly avoids re-running the
    # prototype FIR design (≈1 ms host time) on every process() step
    return channelizer.PFBPlan(n_chan=cfg.n_chan, taps_per=cfg.taps_per,
                               hop=cfg.n_chan)


def channelize_dispatch(cfg: WidebandConfig, params: WidebandParams,
                        carry_c: jax.Array, iq_c: jax.Array
                        ) -> tuple[jax.Array, jax.Array]:
    """Channelizer implementation dispatch (shared by the serial pipeline
    and the mesh body in parallel/sharded_wideband.py — the mesh passes
    its halo-exchange history as `carry_c`).

    carry_c: [history] complex filter history; iq_c: [n] complex wideband
    (n a multiple of n_chan). Returns (new_carry, chans [n_chan, n/M]).
    """
    plan = pfb_plan(cfg)
    n_frames = iq_c.shape[-1] // cfg.n_chan
    if cfg.pallas_fold:
        from supersdr_tpu.ops.pallas import pfb_fold
        # fold-order taps G[k, r] = rev(proto)[k·M + r], derived from W
        G = params.W_pfb.reshape(-1)[::-1].reshape(cfg.taps_per, cfg.n_chan)
        interpret = jax.default_backend() not in ("tpu", "axon")
        pfb_carry, chans = pfb_fold.channelize_pallas_c(
            plan, G, carry_c, iq_c, interpret=interpret)
    elif cfg.chan_impl == "stub":
        # knockout-profiling stub (semantics-free): reshape-decimate +
        # transpose — the minimal [chunk]→[M, frames] layout work with
        # no fold and no FFT, so `full - stub` bounds the channelizer's
        # in-context compute cost
        x2 = iq_c.reshape(n_frames, cfg.n_chan)
        chans = jnp.swapaxes(x2, 0, 1)
        pfb_carry = carry_c
    elif cfg.chan_impl == "nofft":
        # knockout-profiling: real fold (f16) + transpose, FFT skipped —
        # `full - nofft` isolates the two DIF matmul stages in context
        seg = jnp.concatenate([carry_c, iq_c], axis=-1)
        nf = n_frames
        rows_r = jnp.real(seg).reshape(nf + cfg.taps_per - 1, cfg.n_chan
                                       ).astype(jnp.float16)
        rows_i = jnp.imag(seg).reshape(nf + cfg.taps_per - 1, cfg.n_chan
                                       ).astype(jnp.float16)
        g2 = params.W_pfb.reshape(-1)[::-1].reshape(cfg.taps_per,
                                                    cfg.n_chan)
        fr = channelizer._fold_slices(g2, rows_r, nf, cfg.taps_per)
        fi = channelizer._fold_slices(g2, rows_i, nf, cfg.taps_per)
        chans = jax.lax.complex(fr.T, fi.T)
        pfb_carry = seg[..., -plan.history:]
    elif cfg.chan_impl == "mxu2fused":
        # single-VMEM-pass Pallas kernel: fold + both DIF FFT stages
        # (ops/pallas/channelize_fused.py); lane-aligned n_chan only —
        # other sizes (e.g. the 16-chan integrity gate) fall back to the
        # XLA mxu2 path at the matching precision tier
        from supersdr_tpu.ops.pallas import channelize_fused
        fac = channelizer._pick_factors(cfg.n_chan)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        n_frames_ok = (iq_c.shape[-1] // cfg.n_chan) % 8 == 0
        if fac is not None and fac[1] % 128 == 0 and n_frames_ok:
            pfb_carry, chans = channelize_fused.channelize_fused_c(
                plan, params.W_pfb, carry_c, iq_c,
                bf16_mxu=(cfg.chan_precision == "default"),
                tile_t=cfg.chan_tile_t, interpret=not on_tpu)
        else:
            pfb_carry, chans = channelizer.channelize_mxu2_c(
                plan, params.W_pfb, carry_c, iq_c, fold_impl="slices",
                precision=cx.resolve_precision(cfg.chan_precision),
                fold_dtype=jnp.float32)
    elif cfg.chan_impl in ("mxu2", "mxu2conv", "mxu2pallas"):
        fold_impl = {"mxu2": "slices", "mxu2conv": "conv",
                     "mxu2pallas": "pallas"}[cfg.chan_impl]
        pfb_carry, chans = channelizer.channelize_mxu2_c(
            plan, params.W_pfb, carry_c, iq_c, fold_impl=fold_impl,
            precision=cx.resolve_precision(cfg.chan_precision),
            fold_dtype=(jnp.float16 if cfg.chan_fold_dtype == "f16"
                        else jnp.float32),
            fft_form=cfg.chan_fft_form)
    else:
        pfb_carry, chans = channelizer.channelize_c(
            plan, params.W_pfb, carry_c, iq_c, mxu_fft=cfg.mxu_chan_fft)
    return pfb_carry, chans


def _audio_np_dtype(cfg: WidebandConfig):
    return {"f32": jnp.float32, "f16": jnp.float16,
            "bf16": jnp.bfloat16}[cfg.audio_dtype]


def _planar_active(cfg: WidebandConfig) -> bool:
    """True when the zero-transpose PLANAR coupling runs: the fused
    channelizer's raw [n1, frames, n2] output feeds the tail kernel's
    window DMAs directly, and audio channels come out in PLANAR order
    c = k1·n2 + k2 (bin m = k2·n1 + k1) — the per-bin map is
    `audio_channel_order`. Removing the [n1,·,n2]→[·, M] transpose is
    worth ~1.5 ms at the bench shape (the last pure-layout pass)."""
    if not (cfg.time_major and _tmajor_fused_ok(cfg)):
        return False
    fac = _factors_for(cfg)
    if fac is None or fac[1] % 128:
        return False
    if cfg.chunk_per_chan % cfg.chan_tile_t:
        return False       # raw3 needs exact frame tiling
    ccfg = cfg.chain_cfg
    from supersdr_tpu.ops import fir_matmul
    bn = fir_matmul.tail_fir_block(ccfg.chunk, ccfg.n_taps,
                                   chain._tail_tile(ccfg.chunk,
                                                    ccfg.n_taps))
    return bn is not None


def _pick_split_factors(n_chan: int) -> tuple[int, int] | None:
    """Min-n1 factoring with n2 = 128·2^L (L ≤ 2, n1 ≥ 2): the planar
    optimum when the stage-B split is active — stage A costs ∝ M·n1
    and the split drives stage B to 128-wide dots regardless, so the
    smallest n1 wins (2560 → (5, 512): radix-5 stage A at HALF the
    (10, 256) tree's VPU work, measured r5). None when no such
    factoring exists."""
    for n2 in (512, 256, 128):
        n1 = n_chan // n2
        if n_chan % n2 == 0 and 2 <= n1 <= cx.MAX_DIRECT:
            return n1, n2
    return None


def _factors_for(cfg: WidebandConfig) -> tuple[int, int] | None:
    """The planar DIF factoring this config runs: the `chan_factors`
    override when given; else, when the stage-B split will be active
    (dot3 tier, not forced off), the min-n1 split-friendly tree; else
    the default `_pick_factors` tree."""
    if cfg.chan_factors is not None:
        return tuple(cfg.chan_factors)
    if cfg.chan_precision != "default" and cfg.chan_split2 != "off":
        fac = _pick_split_factors(cfg.n_chan)
        if fac is not None:
            return fac
    return channelizer._pick_factors(cfg.n_chan)


def _split_levels_for(cfg: WidebandConfig, n2: int) -> int:
    """Stage-B split depth for a planar pipeline with lane factor n2
    (serial AND mesh call this so both stay consistent with the same
    config). Levels halve the stage-B MXU MACs down to 128-wide dots."""
    max_l = 0
    while channelizer.stageb_split_ok(n2, max_l + 1):
        max_l += 1
    if max_l == 0 or cfg.chan_split2 == "off":
        return 0
    if cfg.chan_split2 == "on":
        return max_l
    # auto: ON for the split-bf16 dot3 tier only — halving the dot3
    # stage B is worth +7.3 % at the headline (5224 → 5603 Msps), while
    # the bf16 tier's smaller MXU saving loses to the added VPU
    # butterfly (7750 → 7429). Measured r5, docs/PERFORMANCE.md.
    return max_l if cfg.chan_precision != "default" else 0


def _split2_for(cfg: WidebandConfig, n2: int) -> bool:
    """Back-compat boolean view of `_split_levels_for`."""
    return _split_levels_for(cfg, n2) > 0


def audio_channel_order(cfg: WidebandConfig) -> np.ndarray:
    """order[i] = PFB bin index of audio/rssi output row i.

    Identity except on the planar fused path, where row c = k1·n2 + col
    corresponds to bin k2(col)·n1 + k1 — k2 = col except under the
    radix-2 stage-B split (`channelizer.stageb_col_to_k2`).
    `channel_freqs` applies this map, so `channel_freqs(cfg)[i]` is
    always the frequency of output row i."""
    if not _planar_active(cfg):
        return np.arange(cfg.n_chan)
    n1, n2 = _factors_for(cfg)
    colmap = channelizer.stageb_col_to_k2(n2, _split_levels_for(cfg, n2))
    c = np.arange(cfg.n_chan)
    return colmap[c % n2] * n1 + c // n2


def _tmajor_fused_ok(cfg: WidebandConfig) -> bool:
    """True when the zero-transpose fused path can serve this config."""
    from supersdr_tpu.ops import fir_matmul
    fac = channelizer._pick_factors(cfg.n_chan)
    ccfg = cfg.chain_cfg
    if not (cfg.chan_impl == "mxu2fused" and fac is not None
            and fac[1] % 128 == 0
            and cfg.chunk_per_chan % 8 == 0   # 8-aligned window DMAs
            and ccfg.passband_impl == "matmul"
            and ccfg.tail_impl == "pallas"
            and chain._pallas_tail_ok(ccfg, (cfg.n_chan,))):
        return False
    # one rung of the time-major FIR ladder must actually serve this
    # chunk: the in-tail fused block plan, or the standalone time-major
    # Toeplitz (chunk % block == 0). Odd chunks (e.g. a trimmed file
    # whose frame count only divides by 8) otherwise land on a path
    # that raises — fall back to the chan-major pipeline instead.
    bn = fir_matmul.tail_fir_block(ccfg.chunk, ccfg.n_taps,
                                   chain._tail_tile(ccfg.chunk,
                                                    ccfg.n_taps))
    if bn is not None:
        return True
    try:
        return ccfg.chunk % ccfg.fir_plan.block == 0
    except Exception:
        return False


def _is_i16_pair(iq) -> bool:
    """True for a plain (re_i16, im_i16) tuple. Any other plain 2-tuple
    of arrays raises: silently quantizing float planes to int16 (the old
    behavior) collapses a ±1.0-scale signal to ~0 after dequantize
    (ADVICE r4) — float pairs must come wrapped as cx.CX."""
    if not (isinstance(iq, tuple) and not isinstance(iq, cx.CX)
            and len(iq) == 2):
        return False
    dt = getattr(iq[0], "dtype", None)       # works on tracers too
    if dt is None:
        dt = np.asarray(iq[0]).dtype
    if np.dtype(dt) != np.int16:
        raise TypeError(
            f"plain 2-tuple IQ must be (re_i16, im_i16) int16 planes, got "
            f"dtype {dt}; wrap float planes as cx.CX(re, im)")
    return True


def _as_f32_cx(iq) -> cx.CX:
    """CX passthrough; plain (re_i16, im_i16) tuples dequantize to
    f32 (CX is itself a NamedTuple — check it first)."""
    if _is_i16_pair(iq):
        return cx.CX(iq[0].astype(jnp.float32) * (1.0 / 32768.0),
                     iq[1].astype(jnp.float32) * (1.0 / 32768.0))
    return iq


def _process_traced_tmajor(cfg: WidebandConfig, params: WidebandParams,
                           state: WidebandState, iq
                           ) -> tuple[WidebandState, chain.ChainOutput]:
    """TIME-MAJOR flagship body: zero transpose passes between stages.

    fused channelizer (time-major out) → time-major Toeplitz passband
    (ops/fir_matmul.fir_matmul_stream_tmajor_c) → fused tail with
    in-kernel RSSI → audio [frames·L, n_chan] in cfg.audio_dtype.
    Sample-identical to the chan-major path (kernel classes unchanged —
    only layouts differ); state pytree identical, so layouts can switch
    mid-stream."""
    from supersdr_tpu.ops import fir_matmul
    plan = pfb_plan(cfg)
    ccfg = cfg.chain_cfg
    if not _tmajor_fused_ok(cfg):
        # fallback: chan-major pipeline + one transpose keeps the
        # per-config output contract (small/odd shapes only — the
        # headline shapes always take the fused path)
        iq = _as_f32_cx(iq)
        pfb_carry, chans = channelize_dispatch(
            cfg, params, cx.to_complex(state.pfb_carry),
            cx.to_complex(iq))
        cstate, out = chain.process_traced(ccfg, params.chain,
                                           state.chain, cx.split(chans))
        audioT = jnp.swapaxes(out.audio, -1, -2).astype(
            _audio_np_dtype(cfg))
        bb = cx.CX(jnp.swapaxes(out.baseband.re, -1, -2),
                   jnp.swapaxes(out.baseband.im, -1, -2))
        return (WidebandState(pfb_carry=cx.split(pfb_carry), chain=cstate),
                chain.ChainOutput(audio=audioT, rssi=out.rssi,
                                  baseband=bb))

    from supersdr_tpu.ops.pallas import channelize_fused
    on_tpu = jax.default_backend() in ("tpu", "axon")
    ov = ccfg.n_taps - 1
    if _planar_active(cfg):
        # FULLY zero-copy coupling: the channelizer's raw [n1, nf, n2]
        # planes feed the FIR-fused tail's window DMAs directly —
        # no transpose pass exists anywhere in the pipeline. Audio and
        # RSSI rows come out in PLANAR channel order (see
        # `audio_channel_order`; `channel_freqs` is row-aligned).
        # fast profile: the coupling buffer stores bf16 — stage B is
        # already bf16-rounded there, and the FIR dot casts its windows
        # to bf16 anyway, so the half-width round-trip is precision-free
        # (quality's dot3 needs the f32 planes); gated on the oracle SNR
        raw_dtype = (jnp.bfloat16
                     if (cfg.chan_precision == "default"
                         and cfg.passband_precision == "default")
                     else jnp.float32)
        n1f, n2f = _factors_for(cfg)
        levels = _split_levels_for(cfg, n2f)
        pfb_carry, (raw_r, raw_i) = channelize_fused.channelize_fused_c(
            plan, params.W_pfb, state.pfb_carry, iq,
            bf16_mxu=(cfg.chan_precision == "default"),
            tile_t=cfg.chan_tile_t, interpret=not on_tpu,
            out_layout="raw3", out_dtype=raw_dtype,
            factors=(n1f, n2f), split_levels=levels)
        # os_carry (bin-order [C, ov]): transpose of the TINY raw tail
        # [n1, ov, n2] → [n2, n1, ov] → [M, ov]; raw row p = col·n1+k1
        # is bin m = k2(col)·n1 + k1 — identity except under the
        # stage-B split, where the static row gather reorders it
        tr = jnp.transpose(raw_r[:, -ov:, :], (2, 0, 1)).reshape(
            cfg.n_chan, ov).astype(jnp.float32)
        ti = jnp.transpose(raw_i[:, -ov:, :], (2, 0, 1)).reshape(
            cfg.n_chan, ov).astype(jnp.float32)
        if levels:
            colmap = channelizer.stageb_col_to_k2(n2f, levels)
            col_of_k2 = np.argsort(colmap)
            b = np.arange(cfg.n_chan)
            p_of_b = col_of_k2[b // n1f] * n1f + (b % n1f)
            tr, ti = tr[p_of_b], ti[p_of_b]
        os_carry = cx.CX(tr, ti)
        cstate, audioT, rssi = chain.process_tail_tmajor(
            ccfg, params.chain, state.chain, state.chain.phase, None,
            os_carry, audio_dtype=_audio_np_dtype(cfg),
            fir_x3=(raw_r, raw_i),
            chan_order=audio_channel_order(cfg))
        return (WidebandState(pfb_carry=cx.split(pfb_carry), chain=cstate),
                chain.ChainOutput(audio=audioT, rssi=rssi, baseband=None))

    # CX planes go in directly: the kernel stitches carry/x itself, so
    # no complex materialization, concat or pad pass touches the 660 MB
    # input — the planes reshape zero-copy into the kernel's DMA source
    iq = _as_f32_cx(iq)
    pfb_carry, chansT = channelize_fused.channelize_fused_c(
        plan, params.W_pfb, state.pfb_carry, iq,
        bf16_mxu=(cfg.chan_precision == "default"),
        tile_t=cfg.chan_tile_t, interpret=not on_tpu, out_layout="time")

    chansT_cx = cx.split(chansT)
    os_carry = cx.CX(chansT_cx.re[-ov:].T, chansT_cx.im[-ov:].T)
    if params.chain.W_tailpass is not None:
        # passband FUSED into the tail kernel: y never touches HBM
        # (baseband output is therefore unavailable on this path)
        cstate, audioT, rssi = chain.process_tail_tmajor(
            ccfg, params.chain, state.chain, state.chain.phase,
            chansT_cx, os_carry, audio_dtype=_audio_np_dtype(cfg),
            fir_x=chansT_cx)
        return (WidebandState(pfb_carry=cx.split(pfb_carry), chain=cstate),
                chain.ChainOutput(audio=audioT, rssi=rssi, baseband=None))

    # standalone passband: ride the dot output dim order — carry is
    # stored channel-major in ChainState (layout-switch compatible)
    carry_T = cx.CX(state.chain.os_carry.re.T, state.chain.os_carry.im.T)
    new_carry_T, yT = fir_matmul.fir_matmul_stream_tmajor_c(
        ccfg.fir_plan, params.chain.W_pass, carry_T, chansT_cx,
        precision=cx.resolve_precision(ccfg.passband_precision))

    cstate, audioT, rssi = chain.process_tail_tmajor(
        ccfg, params.chain, state.chain, state.chain.phase, yT, os_carry,
        audio_dtype=_audio_np_dtype(cfg))
    return (WidebandState(pfb_carry=cx.split(pfb_carry), chain=cstate),
            chain.ChainOutput(audio=audioT, rssi=rssi, baseband=yT))


def process_traced(cfg: WidebandConfig, params: WidebandParams,
                   state: WidebandState, iq: cx.CX
                   ) -> tuple[WidebandState, chain.ChainOutput]:
    """Traced-context body: iq [chunk_in] split-complex wideband →
    audio [n_chan, chunk_per_chan·upsample] (cfg.time_major: audio
    [chunk_per_chan·upsample, n_chan]). All boundary leaves float."""
    if cfg.time_major:
        return _process_traced_tmajor(cfg, params, state, iq)
    iq = _as_f32_cx(iq)
    pfb_carry, chans = channelize_dispatch(
        cfg, params, cx.to_complex(state.pfb_carry), cx.to_complex(iq))
    cstate, out = chain.process_traced(cfg.chain_cfg, params.chain,
                                       state.chain, cx.split(chans))
    return (WidebandState(pfb_carry=cx.split(pfb_carry), chain=cstate), out)


_process_cx = partial(jax.jit, static_argnums=0)(process_traced)


def process(cfg: WidebandConfig, params: WidebandParams,
            state: WidebandState, iq
            ) -> tuple[WidebandState, chain.ChainOutput]:
    """iq: [chunk_in] wideband — CX or complex numpy (split host-side,
    TPU-safe) → audio [n_chan, chunk_per_chan·upsample], one fused
    PFB+chains device program."""
    return _process_cx(cfg, params, state, cx.as_cx(iq))


def process_many_traced(cfg: WidebandConfig, params: WidebandParams,
                        state: WidebandState, iq_chunks: cx.CX
                        ) -> tuple[WidebandState, jax.Array]:
    """Several consecutive chunks in ONE device program.

    iq_chunks: [n_chunks, chunk_in] split-complex → audio
    [n_chunks, n_chan, chunk_per_chan · upsample].

    A `lax.scan` over the chunk axis threads the streaming state through
    sample-exactly (identical results to n_chunks `process` calls), while
    paying host→device dispatch once per *batch* instead of once per
    chunk — the dispatch/RPC amortization that keeps a tunneled or
    remote-driven TPU busy at streaming rates.
    """
    def body(st, chunk):
        st2, out = process_traced(cfg, params, st, chunk)
        return st2, out.audio

    if cfg.chan_impl in ("mxu2pallas", "mxu2fused") \
            or cfg.tail_impl == "pallas":
        # Pallas kernels inside a lax.scan body failed on the round-3
        # runtime (UNIMPLEMENTED at execution); the r4 runtime accepts
        # them (benchmarks/probe_pallas_scan_rdma.py) but the unrolled
        # trace remains the shipped form at N_SCAN=1. Unroll the chunk
        # loop: same one-dispatch batching, marginally larger program.
        st = state
        outs = []
        for i in range(iq_chunks.shape[0]):
            st, audio = body(st, iq_chunks[i])
            outs.append(audio)
        if len(outs) == 1:
            # expand_dims is a free reshape; a 1-element jnp.stack cost
            # a measurable extra audio copy on the TPU runtime
            if isinstance(outs[0], cx.CX):
                return st, cx.CX(outs[0].re[None], outs[0].im[None])
            return st, outs[0][None]
        if isinstance(outs[0], cx.CX):
            return st, cx.stack(outs, 0)    # IQ mode: split-complex audio
        return st, jnp.stack(outs, 0)
    return jax.lax.scan(body, state, iq_chunks)


_process_many_cx = partial(jax.jit, static_argnums=0)(process_many_traced)


def process_many(cfg: WidebandConfig, params: WidebandParams,
                 state: WidebandState, iq_chunks
                 ) -> tuple[WidebandState, jax.Array]:
    """Public multi-chunk step: iq_chunks [n_chunks, chunk_in] as CX or
    complex numpy; returns (state, audio[n_chunks, n_chan, out_len])."""
    return _process_many_cx(cfg, params, state, cx.as_cx(iq_chunks))


_process_i16_jit = partial(jax.jit, static_argnums=0)(process_traced)


def process_n_traced(cfg: WidebandConfig, params: WidebandParams,
                     state: WidebandState, iqs: tuple
                     ) -> tuple[WidebandState, tuple]:
    """N consecutive chunks in ONE device program, audio returned as a
    TUPLE (no [N, ...] stack — a 1-chunk stack measured an extra audio
    copy on this runtime, and ~0.4 ms/chunk of per-dispatch gap hides
    behind the second chunk at the tunneled dispatch rate). Each chunk
    is a CX (or an (re_i16, im_i16) pair — mixable is pointless but
    harmless)."""
    outs = []
    for iq in iqs:
        state, out = process_traced(cfg, params, state, iq)
        outs.append(out.audio)
    return state, tuple(outs)


_process_n_jit = partial(jax.jit, static_argnums=0)(process_n_traced)


def process_n(cfg: WidebandConfig, params: WidebandParams,
              state: WidebandState, iqs) -> tuple[WidebandState, tuple]:
    """Public multi-chunk step with tuple outputs (see
    process_n_traced); iqs: sequence of CX / complex numpy / i16 pairs."""
    def coerce(iq):
        if _is_i16_pair(iq):
            return (jnp.asarray(iq[0], jnp.int16),
                    jnp.asarray(iq[1], jnp.int16))
        return cx.as_cx(iq)
    return _process_n_jit(cfg, params, state, tuple(coerce(q) for q in iqs))


def process_i16(cfg: WidebandConfig, params: WidebandParams,
                state: WidebandState, iq16
                ) -> tuple[WidebandState, chain.ChainOutput]:
    """One chunk of INT16 IQ (the 16-bit ADC / KiwiSDR IQ wire format):
    iq16 = (re_i16, im_i16) [chunk_in] planes, full-scale ±32768 ≡ ±1.0.

    On the planar fused path the i16 planes stream straight into the
    channelizer kernel's window DMAs (HALF the input HBM read; the
    dequantize rides the in-VMEM window staging). All other configs
    dequantize up front and run the standard pipeline — identical
    semantics everywhere (~90 dB quantization floor, far above both
    profile tiers)."""
    re16 = jnp.asarray(iq16[0], jnp.int16)
    im16 = jnp.asarray(iq16[1], jnp.int16)
    return _process_i16_jit(cfg, params, state, (re16, im16))


def channel_freqs(cfg: WidebandConfig, center_hz: float = 0.0,
                  order: np.ndarray | None = None) -> np.ndarray:
    """Absolute center frequency of each OUTPUT ROW given the capture
    center.

    By default row order follows the SERIAL pipeline's
    `audio_channel_order` (identity except on the planar fused path).
    MESH consumers must pass their process fn's own row→bin map —
    ``channel_freqs(cfg, order=process.channel_order)`` — because
    `sharded_wideband.build` can emit a different row order than the
    serial path (bin order on the fallback tiers, a device-count-
    dependent planar order otherwise; ADVICE r4)."""
    plan = pfb_plan(cfg)
    freqs = center_hz + channelizer.channel_center_freqs(plan, cfg.fs_in)
    if order is None:
        order = audio_channel_order(cfg)
    return freqs[np.asarray(order)]
