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


# On-chip A/B-winning kernel tuning (benchmarks/ab_full.py, measured
# ladder in docs/PERFORMANCE.md). Both profiles use the fully-fused
# Pallas channelizer (fold + both DIF FFT stages in one VMEM pass,
# ops/pallas/channelize_fused.py for "fast") AND the fused chain tail
# (demod+DC+AGC+resample, ops/pallas/chain_tail.py, both profiles):
# "fast" = 1.81 Gsps/chip at ~54 dB oracle audio SNR (bf16 matmuls);
# "quality" = 1.14 Gsps at ~83 dB — it pairs the full-precision Pallas
# FOLD with the XLA 3-pass DIF FFT, because Mosaic has no multi-pass
# dot and the fused kernel's in-kernel stage B is bf16-bound (the MID
# integrity gate caught exactly this: a "quality" fused-channelizer
# variant read 82.9 dB on the 16-chan gate, which takes the XLA
# fallback, but only 56.5 dB at the headline's 2560 channels). The
# kernels need a working Mosaic toolchain and lane-multiple n_chan;
# other shapes fall back to the XLA paths automatically.
PROFILES = {
    "fast": dict(passband_impl="matmul", passband_precision="default",
                 chan_impl="mxu2fused", chan_precision="default",
                 resample_impl="matmul",
                 resample_precision="high", tail_impl="pallas"),
    "quality": dict(passband_impl="matmul", passband_precision="high",
                    chan_impl="mxu2pallas", chan_precision="high",
                    resample_impl="matmul",
                    resample_precision="high", tail_impl="pallas"),
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

    def __post_init__(self):
        if self.fs_in % self.n_chan:
            raise ValueError("n_chan must divide fs_in")
        if self.chunk_in % self.n_chan:
            raise ValueError("chunk_in must be a multiple of n_chan")
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


def process_traced(cfg: WidebandConfig, params: WidebandParams,
                   state: WidebandState, iq: cx.CX
                   ) -> tuple[WidebandState, chain.ChainOutput]:
    """Traced-context body: iq [chunk_in] split-complex wideband →
    audio [n_chan, chunk_per_chan·upsample]. All boundary leaves float."""
    plan = pfb_plan(cfg)
    if cfg.pallas_fold:
        from supersdr_tpu.ops.pallas import pfb_fold
        # fold-order taps G[k, r] = rev(proto)[k·M + r], derived from W
        G = params.W_pfb.reshape(-1)[::-1].reshape(cfg.taps_per, cfg.n_chan)
        interpret = jax.default_backend() not in ("tpu", "axon")
        pfb_carry, chans = pfb_fold.channelize_pallas_c(
            plan, G, cx.to_complex(state.pfb_carry), cx.to_complex(iq),
            interpret=interpret)
    elif cfg.chan_impl == "stub":
        # knockout-profiling stub (semantics-free): reshape-decimate +
        # transpose — the minimal [chunk]→[M, frames] layout work with
        # no fold and no FFT, so `full - stub` bounds the channelizer's
        # in-context compute cost
        x2 = cx.to_complex(iq).reshape(cfg.chunk_per_chan, cfg.n_chan)
        chans = jnp.swapaxes(x2, 0, 1)
        pfb_carry = cx.to_complex(state.pfb_carry)
    elif cfg.chan_impl == "nofft":
        # knockout-profiling: real fold (f16) + transpose, FFT skipped —
        # `full - nofft` isolates the two DIF matmul stages in context
        plan2 = plan
        seg = jnp.concatenate([cx.to_complex(state.pfb_carry),
                               cx.to_complex(iq)], axis=-1)
        nf = cfg.chunk_per_chan
        rows_r = jnp.real(seg).reshape(nf + cfg.taps_per - 1, cfg.n_chan
                                       ).astype(jnp.float16)
        rows_i = jnp.imag(seg).reshape(nf + cfg.taps_per - 1, cfg.n_chan
                                       ).astype(jnp.float16)
        g2 = params.W_pfb.reshape(-1)[::-1].reshape(cfg.taps_per,
                                                    cfg.n_chan)
        fr = channelizer._fold_slices(g2, rows_r, nf, cfg.taps_per)
        fi = channelizer._fold_slices(g2, rows_i, nf, cfg.taps_per)
        chans = jax.lax.complex(fr.T, fi.T)
        pfb_carry = seg[..., -plan2.history:]
    elif cfg.chan_impl == "mxu2fused":
        # single-VMEM-pass Pallas kernel: fold + both DIF FFT stages
        # (ops/pallas/channelize_fused.py); lane-aligned n_chan only —
        # other sizes (e.g. the 16-chan integrity gate) fall back to the
        # XLA mxu2 path at the matching precision tier
        from supersdr_tpu.ops.pallas import channelize_fused
        fac = channelizer._pick_factors(cfg.n_chan)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if fac is not None and fac[1] % 128 == 0:
            pfb_carry, chans = channelize_fused.channelize_fused_c(
                plan, params.W_pfb, cx.to_complex(state.pfb_carry),
                cx.to_complex(iq),
                bf16_mxu=(cfg.chan_precision == "default"),
                interpret=not on_tpu)
        else:
            pfb_carry, chans = channelizer.channelize_mxu2_c(
                plan, params.W_pfb, cx.to_complex(state.pfb_carry),
                cx.to_complex(iq), fold_impl="slices",
                precision=cx.resolve_precision(cfg.chan_precision),
                fold_dtype=jnp.float32)
    elif cfg.chan_impl in ("mxu2", "mxu2conv", "mxu2pallas"):
        fold_impl = {"mxu2": "slices", "mxu2conv": "conv",
                     "mxu2pallas": "pallas"}[cfg.chan_impl]
        pfb_carry, chans = channelizer.channelize_mxu2_c(
            plan, params.W_pfb, cx.to_complex(state.pfb_carry),
            cx.to_complex(iq), fold_impl=fold_impl,
            precision=cx.resolve_precision(cfg.chan_precision),
            fold_dtype=(jnp.float16 if cfg.chan_fold_dtype == "f16"
                        else jnp.float32),
            fft_form=cfg.chan_fft_form)
    else:
        pfb_carry, chans = channelizer.channelize_c(
            plan, params.W_pfb, cx.to_complex(state.pfb_carry),
            cx.to_complex(iq), mxu_fft=cfg.mxu_chan_fft)
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
        # Pallas kernels inside a lax.scan body fail on this runtime
        # (UNIMPLEMENTED at execution; isolated round 3 — top-level
        # pallas_call compiles and runs fine). Unroll the chunk loop in
        # the trace instead: same one-dispatch batching, marginally
        # larger program.
        st = state
        outs = []
        for i in range(iq_chunks.shape[0]):
            st, audio = body(st, iq_chunks[i])
            outs.append(audio)
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


def channel_freqs(cfg: WidebandConfig, center_hz: float = 0.0) -> np.ndarray:
    """Absolute center frequency of each channel given the capture center."""
    plan = pfb_plan(cfg)
    return center_hz + channelizer.channel_center_freqs(plan, cfg.fs_in)
