"""Polyphase filterbank channelizer: one wideband capture → M virtual
receivers.

The reference caps out at two receivers, each a separate server socket
(supersdr.py:624-639); BASELINE.md's channelizer config wants 100+ AM
channels from a full MW-band capture. The TPU formulation is the classic
weighted-overlap-add (WOLA) polyphase filterbank:

    x framed at hop M  →  [n_frames, K·M] windows
    multiply by the polyphase-decomposed prototype and fold K taps
    (an einsum → MXU work)  →  [n_frames, M]
    IFFT across the M axis  →  per-channel complex baseband at fs/M

Channel m is centered at m·fs/M (wrapped to ±fs/2). Critically sampled by
default; `osr=2` gives 2× oversampled channels (hop M/2) whose extra
bandwidth tolerates per-channel passband offsets.

The output [..., M, n_frames] feeds the batched receiver chain directly
(channel axis = vmap/shard axis), so wideband → thousands of demodulated
audio streams is two fused device programs end to end.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from supersdr_tpu.ops import cx, firdesign


@dataclass(frozen=True)
class PFBPlan:
    """Static channelizer structure.

    n_chan:   number of channels M (FFT length across the filterbank)
    taps_per: prototype taps per branch K (prototype length = K·M)
    hop:      input samples per output frame (M for critical sampling,
              M//osr when oversampled)
    """
    n_chan: int
    taps_per: int
    hop: int

    @property
    def window_len(self) -> int:
        return self.n_chan * self.taps_per

    @property
    def history(self) -> int:
        return self.window_len - self.hop


@lru_cache(maxsize=64)
def design(n_chan: int, taps_per: int = 8, osr: int = 1,
           cutoff_scale: float = 1.0) -> tuple[PFBPlan, np.ndarray]:
    """Design the prototype lowpass and plan. Cutoff at
    `cutoff_scale · fs/(2M)` (channel half-width), Blackman-windowed sinc
    with the framework's design rule at fixed length K·M."""
    if osr not in (1, 2, 4):
        raise ValueError("osr must be 1, 2 or 4")
    if n_chan % osr:
        raise ValueError("n_chan must be divisible by osr")
    n = n_chan * taps_per
    if n % 2 == 0:
        # design rule wants odd; design at n+1 then drop the last (zero-ish)
        proto = firdesign.lowpass_taps_n(cutoff_scale * 0.5 / n_chan, 1.0,
                                        n + 1)[:-1]
    else:
        proto = firdesign.lowpass_taps_n(cutoff_scale * 0.5 / n_chan, 1.0, n)
    proto = proto / proto.sum()  # unity per-channel passband (DC) gain
    plan = PFBPlan(n_chan=n_chan, taps_per=taps_per, hop=n_chan // osr)
    proto = proto.astype(np.float64)
    proto.setflags(write=False)  # cached instance shared across callers
    return plan, proto


def taps_matrix(plan: PFBPlan, proto: np.ndarray) -> jnp.ndarray:
    """Polyphase weights as [taps_per, n_chan] (row k = taps[k·M .. k·M+M))
    in time-reversed fold order for the WOLA sum."""
    W = proto.reshape(plan.taps_per, plan.n_chan)
    return jnp.asarray(W, jnp.float32)


def init_carry(plan: PFBPlan, batch_shape: tuple[int, ...] = ()) -> cx.CX:
    """Zero filter history [*batch, history] (split-complex)."""
    return cx.zeros(batch_shape + (plan.history,))


def channelize_c(plan: PFBPlan, W: jax.Array, carry: jax.Array, x: jax.Array,
                 mxu_fft: bool = False) -> tuple[jax.Array, jax.Array]:
    """One streaming step on complex arrays — traced contexts only
    (complex64 cannot cross TPU program boundaries; use `channelize` for
    the public split-complex entry point). x: [*batch, n] complex64 with
    n % hop == 0.

    Returns (new_carry, channels [*batch, n_chan, n // hop]) where
    channels[m, t] is the complex baseband of the band centered at
    m·fs/n_chan (m interpreted mod M, i.e. m > M/2 are negative freqs),
    decimated to fs/hop, with the per-channel mixer phase referenced to the
    *stream* origin so consecutive calls are continuous.

    Matches the direct implementation
        y[m, t] = Σ_j proto[j] · x[t·hop - j] · e^{+2πi m (t·hop - j)/M}
    evaluated blockwise (j over the window, x padded with the carry).
    """
    n = x.shape[-1]
    if n % plan.hop:
        raise ValueError("block length must be a multiple of the hop")
    if n % plan.n_chan:
        raise ValueError("block length must be a multiple of n_chan "
                         "(keeps channel mixer phase continuous across calls)")
    n_frames = n // plan.hop
    M, K, hop = plan.n_chan, plan.taps_per, plan.hop
    seg = jnp.concatenate([carry, x], axis=-1)   # [..., history + n]

    # Derivation: y[m,t] = Σ_j h[j] x[s_t-j] e^{-2πi m (s_t-j)/M}.  With
    # g[p] = h[KM-1-p] (time-reversed prototype) and p = kM + r,
    #   y[m,t] = e^{2πi m ((KM-1) - s_t)/M} · FFT_M{ fold }[m],
    #   fold[r] = Σ_k (g·frames)[kM + r],  frames[t, p] = seg[t·hop + p].
    g = W.reshape(-1)[::-1]
    if hop == M:
        # critical sampling: the overlapping-window gather collapses to K
        # shifted row-slices of seg reshaped [n_frames+K-1, M] — a K-tap
        # depthwise conv down the rows axis. XLA lowers the big gather to
        # a pathological scatter/loop on TPU (measured 14.8 s vs ~10 ms
        # for the slice form at the bench config); never gather here.
        rows = seg.reshape(*seg.shape[:-1], n_frames + K - 1, M)
        g2 = g.reshape(K, M)
        fold = g2[0] * rows[..., 0:n_frames, :]
        for k in range(1, K):
            fold = fold + g2[k] * rows[..., k:k + n_frames, :]
    else:
        idx = (jnp.arange(n_frames)[:, None] * hop
               + jnp.arange(plan.window_len)[None, :])
        frames = seg[..., idx]                    # [..., n_frames, K·M]
        fold = (frames * g).reshape(*frames.shape[:-1], K, M).sum(-2)
    if mxu_fft and cx.fft_supported(M):
        # MXU four-step FFT: ahead of the FFT HLO in isolation (10.6 vs
        # 12.3 ms/chunk at M=2560) but A/B'd at the pipeline level before
        # enabling — in-context fusion can invert isolated wins
        spec_cx = cx.fft(cx.split(fold))
        spec = cx.to_complex(spec_cx)             # stays split inside jit
    else:
        spec = jnp.fft.fft(fold, axis=-1)         # [..., n_frames, M]

    # (KM-1) - s_t = history - t·hop  (mod M); for critical sampling
    # (hop = M) history = (K-1)·M so rot ≡ 0 — statically skip the
    # rotation (two full passes over the spectrum otherwise)
    if hop == M:
        chans = spec
    else:
        m_idx = jnp.arange(M)
        t_idx = jnp.arange(n_frames)
        rot = (plan.history - t_idx[:, None] * hop) % M
        phase = jnp.exp((2j * jnp.pi / M) * (m_idx[None, :] * rot))
        chans = spec * phase.astype(spec.dtype)

    new_carry = seg[..., -plan.history:]
    out = jnp.moveaxis(chans, -2, -1)             # [..., M, n_frames]
    return new_carry, out


@partial(jax.jit, static_argnums=0)
def _channelize_cx(plan: PFBPlan, W: jax.Array, carry: cx.CX, x: cx.CX
                   ) -> tuple[cx.CX, cx.CX]:
    c, out = channelize_c(plan, W, cx.to_complex(carry), cx.to_complex(x))
    return cx.split(c), cx.split(out)


def channelize(plan: PFBPlan, W, carry, x) -> tuple[cx.CX, cx.CX]:
    """Public streaming step with split-complex (TPU-safe) boundaries.
    Accepts CX / complex / real for carry and x; see `channelize_c`."""
    return _channelize_cx(plan, W, cx.as_cx(carry), cx.as_cx(x))


def channel_center_freqs(plan: PFBPlan, fs: float) -> np.ndarray:
    """Center frequency (Hz, wrapped to ±fs/2) of each channel index."""
    m = np.arange(plan.n_chan)
    f = m * fs / plan.n_chan
    f[f >= fs / 2] -= fs
    return f
