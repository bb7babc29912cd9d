"""Polyphase resampling (12 kHz audio → 48 kHz DAC and rational L/M).

The reference upsamples by zero-stuffing ×4, prepending an `n_tap-1` carry,
then running one windowed-sinc lowpass with `np.convolve(mode="valid")` and
a ×4 gain (/root/reference/utils_supersdr.py:1125-1134); 20 kHz kiwis use
`scipy.resample_poly` (:1126). Both are reproduced here with identical
streaming semantics.

TPU formulation: the zero-stuffed convolution is algebraically a polyphase
matrix product — each output frame of L samples is `frames @ P` where
`frames` gathers `ceil(n_taps/L)` input samples and `P` is the [per, L]
polyphase tap matrix. That makes the hot path an MXU matmul over a batch of
frames instead of a scalar FIR loop, with history carried functionally.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from supersdr_tpu.ops import firdesign


@dataclass(frozen=True)
class InterpPlan:
    """Streaming L× interpolator (integer upsample; M=1)."""
    L: int
    n_taps: int
    per: int  # taps per polyphase branch = ceil(n_taps / L)

    @property
    def history(self) -> int:
        # input-domain history needed so every output frame sees `per`
        # past input samples
        return self.per - 1


def design_interp(kiwi_rate: int, audio_rate: int) -> tuple["InterpPlan", np.ndarray]:
    """Reference design: lowpass at kiwi_rate/2 designed at audio_rate
    (utils_supersdr.py:999 `filtering(KIWI_RATE/2, AUDIO_RATE)`)."""
    if audio_rate % kiwi_rate:
        raise ValueError("use rational_resample for non-integer ratios")
    L = audio_rate // kiwi_rate
    taps = firdesign.lowpass_taps(kiwi_rate / 2.0, audio_rate)
    return plan_interp(L, taps)


def plan_interp(L: int, taps: np.ndarray) -> tuple[InterpPlan, np.ndarray]:
    """Build the polyphase matrix for L× zero-stuff interpolation.

    Derivation: with u the zero-stuffed input (u[kL]=x[k]) extended into the
    past by the reference's n_tap-1 carry, the valid-convolve output is
    y[i] = sum_j h[j] u[i-j].  Writing i = nL + p, the only nonzero u terms
    have j = qL + p, giving y[nL+p] = sum_q h[qL+p] x[n-q].  Frame row m of
    the gathered input window holds x[n - (per-1-m)], so
    P[m, p] = h[(per-1-m)·L + p].  Matrix shape: [per, L].
    """
    n_taps = len(taps)
    per = int(np.ceil(n_taps / L))
    P = np.zeros((per, L), dtype=np.float64)
    for p in range(L):
        for m in range(per):
            j = (per - 1 - m) * L + p
            if j < n_taps:
                P[m, p] = taps[j]
    P *= L  # reference multiplies by SAMPLE_RATIO after filtering
    return InterpPlan(L=L, n_taps=n_taps, per=per), P


def init_carry(plan: InterpPlan, batch_shape: tuple[int, ...] = (),
               dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(batch_shape + (plan.history,), dtype=dtype)


@partial(jax.jit, static_argnums=(0, 4))
def interpolate(plan: InterpPlan, P: jax.Array, carry: jax.Array,
                x: jax.Array, impl: str = "einsum"
                ) -> tuple[jax.Array, jax.Array]:
    """One streaming step: x[*batch, n] → y[*batch, n*L].

    Matches the reference zero-stuff + valid-convolve + ×L pipeline sample
    for sample (given the same taps and zero initial history).

    Two formulations (identical outputs; A/B'd at the pipeline level on
    chip — see docs/PERFORMANCE.md):
      "einsum": stack `per` shifted slices → one MXU matmul [.., n, per] @
                [per, L].
      "fma":    broadcast FMA chain y[.., t, p] = Σ_m seg[t+m]·P[m, p] —
                pure elementwise VPU work, no frames materialization.
    """
    seg = jnp.concatenate([carry, x], axis=-1)          # [..., hist + n]
    n = x.shape[-1]
    if impl == "fma":
        Pf = P.astype(seg.dtype)
        y = seg[..., 0:n, None] * Pf[0]
        for m in range(1, plan.per):
            y = y + seg[..., m:m + n, None] * Pf[m]     # [..., n, L]
        y = y.reshape(*x.shape[:-1], n * plan.L)
    else:
        frames = jnp.stack([seg[..., p:p + n] for p in range(plan.per)],
                           axis=-1)                     # [..., n, per]
        y = jnp.einsum("...np,pl->...nl", frames, P.astype(frames.dtype),
                       precision=jax.lax.Precision.HIGHEST)
        y = y.reshape(*x.shape[:-1], n * plan.L)
    new_carry = seg[..., -plan.history:] if plan.history else seg[..., :0]
    return new_carry, y


@dataclass(frozen=True)
class RationalPlan:
    """Streaming L/M rational resampler (e.g. 20 kHz kiwi → 48 kHz: 12/5)."""
    L: int
    M: int
    n_taps: int

    @property
    def history(self) -> int:
        return self.n_taps - 1  # in the L-upsampled domain


def plan_rational(in_rate: int, out_rate: int,
                  taps: np.ndarray | None = None) -> tuple["RationalPlan", np.ndarray]:
    g = int(np.gcd(in_rate, out_rate))
    L, M = out_rate // g, in_rate // g
    if taps is None:
        # anti-image + anti-alias lowpass at min(in,out)/2, designed at L*in
        taps = firdesign.lowpass_taps(min(in_rate, out_rate) / 2.0, L * in_rate)
    return RationalPlan(L=L, M=M, n_taps=len(taps)), np.asarray(taps)


def rational_resample_block(plan: RationalPlan, taps: jax.Array,
                            carry: jax.Array, x: jax.Array
                            ) -> tuple[jax.Array, jax.Array]:
    """Resample a block whose length is a multiple of M; output n*L/M.

    Zero-stuff by L, convolve (valid, with carried history in the upsampled
    domain), scale by L, take every M-th sample. Phase continuity across
    blocks holds because block*L ≡ 0 (mod M).
    """
    n = x.shape[-1]
    if (n * plan.L) % plan.M:
        raise ValueError("block length * L must be divisible by M")
    up = jnp.zeros(x.shape[:-1] + (n * plan.L,), dtype=x.dtype)
    up = up.at[..., :: plan.L].set(x)
    seg = jnp.concatenate([carry, up], axis=-1)
    idx = jnp.arange(0, n * plan.L, plan.M)[:, None] + jnp.arange(plan.n_taps)[None, :]
    frames = seg[..., idx]
    h_rev = taps[::-1].astype(frames.dtype)
    y = plan.L * jnp.einsum("...nt,t->...n", frames, h_rev)
    new_carry = seg[..., -plan.history:]
    return new_carry, y
