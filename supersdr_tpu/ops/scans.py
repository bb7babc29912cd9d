"""Parallel (associative) scan building blocks for streaming DSP.

Sequential recurrences are the TPU-hostile part of an SDR chain (AGC peak
tracking, one-pole smoothing, DC blockers). Instead of `lax.scan` at sample
rate (serial, VPU-starved), every first-order recurrence used in this
framework is expressed as an *associative* operator and evaluated with
`jax.lax.associative_scan`, which runs in O(log n) depth of full-width
vector ops — the idiomatic TPU formulation.

Two recurrence families cover everything we need:

  linear   : y[n] = a[n] * y[n-1] + b[n]          (one-pole IIR, DC block)
  max-plus : y[n] = max(y[n-1] + a[n], b[n])      (peak detector w/ decay,
                                                   in log/dB domain)

Both are associative under composition of the affine / tropical-affine maps
(a, b), so they parallelize exactly (not approximately).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_scan(a: jax.Array, b: jax.Array, y0, axis: int = -1) -> jax.Array:
    """Evaluate y[n] = a[n] * y[n-1] + b[n] with y[-1] = y0, in parallel.

    `a` and `b` have the same shape; the recurrence runs along `axis`.
    `y0` broadcasts against the non-scan dims. Returns y with the same
    shape as b.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)

    def combine(l, r):
        a_l, b_l = l
        a_r, b_r = r
        return a_r * a_l, a_r * b_l + b_r

    a_s, b_s = jax.lax.associative_scan(combine, (a, b), axis=axis)
    # y[n] = A[0..n] * y0 + B[0..n]
    y0 = jnp.asarray(y0, dtype=b.dtype)
    if y0.ndim < b.ndim:
        y0 = jnp.expand_dims(y0, axis=axis if axis >= 0 else b.ndim + axis)
    return a_s * y0 + b_s


def maxplus_scan(a: jax.Array, b: jax.Array, y0, axis: int = -1) -> jax.Array:
    """Evaluate y[n] = max(y[n-1] + a[n], b[n]) with y[-1] = y0, in parallel.

    This is the tropical-semiring analogue of `linear_scan`: composition of
    f_i(p) = max(p + a_i, b_i) is f_2∘f_1 = (a_1+a_2, max(b_1+a_2, b_2)).
    Used for dB-domain peak detectors: a = -decay_db_per_sample,
    b = envelope_db.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)

    def combine(l, r):
        a_l, b_l = l
        a_r, b_r = r
        return a_l + a_r, jnp.maximum(b_l + a_r, b_r)

    a_s, b_s = jax.lax.associative_scan(combine, (a, b), axis=axis)
    y0 = jnp.asarray(y0, dtype=b.dtype)
    if y0.ndim < b.ndim:
        y0 = jnp.expand_dims(y0, axis=axis if axis >= 0 else b.ndim + axis)
    return jnp.maximum(a_s + y0, b_s)


def one_pole(x: jax.Array, coeff: jax.Array, y0, axis: int = -1) -> jax.Array:
    """One-pole smoother y[n] = coeff*y[n-1] + (1-coeff)*x[n] (parallel)."""
    coeff = jnp.asarray(coeff, dtype=x.dtype)
    a = jnp.broadcast_to(coeff, x.shape)
    return linear_scan(a, (1.0 - coeff) * x, y0, axis=axis)


def dc_block(x: jax.Array, r, y0_x, y0_y, axis: int = -1):
    """DC blocker y[n] = x[n] - x[n-1] + r*y[n-1].

    Returns (y, (last_x, last_y)) so the state threads across blocks.
    `y0_x` is the final input sample of the previous block, `y0_y` the final
    output sample.
    """
    if axis not in (-1, jnp.asarray(x).ndim - 1):
        raise NotImplementedError("dc_block supports axis=-1 only")
    x = jnp.asarray(x)
    r = jnp.asarray(r, dtype=x.dtype)
    x_prev0 = jnp.broadcast_to(jnp.asarray(y0_x, x.dtype), x[..., 0].shape)
    prev = jnp.concatenate([x_prev0[..., None], x[..., :-1]], axis=-1)
    diff = x - prev
    a = jnp.broadcast_to(r, x.shape)
    y = linear_scan(a, diff, y0_y, axis=-1)
    return y, (x[..., -1], y[..., -1])


def sliding_max(x: jax.Array, window: int, axis: int = -1) -> jax.Array:
    """Causal sliding-window maximum over `window` samples (inclusive).

    y[n] = max(x[n-window+1 .. n]).  Implemented as a log2-depth cascade of
    shifted maxima (van Herk style doubling) — full-width vector ops only.
    Edge samples use a shrunken window (as if x were left-padded with -inf).
    """
    if axis not in (-1, x.ndim - 1):
        raise NotImplementedError("sliding_max supports axis=-1 only")
    if window <= 1:
        return x
    neg_inf = jnp.asarray(-jnp.inf, dtype=x.dtype)
    y = x
    covered = 1
    while covered < window:
        shift = min(covered, window - covered)
        shifted = jnp.concatenate(
            [jnp.full_like(y[..., :shift], neg_inf), y[..., :-shift]],
            axis=-1)
        y = jnp.maximum(y, shifted)
        covered += shift
    return y
