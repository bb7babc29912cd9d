"""Mesh-sharded wideband channelizer pipeline (the Ulysses-style reshard).

Two phases with different natural shardings (SURVEY.md §5):

  1. channelize — the wideband input is *time*-sharded across all devices;
     each shard runs the PFB locally with its filter history brought in by
     a multi-hop halo exchange (`left_context`), exactly as the serial
     carry would provide.
  2. demodulate — receivers are *channel*-parallel; an `all_to_all`
     re-shards [n_chan, frames] from time-split to channel-split, after
     which each device runs full-length chains for its channel subset with
     zero further communication.

The all_to_all moves each device's [n_chan, frames_local] once — the DSP
analog of the attention-head transpose in DeepSpeed-Ulysses — and rides
ICI. Output audio is channel-sharded, ready for channel-parallel sinks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supersdr_tpu.ops import channelizer, cx, scans
from supersdr_tpu.runtime import chain as chain_mod
from supersdr_tpu.runtime import wideband as wb

AXIS = "dev"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def build(cfg: wb.WidebandConfig, mesh: Mesh):
    """Compile the sharded wideband pipeline.

    Constraints: n_devices divides n_chan and chunk_in; the per-device
    input slice must be a multiple of n_chan.
    Returns process(params, state, iq[chunk_in]) -> (state, audio, rssi)
    with audio [n_chan, chunk_per_chan·L] channel-sharded.
    """
    d = mesh.devices.size
    if cfg.n_chan % d or cfg.chunk_in % (d * cfg.n_chan):
        raise ValueError("n_devices must divide n_chan and chunk_in/n_chan")
    plan = wb.pfb_plan(cfg)
    # Pallas kernels don't run under shard_map on this runtime: the mesh
    # chains use the XLA tail (the channelizer likewise maps to its XLA
    # mxu2 equivalent below)
    import dataclasses as _dc
    ccfg = _dc.replace(cfg.chain_cfg, tail_impl="xla")

    def body(params: wb.WidebandParams, state: wb.WidebandState,
             iq: cx.CX):
        # ---- phase 1: time-sharded PFB with halo history
        iqc = cx.to_complex(iq)
        idx = jax.lax.axis_index(AXIS)
        halo = scans.left_context(iqc, plan.history, AXIS)
        head = jnp.where(idx == 0, cx.to_complex(state.pfb_carry), halo)
        if cfg.chan_impl in ("mxu2", "mxu2conv", "mxu2fused",
                             "mxu2pallas"):
            # the mesh honors the serial pipeline's channelizer tuning,
            # with Pallas impls mapped to their XLA mxu2 equivalent
            # (lane-layout DIF + optional f16 fold, ops/channelizer.py)
            _, chans = channelizer.channelize_mxu2_c(
                plan, params.W_pfb, head, iqc,
                fold_impl="conv" if cfg.chan_impl == "mxu2conv"
                else "slices",
                precision=cx.resolve_precision(cfg.chan_precision),
                fold_dtype=(jnp.float16 if cfg.chan_fold_dtype == "f16"
                            else jnp.float32))
        else:
            _, chans = channelizer.channelize_c(plan, params.W_pfb, head,
                                                iqc)
        # chans: [n_chan, frames_local]
        pfb_carry = iqc[..., -plan.history:]

        # ---- reshard: time-split -> channel-split (all_to_all over ICI)
        # [n_chan, f_local] -> [n_chan/d, f_local*d]
        chans = jax.lax.all_to_all(chans, AXIS, split_axis=0, concat_axis=1,
                                   tiled=True)

        # ---- phase 2: channel-parallel chains, full time on-device
        cstate, out = chain_mod.process_traced(ccfg, params.chain,
                                               state.chain, cx.split(chans))
        # pfb carry lives on the last time shard; broadcast it so the next
        # call's shard 0 check uses the right value
        last = jax.lax.all_gather(pfb_carry, AXIS)[d - 1]
        return (wb.WidebandState(pfb_carry=cx.split(last), chain=cstate),
                out.audio, out.rssi)

    def cxspec(*p):
        return cx.CX(P(*p), P(*p))

    chain_param_spec = jax.tree.map(lambda _: P(), chain_mod.make_params(ccfg))
    chain_param_spec = chain_param_spec._replace(
        nco=chain_param_spec.nco._replace(ramp=P(AXIS, None),
                                          block_inc=P(AXIS)))
    params_spec = wb.WidebandParams(W_pfb=P(), chain=chain_param_spec)
    chain_state_spec = jax.tree.map(lambda _: P(AXIS), chain_mod.init_state(
        ccfg, (d,)))
    chain_state_spec = chain_state_spec._replace(
        os_carry=cxspec(AXIS, None), interp_carry=P(AXIS, None),
        demod=chain_state_spec.demod._replace(last_sample=cxspec(AXIS)))
    state_spec = wb.WidebandState(pfb_carry=cxspec(), chain=chain_state_spec)
    out_spec = (wb.WidebandState(pfb_carry=cxspec(), chain=chain_state_spec),
                P(AXIS, None), P(AXIS, None))

    sharded = jax.shard_map(body, mesh=mesh,
                            in_specs=(params_spec, state_spec, cxspec(AXIS)),
                            out_specs=out_spec, check_vma=False)
    jitted = jax.jit(sharded)
    state_shardings = jax.tree.map(lambda p: NamedSharding(mesh, p),
                                   state_spec,
                                   is_leaf=lambda x: isinstance(x, P))

    def process(params, state, iq):
        """iq: [chunk_in] — CX or complex numpy (split host-side)."""
        # pre-place the state so host-initialized and chained device states
        # share one jit signature (avoids a second compile on call 2)
        state = jax.device_put(state, state_shardings)
        return jitted(params, state, cx.as_cx(iq))

    return process


def make_params(cfg: wb.WidebandConfig, **kw) -> wb.WidebandParams:
    return wb.make_params(cfg, **kw)


def init_state(cfg: wb.WidebandConfig) -> wb.WidebandState:
    return wb.init_state(cfg)
