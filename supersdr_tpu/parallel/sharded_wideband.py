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
    # Since round 4 the mesh runs the SAME kernel enum the serial bench
    # ships: Pallas kernels compile and execute under shard_map on this
    # runtime (probed per round — benchmarks/probe_pallas_shardmap.py,
    # all four probes PASS in r4), so the fused channelizer and the
    # fused chain tail are invoked per-device around the two explicit
    # collective points (halo ppermute below, all_to_all reshard).
    ccfg = cfg.chain_cfg
    # time-major mesh form: fused channelizer emits [f_local, M], the
    # all_to_all resharding rides the LANE dim, and each device runs the
    # time-major passband + fused tail on its channel subset (the serial
    # fast profile's exact program, per shard). Per-shard viability is
    # static: the fused kernels must serve n_chan/d channels and the
    # local frame count.
    f_local = cfg.chunk_in // (d * cfg.n_chan)
    tmajor = (cfg.time_major and wb._tmajor_fused_ok(cfg)
              and chain_mod._pallas_tail_ok(ccfg, (cfg.n_chan // d,))
              and f_local % 8 == 0)
    # PLANAR mesh form (the serial zero-transpose coupling, per shard):
    # available when d divides the DIF n1 factor — then the all_to_all
    # rides the raw [n1, f_local, n2] buffer's k1-plane axis and each
    # device ends with planar-CONTIGUOUS channel planes. d ∤ n1 falls
    # back to the time-major 2-D form (one transpose to build the
    # resharding layout — ~3.5 ms at the bench shape). The mesh's state
    # is re-ordered planar at the jit boundary (tiny [n_chan] gathers)
    # so the public state contract stays bin-ordered.
    fac = channelizer._pick_factors(cfg.n_chan)
    planar = (tmajor and wb._planar_active(cfg)
              and fac is not None and fac[0] % d == 0
              and f_local % cfg.chan_tile_t == 0)
    order = wb.audio_channel_order(cfg)       # planar row -> bin

    def body(params: wb.WidebandParams, state: wb.WidebandState,
             iq: cx.CX):
        # ---- phase 1: time-sharded PFB with halo history
        iqc = cx.to_complex(iq)
        idx = jax.lax.axis_index(AXIS)
        halo = scans.left_context(iqc, plan.history, AXIS)
        head = jnp.where(idx == 0, cx.to_complex(state.pfb_carry), halo)
        pfb_carry = iqc[..., -plan.history:]

        if planar:
            from supersdr_tpu.ops.pallas import channelize_fused
            on_tpu = jax.default_backend() in ("tpu", "axon")
            ov = ccfg.n_taps - 1
            raw_dtype = (jnp.bfloat16
                         if (cfg.chan_precision == "default"
                             and cfg.passband_precision == "default")
                         else jnp.float32)
            _, (raw_r, raw_i) = channelize_fused.channelize_fused_c(
                plan, params.W_pfb, head, iqc,
                bf16_mxu=(cfg.chan_precision == "default"),
                tile_t=cfg.chan_tile_t, interpret=not on_tpu,
                out_layout="raw3", out_dtype=raw_dtype)
            # reshard over the k1-plane axis: [n1, f_local, n2] ->
            # [n1/d, f_local·d, n2] — per-device planar channel planes
            raw_r = jax.lax.all_to_all(raw_r, AXIS, split_axis=0,
                                       concat_axis=1, tiled=True)
            raw_i = jax.lax.all_to_all(raw_i, AXIS, split_axis=0,
                                       concat_axis=1, tiled=True)
            c_loc = raw_r.shape[0] * raw_r.shape[2]
            # local state is already planar-ordered (jit-boundary
            # permute below) — identity map per shard
            tr = jnp.transpose(raw_r[:, -ov:, :], (0, 2, 1)).reshape(
                c_loc, ov).astype(jnp.float32)
            ti = jnp.transpose(raw_i[:, -ov:, :], (0, 2, 1)).reshape(
                c_loc, ov).astype(jnp.float32)
            os_carry = cx.CX(tr, ti)
            cstate, audioT, rssi = chain_mod.process_tail_tmajor(
                ccfg, params.chain, state.chain, state.chain.phase,
                None, os_carry, audio_dtype=wb._audio_np_dtype(cfg),
                fir_x3=(raw_r, raw_i), chan_order=np.arange(c_loc))
            last = jax.lax.all_gather(pfb_carry, AXIS)[d - 1]
            return (wb.WidebandState(pfb_carry=cx.split(last),
                                     chain=cstate), audioT, rssi)

        if tmajor:
            from supersdr_tpu.ops import fir_matmul
            from supersdr_tpu.ops.pallas import channelize_fused
            on_tpu = jax.default_backend() in ("tpu", "axon")
            _, chansT = channelize_fused.channelize_fused_c(
                plan, params.W_pfb, head, iqc,
                bf16_mxu=(cfg.chan_precision == "default"),
                tile_t=cfg.chan_tile_t, interpret=not on_tpu,
                out_layout="time")
            # reshard: [f_local, n_chan] -> [f_local·d, n_chan/d]
            chansT = jax.lax.all_to_all(chansT, AXIS, split_axis=1,
                                        concat_axis=0, tiled=True)
            chansT_cx = cx.split(chansT)
            ov = ccfg.n_taps - 1
            os_carry = cx.CX(chansT_cx.re[-ov:].T, chansT_cx.im[-ov:].T)
            if params.chain.W_tailpass is not None:
                # passband fused into the tail kernel (serial fast path)
                cstate, audioT, rssi = chain_mod.process_tail_tmajor(
                    ccfg, params.chain, state.chain, state.chain.phase,
                    chansT_cx, os_carry,
                    audio_dtype=wb._audio_np_dtype(cfg),
                    fir_x=chansT_cx)
            else:
                carry_T = cx.CX(state.chain.os_carry.re.T,
                                state.chain.os_carry.im.T)
                _, yT = fir_matmul.fir_matmul_stream_tmajor_c(
                    ccfg.fir_plan, params.chain.W_pass, carry_T,
                    chansT_cx,
                    precision=cx.resolve_precision(
                        ccfg.passband_precision))
                cstate, audioT, rssi = chain_mod.process_tail_tmajor(
                    ccfg, params.chain, state.chain, state.chain.phase,
                    yT, os_carry, audio_dtype=wb._audio_np_dtype(cfg))
            last = jax.lax.all_gather(pfb_carry, AXIS)[d - 1]
            return (wb.WidebandState(pfb_carry=cx.split(last),
                                     chain=cstate), audioT, rssi)

        _, chans = wb.channelize_dispatch(cfg, params, head, iqc)
        # chans: [n_chan, frames_local]

        # ---- reshard: time-split -> channel-split (all_to_all over ICI)
        # [n_chan, f_local] -> [n_chan/d, f_local*d]
        chans = jax.lax.all_to_all(chans, AXIS, split_axis=0, concat_axis=1,
                                   tiled=True)

        # ---- phase 2: channel-parallel chains, full time on-device
        cstate, out = chain_mod.process_traced(ccfg, params.chain,
                                               state.chain, cx.split(chans))
        audio = out.audio
        if cfg.time_major:
            # keep the time-major output contract on the fallback tier
            audio = jnp.swapaxes(audio, -1, -2).astype(
                wb._audio_np_dtype(cfg))
        # pfb carry lives on the last time shard; broadcast it so the next
        # call's shard 0 check uses the right value
        last = jax.lax.all_gather(pfb_carry, AXIS)[d - 1]
        return (wb.WidebandState(pfb_carry=cx.split(last), chain=cstate),
                audio, out.rssi)

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
    audio_spec = P(None, AXIS) if cfg.time_major else P(AXIS, None)
    out_spec = (wb.WidebandState(pfb_carry=cxspec(), chain=chain_state_spec),
                audio_spec, P(AXIS, None))

    sharded = jax.shard_map(body, mesh=mesh,
                            in_specs=(params_spec, state_spec, cxspec(AXIS)),
                            out_specs=out_spec, check_vma=False)
    if planar:
        # the planar mesh keeps its per-channel stream state in PLANAR
        # order internally (so each device's state block aligns with
        # its k1-plane channels); the public state contract stays
        # bin-ordered via tiny [n_chan] boundary gathers inside jit
        perm = jnp.asarray(order)
        inv = jnp.asarray(np.argsort(order))

        def _permuted(params, state, iq):
            st = state._replace(
                chain=jax.tree.map(lambda v: v[perm], state.chain))
            st2, audio, rssi = sharded(params, st, iq)
            st2 = st2._replace(
                chain=jax.tree.map(lambda v: v[inv], st2.chain))
            return st2, audio, rssi

        jitted = jax.jit(_permuted)
    else:
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

    # audio/rssi row -> PFB bin map for THIS process fn: the planar
    # mesh matches the serial `wideband.audio_channel_order`; other
    # tiers emit bin order
    process.channel_order = (order if planar
                             else np.arange(cfg.n_chan))
    return process


def make_params(cfg: wb.WidebandConfig, **kw) -> wb.WidebandParams:
    return wb.make_params(cfg, **kw)


def init_state(cfg: wb.WidebandConfig) -> wb.WidebandState:
    return wb.init_state(cfg)
