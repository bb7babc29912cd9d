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

PLANAR mesh form (round 4, generalized round 5): the fused channelizer's
raw [n1, f_local, n2] k1-plane buffer is resharded directly over its
plane axis, so each device ends with planar-contiguous channel planes
feeding the FIR-fused tail's window DMAs — zero transpose passes, the
serial fast profile's exact kernel program per shard. Round 5 removes
the power-of-two-device gap (VERDICT r4 #1): the DIF factoring is
chosen PER DEVICE COUNT from all lane-multiple factorings (e.g. 2560 =
20·128 admits d=4 exactly where the serial (10, 256) tree does not),
and when no factoring is exact the kernel emits zero-padded planes
(n1 → ceil(n1/d)·d) so the all_to_all's split axis divides — d=8 on
2560 channels costs 2 phantom planes (20 % padded work), bounded by
`PLANAR_WASTE_MAX` below which the padded planar form still beats the
transposed fallback's extra layout pass.

Round 5 also brings the mesh to serial feature parity (VERDICT r4 #2):
int16 IQ ingest (the KiwiSDR wire format, reference kiwi/client.py:
443-454) streams straight into the channelizer kernel's window DMAs
per shard, and `process_n` runs N consecutive chunks in ONE mesh
program with tuple outputs (the serial runtime/wideband.process_n
dispatch-amortization win).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supersdr_tpu.ops import channelizer, cx, scans
from supersdr_tpu.runtime import chain as chain_mod
from supersdr_tpu.runtime import wideband as wb

AXIS = "dev"

# Padded-planar cutoff: phantom-plane fraction above which the padded
# planar form likely loses to the time-major fallback (the fallback's
# transpose costs ~3.5 ms/d at the bench shape vs waste·tail_time for
# padding; at 20 % — d=8 on 2560 chans — padding wins, at 60 % — d=16
# — it is a wash and the fallback is simpler). See docs/PERFORMANCE.md.
PLANAR_WASTE_MAX = 0.34

I16_SCALE = 1.0 / 32768.0


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def _planar_factors_for(n_chan: int, d: int, n2_pref: int = 256
                        ) -> tuple[int, int, int] | None:
    """(n1, n2, n1_pad) for a d-device planar mesh: among all DIF
    factorings with lane-multiple n2 (n1 ≥ 2), minimize the padded
    waste n1_pad·n2 − n_chan (n1_pad = ceil(n1/d)·d), tie-breaking
    toward `n2_pref` — 256 for the bf16 tier (the serial fast tree),
    512 for split-active dot3 configs (the serial (5, 512) tree, so a
    1-device mesh stays bit-identical to serial). None if no
    factoring exists."""
    cands = []
    hi = min(512, n_chan)
    for n2 in range(128, hi + 1, 128):
        if n_chan % n2 == 0 and 2 <= n_chan // n2 <= cx.MAX_DIRECT:
            n1 = n_chan // n2
            n1_pad = -(-n1 // d) * d
            cands.append((n1_pad * n2 - n_chan, abs(n2 - n2_pref), -n2,
                          n1, n2, n1_pad))
    if not cands:
        return None
    cands.sort()
    _, _, _, n1, n2, n1_pad = cands[0]
    return n1, n2, n1_pad


def _mesh_tile(f_local: int, cfg: wb.WidebandConfig) -> int:
    """Frame tile for the fused channelizer on a mesh shard: the
    largest multiple-of-8 divisor of the LOCAL frame count, capped at
    the config tile (and at 112 for the dot3 quality tiers — Mosaic's
    dot3 compile cliff starts at 128)."""
    cap = cfg.chan_tile_t
    if cfg.chan_precision != "default":
        cap = min(cap, 112)
    best = 0
    for t in range(8, cap + 1, 8):
        if f_local % t == 0:
            best = t
    return best


def _planar_order(n_chan: int, n1: int, n2: int,
                  split_levels: int = 0) -> np.ndarray:
    """order[c] = PFB bin of planar row c (c = k1·n2 + col → bin
    m = k2(col)·n1 + k1), for the REAL rows only. k2 = col except
    under the stage-B split (channelizer.stageb_col_to_k2)."""
    colmap = channelizer.stageb_col_to_k2(n2, split_levels)
    c = np.arange(n_chan)
    return colmap[c % n2] * n1 + c // n2


def build(cfg: wb.WidebandConfig, mesh: Mesh,
          planar_waste_max: float | None = None):
    """Compile the sharded wideband pipeline.

    Constraints: n_devices divides n_chan and chunk_in; the per-device
    input slice must be a multiple of n_chan.
    `planar_waste_max` overrides `PLANAR_WASTE_MAX` — e.g. a d=16 pod
    on 2560 channels can OPT INTO the 60 %-padded planar form (and
    A/B it against the default transposed fallback on real hardware;
    this environment has one chip, so the cutoff is a model estimate).
    Returns process(params, state, iq[chunk_in]) -> (state, audio, rssi)
    with audio [n_chan, chunk_per_chan·L] channel-sharded (time-major
    configs: [chunk_per_chan·L, n_chan], rows per process.channel_order).
    `process.process_n(params, state, iqs)` is the N-chunk tuple-output variant
    (serial `wideband.process_n` semantics); both accept CX, complex
    numpy, or (re_i16, im_i16) int16 pairs per chunk.
    """
    d = mesh.devices.size
    if cfg.n_chan % d or cfg.chunk_in % (d * cfg.n_chan):
        raise ValueError("n_devices must divide n_chan and chunk_in/n_chan")
    waste_max = (PLANAR_WASTE_MAX if planar_waste_max is None
                 else planar_waste_max)
    plan = wb.pfb_plan(cfg)
    # Since round 4 the mesh runs the SAME kernel enum the serial bench
    # ships: Pallas kernels compile and execute under shard_map on this
    # runtime (probed per round — benchmarks/probe_pallas_shardmap.py),
    # so the fused channelizer and the fused chain tail are invoked
    # per-device around the two explicit collective points (halo
    # ppermute below, all_to_all reshard).
    ccfg = cfg.chain_cfg
    f_local = cfg.chunk_in // (d * cfg.n_chan)
    tile = _mesh_tile(f_local, cfg)
    n2_pref = (512 if (cfg.chan_precision != "default"
                       and cfg.chan_split2 != "off") else 256)
    pf = _planar_factors_for(cfg.n_chan, d, n2_pref)
    planar = False
    n1 = n2 = n1_pad = c_loc = 0
    if pf is not None:
        n1, n2, n1_pad = pf
        c_loc = (n1_pad // d) * n2
        waste = (n1_pad * n2 - cfg.n_chan) / cfg.n_chan
        planar = (cfg.time_major and wb._tmajor_fused_ok(cfg)
                  and chain_mod._pallas_tail_ok(ccfg, (c_loc,))
                  and c_loc % 128 == 0
                  and tile >= 8 and f_local % 8 == 0
                  and waste <= waste_max)
    tmajor = (cfg.time_major and wb._tmajor_fused_ok(cfg)
              and chain_mod._pallas_tail_ok(ccfg, (cfg.n_chan // d,))
              and f_local % 8 == 0)
    C_pad = n1_pad * n2 if planar else cfg.n_chan
    split_levels = wb._split_levels_for(cfg, n2) if planar else 0
    order = (_planar_order(cfg.n_chan, n1, n2, split_levels) if planar
             else np.arange(cfg.n_chan))

    def dequant(v16):
        return v16.astype(jnp.float32) * I16_SCALE

    def bcast_last(v: cx.CX) -> cx.CX:
        """Broadcast the LAST shard's PFB tail to every device via a
        binomial ppermute tree (log₂ d rounds; ppermute forbids fan-out
        pairs) instead of an all_gather — received bytes stay
        O(history) per device instead of O(d·history), killing the d²
        term the α-β table surfaced (r5)."""
        if d == 1:
            return v
        idx = jax.lax.axis_index(AXIS)
        rp = (d - 1) - idx          # relabeled rank: source is rp == 0

        def one(x):
            cur = x
            step = 1
            while step < d:
                perm = [(d - 1 - sp, d - 1 - (sp + step))
                        for sp in range(step) if sp + step < d]
                recv = jax.lax.ppermute(cur, AXIS, perm=perm)
                cur = jnp.where((rp >= step) & (rp < 2 * step), recv, cur)
                step *= 2
            return cur

        return cx.CX(one(v.re), one(v.im))

    def halo_head(state, re_like, im_like):
        """History head for this shard's channelizer: multi-hop halo
        from the left (f32 CX either way — i16 halos dequantize; the
        head is history-sized, a tiny buffer), shard 0 takes the
        carried stream state."""
        idx = jax.lax.axis_index(AXIS)
        halo_r = scans.left_context(re_like, plan.history, AXIS)
        halo_i = scans.left_context(im_like, plan.history, AXIS)
        if halo_r.dtype == jnp.int16:
            halo_r, halo_i = dequant(halo_r), dequant(halo_i)
        head_r = jnp.where(idx == 0, state.pfb_carry.re, halo_r)
        head_i = jnp.where(idx == 0, state.pfb_carry.im, halo_i)
        return cx.CX(head_r, head_i)

    def step(params: wb.WidebandParams, state: wb.WidebandState, iq):
        """One chunk on the mesh (traced, per-shard view)."""
        i16 = isinstance(iq, tuple) and not isinstance(iq, cx.CX)
        if i16:
            re_in, im_in = iq
        else:
            re_in, im_in = iq.re, iq.im
        head = halo_head(state, re_in, im_in)
        tail_r = re_in[..., -plan.history:]
        tail_i = im_in[..., -plan.history:]
        if i16:
            tail_r, tail_i = dequant(tail_r), dequant(tail_i)
        pfb_tail = cx.CX(tail_r, tail_i)

        if planar:
            from supersdr_tpu.ops.pallas import channelize_fused
            on_tpu = jax.default_backend() in ("tpu", "axon")
            ov = ccfg.n_taps - 1
            raw_dtype = (jnp.bfloat16
                         if (cfg.chan_precision == "default"
                             and cfg.passband_precision == "default")
                         else jnp.float32)
            x_in = iq if i16 else cx.CX(re_in, im_in)
            _, (raw_r, raw_i) = channelize_fused.channelize_fused_c(
                plan, params.W_pfb, head, x_in,
                bf16_mxu=(cfg.chan_precision == "default"),
                tile_t=tile, interpret=not on_tpu,
                out_layout="raw3", out_dtype=raw_dtype,
                factors=(n1, n2), split_levels=split_levels,
                n1_pad=(n1_pad if n1_pad != n1 else None))
            # reshard over the k1-plane axis: [n1_pad, f_local, n2] ->
            # [n1_pad/d, f_local·d, n2] — per-device planar channel
            # planes (phantom planes carry zeros)
            raw_r = jax.lax.all_to_all(raw_r, AXIS, split_axis=0,
                                       concat_axis=1, tiled=True)
            raw_i = jax.lax.all_to_all(raw_i, AXIS, split_axis=0,
                                       concat_axis=1, tiled=True)
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
            last = bcast_last(pfb_tail)
            return (wb.WidebandState(pfb_carry=last, chain=cstate),
                    audioT, rssi)

        # non-planar tiers: dequantize i16 up front (local slice)
        iqc = (jax.lax.complex(dequant(re_in), dequant(im_in)) if i16
               else jax.lax.complex(re_in, im_in))

        if tmajor:
            from supersdr_tpu.ops import fir_matmul
            from supersdr_tpu.ops.pallas import channelize_fused
            on_tpu = jax.default_backend() in ("tpu", "axon")
            _, chansT = channelize_fused.channelize_fused_c(
                plan, params.W_pfb, head, iqc,
                bf16_mxu=(cfg.chan_precision == "default"),
                tile_t=tile, interpret=not on_tpu,
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
            last = bcast_last(pfb_tail)
            return (wb.WidebandState(pfb_carry=last, chain=cstate),
                    audioT, rssi)

        _, chans = wb.channelize_dispatch(cfg, params,
                                          cx.to_complex(head), iqc)
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
        last = bcast_last(pfb_tail)
        return (wb.WidebandState(pfb_carry=last, chain=cstate),
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
    state_shardings = jax.tree.map(lambda p: NamedSharding(mesh, p),
                                   state_spec,
                                   is_leaf=lambda x: isinstance(x, P))

    perm = jnp.asarray(order)
    inv = jnp.asarray(np.argsort(order))
    pad_rows = C_pad - cfg.n_chan

    def _pad0(v):
        if not pad_rows:
            return v
        return jnp.concatenate(
            [v, jnp.zeros((pad_rows,) + v.shape[1:], v.dtype)], axis=0)

    _jitted = {}       # (kinds, n_chunks) -> jitted mesh program

    def _iq_spec(kind):
        return ((P(AXIS), P(AXIS)) if kind == "i16" else cxspec(AXIS))

    def _get(kinds):
        key = kinds
        if key in _jitted:
            return _jitted[key]
        n = len(kinds)

        def body(params, state, iqs):
            outs = []
            st = state
            rssi = None
            for iq in iqs:
                st, audio, rssi = step(params, st, iq)
                outs.append(audio)
            return st, tuple(outs), rssi

        in_specs = (params_spec, state_spec,
                    tuple(_iq_spec(k) for k in kinds))
        out_specs = (state_spec, tuple(audio_spec for _ in range(n)),
                     P(AXIS, None))
        sharded = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                out_specs=out_specs, check_vma=False)
        if planar:
            # the planar mesh keeps its per-channel stream state in
            # (padded) PLANAR order internally — each device's state
            # block aligns with its k1-plane channels, phantom planes
            # carry zero state — while the public contract stays
            # bin-ordered via tiny [n_chan] boundary permutes/slices
            # inside jit
            def _permuted(params, state, iqs):
                st = state._replace(
                    chain=jax.tree.map(lambda v: _pad0(v[perm]),
                                       state.chain))
                st2, audios, rssi = sharded(params, st, iqs)
                st2 = st2._replace(
                    chain=jax.tree.map(lambda v: v[:cfg.n_chan][inv],
                                       st2.chain))
                audios = tuple(a[:, :cfg.n_chan] for a in audios)
                return st2, audios, rssi[:cfg.n_chan]

            fn = jax.jit(_permuted)
        else:
            fn = jax.jit(sharded)
        _jitted[key] = fn
        return fn

    def _coerce(iq):
        if wb._is_i16_pair(iq):
            return ("i16", (jnp.asarray(iq[0], jnp.int16),
                            jnp.asarray(iq[1], jnp.int16)))
        return ("cx", cx.as_cx(iq))

    def process_n(params, state, iqs):
        """N consecutive chunks in ONE mesh program, TUPLE audio outputs
        (serial wideband.process_n semantics); each chunk a CX /
        complex numpy / (re_i16, im_i16) pair. Returns
        (state, audios_tuple, rssi_of_last_chunk)."""
        pairs = [_coerce(q) for q in iqs]
        kinds = tuple(k for k, _ in pairs)
        state = jax.device_put(state, state_shardings)
        return _get(kinds)(params, state, tuple(v for _, v in pairs))

    def process(params, state, iq):
        """iq: [chunk_in] — CX / complex numpy / (re_i16, im_i16)."""
        st, audios, rssi = process_n(params, state, (iq,))
        return st, audios[0], rssi

    process.process_n = process_n
    # the jitted mesh program for HLO inspection (tests/comm model):
    # kinds = per-chunk input kind tuple, e.g. ("cx",) or ("i16", "cx")
    process.get_jitted = _get
    # audio/rssi row -> PFB bin map for THIS process fn: planar order
    # of the MESH's factoring on the planar tier, bin order otherwise
    process.channel_order = order
    process.planar = planar
    process.planar_factors = (n1, n2, n1_pad) if planar else None
    return process


def make_params(cfg: wb.WidebandConfig, **kw) -> wb.WidebandParams:
    return wb.make_params(cfg, **kw)


def init_state(cfg: wb.WidebandConfig) -> wb.WidebandState:
    return wb.init_state(cfg)
