"""Multi-chip correctness without a pod (SURVEY.md §4): the mesh-sharded
chain must equal the single-device chain sample-exactly on a virtual
8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from supersdr_tpu.parallel import mesh as mesh_mod
from supersdr_tpu.parallel import sharded_chain
from supersdr_tpu.runtime import chain

AGC_ON = dict(on=True, thresh_db=-80, decay_ms=1000)


def make_iq(n, n_chan=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 12000
    out = []
    for c in range(n_chan):
        tone = np.exp(2j * np.pi * (800 + 400 * c) * t)
        noise = 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
        out.append(tone + noise)
    return np.stack(out).astype(np.complex64)


@pytest.mark.parametrize("mode", ["USB", "AM", "NBFM", "CW"])
def test_time_sharded_equals_serial(mode):
    n_dev = 8
    local = 2048
    n = local * n_dev
    iq = make_iq(n, n_chan=1)

    # single-device reference
    cfg_ref = chain.ChainConfig(mode=mode, chunk=n, os_block=local)
    p_ref = chain.make_params(cfg_ref, freq_offset_hz=np.zeros(1),
                              agc_kwargs=AGC_ON)
    s_ref = chain.init_state(cfg_ref, (1,))
    _, out_ref = chain.process(cfg_ref, p_ref, s_ref, jnp.asarray(iq))

    # 8-way time-sharded
    m = mesh_mod.time_mesh()
    cfg_sh = chain.ChainConfig(mode=mode, chunk=local, os_block=local)
    proc = sharded_chain.build(cfg_sh, m)
    p_sh = sharded_chain.make_params(cfg_sh, n_chan=1, agc_kwargs=AGC_ON)
    s_sh = sharded_chain.init_state(cfg_sh, 1)
    _, out_sh = proc(p_sh, s_sh, jnp.asarray(iq))

    np.testing.assert_allclose(np.asarray(out_sh.audio),
                               np.asarray(out_ref.audio),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_sh.rssi),
                               np.asarray(out_ref.rssi), atol=0.01)


def test_chan_time_grid_sharded():
    n_dev_chan, n_dev_time = 2, 4
    local = 2048
    n = local * n_dev_time
    n_chan = 4
    iq = make_iq(n, n_chan=n_chan)
    offsets = np.array([0.0, 200.0, -150.0, 500.0])

    cfg_ref = chain.ChainConfig(mode="USB", chunk=n, os_block=local)
    p_ref = chain.make_params(cfg_ref, freq_offset_hz=offsets,
                              agc_kwargs=AGC_ON)
    s_ref = chain.init_state(cfg_ref, (n_chan,))
    _, out_ref = chain.process(cfg_ref, p_ref, s_ref, jnp.asarray(iq))

    m = mesh_mod.make_mesh(n_chan=n_dev_chan, n_time=n_dev_time)
    cfg_sh = chain.ChainConfig(mode="USB", chunk=local, os_block=local)
    proc = sharded_chain.build(cfg_sh, m)
    p_sh = sharded_chain.make_params(cfg_sh, n_chan=n_chan,
                                     freq_offsets_hz=offsets,
                                     agc_kwargs=AGC_ON)
    s_sh = sharded_chain.init_state(cfg_sh, n_chan)
    _, out_sh = proc(p_sh, s_sh, jnp.asarray(iq))

    np.testing.assert_allclose(np.asarray(out_sh.audio),
                               np.asarray(out_ref.audio),
                               rtol=2e-3, atol=2e-4)


def test_streaming_state_chains_across_calls():
    """Two consecutive sharded chunks == one long serial run."""
    n_dev = 8
    local = 1024
    n_chunk = local * n_dev
    iq = make_iq(2 * n_chunk, n_chan=1, seed=3)

    cfg_ref = chain.ChainConfig(mode="AM", chunk=2 * n_chunk, os_block=local)
    p_ref = chain.make_params(cfg_ref, freq_offset_hz=np.zeros(1),
                              agc_kwargs=AGC_ON)
    s_ref = chain.init_state(cfg_ref, (1,))
    _, out_ref = chain.process(cfg_ref, p_ref, s_ref, jnp.asarray(iq))

    m = mesh_mod.time_mesh()
    cfg_sh = chain.ChainConfig(mode="AM", chunk=local, os_block=local)
    proc = sharded_chain.build(cfg_sh, m)
    p_sh = sharded_chain.make_params(cfg_sh, n_chan=1, agc_kwargs=AGC_ON)
    state = sharded_chain.init_state(cfg_sh, 1)
    state, out1 = proc(p_sh, state, jnp.asarray(iq[:, :n_chunk]))
    state, out2 = proc(p_sh, state, jnp.asarray(iq[:, n_chunk:]))
    audio = np.concatenate([np.asarray(out1.audio), np.asarray(out2.audio)],
                           axis=-1)
    # scan re-association across chunk boundaries shifts float32 rounding
    np.testing.assert_allclose(audio, np.asarray(out_ref.audio),
                               rtol=2e-3, atol=1e-3)


def test_sharded_scan_primitives():
    """Direct check of the cross-shard scan machinery on an 8-device mesh."""
    from jax.sharding import PartitionSpec as P
    from supersdr_tpu.ops import scans

    devs = jax.devices()
    m = jax.sharding.Mesh(np.asarray(devs), ("t",))
    rng = np.random.default_rng(0)
    n = 8 * 64
    a = rng.uniform(0.8, 0.999, n).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)

    ref = scans.linear_scan(jnp.asarray(a), jnp.asarray(b), 0.5)

    def body(al, bl):
        return scans.linear_scan(al, bl, 0.5, axis_name="t")

    got = jax.jit(jax.shard_map(body, mesh=m, in_specs=(P("t"), P("t")),
                                out_specs=P("t"), check_vma=False))(
        jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    ref2 = scans.maxplus_scan(jnp.asarray(-np.abs(a)), jnp.asarray(b), -50.0)

    def body2(al, bl):
        return scans.maxplus_scan(al, bl, -50.0, axis_name="t")

    got2 = jax.jit(jax.shard_map(body2, mesh=m, in_specs=(P("t"), P("t")),
                                 out_specs=P("t"), check_vma=False))(
        jnp.asarray(-np.abs(a)), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-4)

    # sliding max across shard boundaries
    x = rng.normal(size=n).astype(np.float32)
    ref3 = scans.sliding_max(jnp.asarray(x), 48)

    def body3(xl):
        return scans.sliding_max(xl, 48, axis_name="t")

    got3 = jax.jit(jax.shard_map(body3, mesh=m, in_specs=P("t"),
                                 out_specs=P("t"), check_vma=False))(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3))


def test_time_sharded_rational_rate_equals_serial():
    """20250→48000 rational resampling under time sharding: the stuffed-
    domain halo reconstruction must match the serial carry exactly."""
    n_dev = 8
    local = 2025  # multiple of M=27
    n = local * n_dev
    rng = np.random.default_rng(5)
    t = np.arange(n) / 20250
    iq = (np.exp(2j * np.pi * 900 * t)
          + 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
          )[None].astype(np.complex64)

    cfg_ref = chain.ChainConfig(mode="USB", iq_rate=20250, audio_rate=48000,
                                chunk=n, os_block=local)
    p_ref = chain.make_params(cfg_ref, freq_offset_hz=np.zeros(1),
                              agc_kwargs=AGC_ON)
    s_ref = chain.init_state(cfg_ref, (1,))
    _, out_ref = chain.process(cfg_ref, p_ref, s_ref, jnp.asarray(iq))

    m = mesh_mod.time_mesh()
    cfg_sh = chain.ChainConfig(mode="USB", iq_rate=20250, audio_rate=48000,
                               chunk=local, os_block=local)
    proc = sharded_chain.build(cfg_sh, m)
    p_sh = sharded_chain.make_params(cfg_sh, n_chan=1, agc_kwargs=AGC_ON)
    s_sh = sharded_chain.init_state(cfg_sh, 1)
    _, out_sh = proc(p_sh, s_sh, jnp.asarray(iq))

    np.testing.assert_allclose(np.asarray(out_sh.audio),
                               np.asarray(out_ref.audio),
                               rtol=2e-3, atol=2e-4)


def test_sharded_wideband_fast_profile_matches_serial():
    """The mesh honors the shipped fast-profile channelizer tuning
    (mxu2 DIF + f16 fold + matmul passband/resampler): the 8-device
    sharded wideband equals the serial pipeline on the same config."""
    import numpy as np
    from supersdr_tpu.parallel import sharded_wideband
    from supersdr_tpu.runtime import wideband

    cfg = wideband.WidebandConfig(fs_in=96_000, n_chan=8,
                                  chunk_in=8 * 8 * 512, mode="AM",
                                  taps_per=8, n_taps=129,
                                  **wideband.PROFILES["fast"])
    m = sharded_wideband.make_mesh()
    proc = sharded_wideband.build(cfg, m)
    p = wideband.make_params(cfg)
    rng = np.random.default_rng(0)
    iq = ((rng.normal(size=cfg.chunk_in)
           + 1j * rng.normal(size=cfg.chunk_in)) * 0.05
          ).astype(np.complex64)
    _, audio, _ = proc(p, wideband.init_state(cfg), iq)
    _, out = wideband.process(cfg, p, wideband.init_state(cfg), iq)
    got = np.asarray(audio)
    want = np.asarray(out.audio)
    assert np.abs(got - want).max() < 1e-4 * np.abs(want).max()


def test_sharded_wideband_runs_pallas_kernels_on_mesh():
    """Round-4: the mesh runs the SAME kernel enum the bench ships —
    fused Pallas channelizer (n_chan=512 has the (2,256) factor tree)
    and the fused Pallas chain tail (256 channels per shard on a
    2-device mesh). Interpret-mode on CPU; the identical call graph
    compiles to real Mosaic kernels on a TPU mesh
    (benchmarks/probe_pallas_shardmap.py)."""
    import numpy as np
    from supersdr_tpu.parallel import sharded_wideband
    from supersdr_tpu.runtime import chain as chain_mod
    from supersdr_tpu.runtime import wideband

    cfg = wideband.WidebandConfig(fs_in=512 * 12_000, n_chan=512,
                                  chunk_in=2 * 512 * 128, mode="AM",
                                  taps_per=4, n_taps=129,
                                  **wideband.PROFILES["fast"])
    # preconditions for the Pallas paths (if these drift the test is
    # silently weaker — assert them)
    from supersdr_tpu.ops import channelizer as chz
    fac = chz._pick_factors(cfg.n_chan)
    assert fac is not None and fac[1] % 128 == 0
    assert chain_mod._pallas_tail_ok(cfg.chain_cfg, (512 // 2,))
    m = sharded_wideband.make_mesh(jax.devices()[:2])
    proc = sharded_wideband.build(cfg, m)
    p = wideband.make_params(cfg)
    rng = np.random.default_rng(3)
    iq = ((rng.normal(size=(2, cfg.chunk_in))
           + 1j * rng.normal(size=(2, cfg.chunk_in))) * 0.05
          ).astype(np.complex64)
    sstate = wideband.init_state(cfg)
    state = wideband.init_state(cfg)
    # row -> bin maps: proc.channel_order for the mesh (planar when
    # d | n1, bin otherwise), audio_channel_order for the serial path
    mo = proc.channel_order
    so = wideband.audio_channel_order(cfg)
    # this config is planar on both sides (d=2 divides n1)
    assert np.array_equal(mo, so)
    minv = np.argsort(mo)
    sinv = np.argsort(so)
    for k in range(2):     # two chunks: carried state must thread right
        sstate, audio, rssi = proc(p, sstate, iq[k])
        state, out = wideband.process(cfg, p, state, iq[k])
        got = np.asarray(audio)[:, minv]        # -> bin order
        want = np.asarray(out.audio)[:, sinv]   # -> bin order
        assert np.abs(got - want).max() < 1e-4 * max(np.abs(want).max(),
                                                     1e-9)
        np.testing.assert_allclose(np.asarray(rssi)[minv][:, 0],
                                   np.asarray(out.rssi)[:, 0][sinv],
                                   atol=0.01)


def test_pallas_tail_pads_non_lane_batches():
    """A 320-channel batch (2560/8 mesh shard) runs the Pallas tail with
    the channel axis zero-padded to 384 and matches the XLA tail."""
    import dataclasses
    from supersdr_tpu.ops import cx

    cfg = chain.ChainConfig(mode="AM", iq_rate=12000, audio_rate=48000,
                            chunk=1024, os_block=1024, n_taps=129,
                            nco_enabled=False, tail_impl="pallas")
    assert chain._pallas_tail_ok(cfg, (320,))
    cfg_x = dataclasses.replace(cfg, tail_impl="xla")
    p = chain.make_params(cfg)
    rng = np.random.default_rng(7)
    iq = ((rng.normal(size=(320, cfg.chunk))
           + 1j * rng.normal(size=(320, cfg.chunk))) * 0.1
          ).astype(np.complex64)
    st_p = chain.init_state(cfg, (320,))
    st_x = chain.init_state(cfg_x, (320,))
    for _ in range(2):
        st_p, out_p = chain.process(cfg, p, st_p, iq)
        st_x, out_x = chain.process(cfg_x, p, st_x, iq)
        np.testing.assert_allclose(np.asarray(out_p.audio),
                                   np.asarray(out_x.audio),
                                   rtol=2e-4, atol=1e-5)


def test_sharded_wideband_planar_d4_exact_factoring():
    """Round-5 VERDICT #1: a 4-device mesh rides the PLANAR
    zero-transpose form via the per-device-count factoring choice —
    512 = 4·128 admits d=4 exactly where the serial (2, 256) tree does
    not. Sample-level agreement with the serial pipeline (different
    factor tree → f32 summation-order noise only)."""
    import numpy as np
    from supersdr_tpu.parallel import sharded_wideband
    from supersdr_tpu.runtime import wideband

    prof = dict(wideband.PROFILES["fast"])
    prof.update(passband_precision="high", chan_precision="high",
                chan_tile_t=64)
    cfg = wideband.WidebandConfig(fs_in=512 * 12_000, n_chan=512,
                                  chunk_in=512 * 256, mode="AM",
                                  taps_per=4, n_taps=129, **prof)
    m = sharded_wideband.make_mesh(jax.devices()[:4])
    proc = sharded_wideband.build(cfg, m)
    assert proc.planar and proc.planar_factors == (4, 128, 4)
    p = wideband.make_params(cfg)
    rng = np.random.default_rng(5)
    iq = ((rng.normal(size=(2, cfg.chunk_in))
           + 1j * rng.normal(size=(2, cfg.chunk_in))) * 0.05
          ).astype(np.complex64)
    mstate, sstate = wideband.init_state(cfg), wideband.init_state(cfg)
    minv = np.argsort(proc.channel_order)
    sinv = np.argsort(wideband.audio_channel_order(cfg))
    for k in range(2):
        mstate, audio, rssi = proc(p, mstate, iq[k])
        sstate, out = wideband.process(cfg, p, sstate, iq[k])
        got = np.asarray(audio)[:, minv]
        want = np.asarray(out.audio)[:, sinv]
        err = np.abs(got - want).max()
        assert err < 2e-4 * np.abs(want).max(), (k, err)
        np.testing.assert_allclose(np.asarray(rssi)[minv][:, 0],
                                   np.asarray(out.rssi)[sinv][:, 0],
                                   atol=0.02)


def test_sharded_wideband_planar_d8_padded_planes():
    """d=8 on 2560 channels: no lane-multiple factoring divides by 8
    (20 lane blocks, 2^2·5), so the kernel emits 4 zero planes
    (n1 20 → 24, 20 % padded work) and the all_to_all splits the padded
    plane axis — the planar program survives power-of-two pod slices
    (VERDICT r4 #1). State/audio stay bin-ordered at the jit boundary."""
    import numpy as np
    from supersdr_tpu.parallel import sharded_wideband
    from supersdr_tpu.runtime import wideband

    prof = dict(wideband.PROFILES["fast"])
    prof.update(passband_precision="high", chan_precision="high",
                chan_tile_t=64)
    cfg = wideband.WidebandConfig(fs_in=2560 * 12_000, n_chan=2560,
                                  chunk_in=2560 * 128, mode="AM",
                                  taps_per=4, n_taps=65, **prof)
    m = sharded_wideband.make_mesh(jax.devices()[:8])
    proc = sharded_wideband.build(cfg, m)
    assert proc.planar and proc.planar_factors == (20, 128, 24)
    p = wideband.make_params(cfg)
    rng = np.random.default_rng(6)
    iq = ((rng.normal(size=(2, cfg.chunk_in))
           + 1j * rng.normal(size=(2, cfg.chunk_in))) * 0.05
          ).astype(np.complex64)
    mstate, sstate = wideband.init_state(cfg), wideband.init_state(cfg)
    minv = np.argsort(proc.channel_order)
    sinv = np.argsort(wideband.audio_channel_order(cfg))
    for k in range(2):
        mstate, audio, rssi = proc(p, mstate, iq[k])
        sstate, out = wideband.process(cfg, p, sstate, iq[k])
        got = np.asarray(audio)[:, minv]
        want = np.asarray(out.audio)[:, sinv]
        err = np.abs(got - want).max()
        assert err < 2e-4 * np.abs(want).max(), (k, err)


def test_sharded_wideband_i16_ingest_matches_dequantized():
    """Mesh i16 ingest (VERDICT r4 #2): int16 IQ pairs stream into the
    per-shard channelizer kernels and match the dequantized-f32 mesh
    run bit-compatibly."""
    import numpy as np
    from supersdr_tpu.parallel import sharded_wideband
    from supersdr_tpu.runtime import wideband

    cfg = wideband.WidebandConfig(fs_in=512 * 12_000, n_chan=512,
                                  chunk_in=512 * 256, mode="AM",
                                  taps_per=4, n_taps=129,
                                  **wideband.PROFILES["fast"])
    m = sharded_wideband.make_mesh(jax.devices()[:4])
    proc = sharded_wideband.build(cfg, m)
    assert proc.planar
    p = wideband.make_params(cfg)
    rng = np.random.default_rng(7)
    re16 = (rng.normal(size=cfg.chunk_in) * 0.05 * 32768).astype(np.int16)
    im16 = (rng.normal(size=cfg.chunk_in) * 0.05 * 32768).astype(np.int16)
    from supersdr_tpu.ops import cx
    deq = cx.CX(jnp.asarray(re16, jnp.float32) / 32768.0,
                jnp.asarray(im16, jnp.float32) / 32768.0)
    _, a16, r16 = proc(p, wideband.init_state(cfg), (re16, im16))
    _, af, rf = proc(p, wideband.init_state(cfg), deq)
    num = np.linalg.norm(np.asarray(af, np.float32))
    den = np.linalg.norm(np.asarray(a16, np.float32)
                         - np.asarray(af, np.float32))
    snr = 20 * np.log10(max(num, 1e-30) / max(den, 1e-30))
    assert snr > 80.0, snr


def test_sharded_wideband_process_n_matches_serial_calls():
    """Mesh N-chunk dispatch (VERDICT r4 #2): one mesh program running
    two consecutive chunks equals two chained single-chunk mesh calls
    exactly (tuple outputs, threaded state), including a mixed
    CX + i16 chunk sequence."""
    import numpy as np
    from supersdr_tpu.parallel import sharded_wideband
    from supersdr_tpu.runtime import wideband

    cfg = wideband.WidebandConfig(fs_in=512 * 12_000, n_chan=512,
                                  chunk_in=512 * 256, mode="AM",
                                  taps_per=4, n_taps=129,
                                  **wideband.PROFILES["fast"])
    m = sharded_wideband.make_mesh(jax.devices()[:4])
    proc = sharded_wideband.build(cfg, m)
    p = wideband.make_params(cfg)
    rng = np.random.default_rng(8)
    iq = ((rng.normal(size=(2, cfg.chunk_in))
           + 1j * rng.normal(size=(2, cfg.chunk_in))) * 0.05
          ).astype(np.complex64)
    st = wideband.init_state(cfg)
    st_n, audios, rssi_n = proc.process_n(p, st, (iq[0], iq[1]))
    st_1 = wideband.init_state(cfg)
    st_1, a0, _ = proc(p, st_1, iq[0])
    st_1, a1, rssi_1 = proc(p, st_1, iq[1])
    np.testing.assert_array_equal(np.asarray(audios[0]), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(audios[1]), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(rssi_n), np.asarray(rssi_1))
    # mixed kinds: i16 first chunk, CX second — one program, no error
    re16 = (np.asarray(iq[0].real) * 32768).astype(np.int16)
    im16 = (np.asarray(iq[0].imag) * 32768).astype(np.int16)
    _, audios2, _ = proc.process_n(p, wideband.init_state(cfg),
                                   ((re16, im16), iq[1]))
    assert np.isfinite(np.asarray(audios2[0], np.float32)).all()


def test_sharded_wideband_fused_controls_on_mesh():
    """The r5 fused controls survive the mesh: NBFM, squelch and AGC
    hang run on the planar sharded tiers and match the serial fused
    pipeline sample-for-sample (same kernels per shard)."""
    import numpy as np
    from supersdr_tpu.parallel import sharded_wideband
    from supersdr_tpu.runtime import wideband

    rng = np.random.default_rng(12)
    base = dict(fs_in=512 * 12_000, n_chan=512, chunk_in=512 * 256,
                taps_per=4, n_taps=129)
    iq = ((rng.normal(size=base["chunk_in"])
           + 1j * rng.normal(size=base["chunk_in"])) * 0.05
          ).astype(np.complex64)
    for extra in (dict(mode="NBFM"),
                  dict(mode="AM", squelch_enabled=True),
                  dict(mode="AM", hang_enabled=True, hang_ms=40.0)):
        cfg = wideband.WidebandConfig(**base, **extra,
                                      **wideband.PROFILES["fast"])
        m = sharded_wideband.make_mesh(jax.devices()[:2])
        proc = sharded_wideband.build(cfg, m)
        assert proc.planar, extra
        p = wideband.make_params(cfg)
        _, audio, _ = proc(p, wideband.init_state(cfg), iq)
        _, out = wideband.process(cfg, p, wideband.init_state(cfg), iq)
        got = np.asarray(audio, np.float32)
        want = np.asarray(out.audio, np.float32)
        minv = np.argsort(proc.channel_order)
        sinv = np.argsort(wideband.audio_channel_order(cfg))
        err = np.abs(got[:, minv] - want[:, sinv]).max()
        assert err < 1e-4 * max(np.abs(want).max(), 1e-9), (extra, err)


def test_sharded_wideband_waste_override_enables_padded_planar():
    """`build(..., planar_waste_max=...)` lets a pod opt into a
    heavily-padded planar form (e.g. d=16 on 2560 channels) — here
    d=8 on 640 channels (60 % padding, above the default cutoff) runs
    planar and still matches serial."""
    import numpy as np
    from supersdr_tpu.parallel import sharded_wideband
    from supersdr_tpu.runtime import wideband

    prof = dict(wideband.PROFILES["fast"])
    prof.update(passband_precision="high", chan_precision="high",
                chan_tile_t=64)
    cfg = wideband.WidebandConfig(fs_in=640 * 12_000, n_chan=640,
                                  chunk_in=640 * 128, mode="AM",
                                  taps_per=4, n_taps=65, **prof)
    m = sharded_wideband.make_mesh(jax.devices()[:8])
    assert not sharded_wideband.build(cfg, m).planar   # default cutoff
    proc = sharded_wideband.build(cfg, m, planar_waste_max=1.0)
    assert proc.planar and proc.planar_factors == (5, 128, 8)
    p = wideband.make_params(cfg)
    rng = np.random.default_rng(13)
    iq = ((rng.normal(size=cfg.chunk_in)
           + 1j * rng.normal(size=cfg.chunk_in)) * 0.05
          ).astype(np.complex64)
    _, audio, _ = proc(p, wideband.init_state(cfg), iq)
    _, out = wideband.process(cfg, p, wideband.init_state(cfg), iq)
    got = np.asarray(audio)[:, np.argsort(proc.channel_order)]
    want = np.asarray(out.audio)[
        :, np.argsort(wideband.audio_channel_order(cfg))]
    assert np.abs(got - want).max() < 2e-4 * np.abs(want).max()


def test_sharded_wideband_planar_split2_bit_identical_serial():
    """The radix-2 stage-B split (r5) on the mesh: d=2 keeps the serial
    (2, 256) factoring, both sides run split2, and the planar mesh
    program stays BIT-identical to serial through the split's
    column-order map (state chained across 2 chunks)."""
    import numpy as np
    from supersdr_tpu.parallel import sharded_wideband
    from supersdr_tpu.runtime import wideband

    prof = dict(wideband.PROFILES["fast"])
    cfg = wideband.WidebandConfig(fs_in=512 * 12_000, n_chan=512,
                                  chunk_in=512 * 256, mode="AM",
                                  taps_per=4, n_taps=129,
                                  chan_split2="on", **prof)
    m = sharded_wideband.make_mesh(jax.devices()[:2])
    proc = sharded_wideband.build(cfg, m)
    assert proc.planar and proc.planar_factors == (2, 256, 2)
    assert not np.array_equal(proc.channel_order, np.arange(512))
    p = wideband.make_params(cfg)
    rng = np.random.default_rng(23)
    iq = ((rng.normal(size=(2, cfg.chunk_in))
           + 1j * rng.normal(size=(2, cfg.chunk_in))) * 0.05
          ).astype(np.complex64)
    mstate, sstate = wideband.init_state(cfg), wideband.init_state(cfg)
    minv = np.argsort(proc.channel_order)
    sinv = np.argsort(wideband.audio_channel_order(cfg))
    for k in range(2):
        mstate, audio, rssi = proc(p, mstate, iq[k])
        sstate, out = wideband.process(cfg, p, sstate, iq[k])
        got = np.asarray(audio)[:, minv]
        want = np.asarray(out.audio)[:, sinv]
        assert np.array_equal(got, want), k
