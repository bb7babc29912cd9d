"""Scaling-efficiency evidence (BASELINE.md ≥80 % north star): the
collective volume of the sharded programs, measured from their compiled
HLO, must be tiny and independent of the local chunk length — the
structural property that bounds scaling loss."""

import numpy as np
import pytest

from supersdr_tpu.ops import cx
from supersdr_tpu.parallel import comm_model, mesh as mesh_mod
from supersdr_tpu.parallel import sharded_chain, sharded_wideband
from supersdr_tpu.runtime import chain, wideband


def _inner_jit(proc):
    if hasattr(proc, "get_jitted"):      # sharded_wideband (lazy jits)
        return proc.get_jitted(("cx",))
    return next(c.cell_contents for c in proc.__closure__
                if hasattr(c.cell_contents, "lower"))


def _chain_hlo(chunk: int):
    m = mesh_mod.time_mesh()
    cfg = chain.ChainConfig(mode="AM", chunk=chunk, os_block=chunk)
    proc = sharded_chain.build(cfg, m)
    p = sharded_chain.make_params(cfg, n_chan=1)
    s = sharded_chain.init_state(cfg, 1)
    iq = cx.as_cx(np.zeros((1, chunk * 8), np.complex64))
    txt = comm_model.lower_hlo(_inner_jit(proc), p, s, iq)
    return cfg, comm_model.collective_bytes_from_hlo(txt)


def test_chain_collectives_independent_of_chunk():
    cfg_a, stats_a = _chain_hlo(1024)
    cfg_b, stats_b = _chain_hlo(16384)
    # the collective footprint must not scale with the local chunk —
    # THE structural scaling property (compute grows, comm doesn't)
    assert stats_a.total_bytes == stats_b.total_bytes
    # the per-step collective COUNT is also chunk-invariant: the α
    # (launch latency) term of the α-β model is a constant per step, so
    # bigger chunks amortize it (VERDICT r2 #6)
    assert stats_a.counts == stats_b.counts
    assert sum(stats_a.counts.values()) < 64   # measured 45 on this jax
    # and shrinks relative to the local data as chunks grow
    assert stats_b.total_bytes < 0.15 * (16384 * 8)
    assert stats_b.counts.get("collective-permute", 0) > 0
    assert stats_b.counts.get("all-gather", 0) > 0


def test_chain_model_vs_hlo():
    cfg, stats = _chain_hlo(2048)
    model = comm_model.chain_comm_model(cfg, n_time=8, n_chan_local=1)
    # the model captures the dominant terms; XLA adds small bookkeeping
    # collectives (flag broadcasts) — require same order of magnitude
    assert model["total_bytes"] <= stats.total_bytes * 3
    assert stats.total_bytes <= model["total_bytes"] * 6


def test_wideband_all_to_all_dominates_and_matches():
    d = 8
    cfg = wideband.WidebandConfig(fs_in=96_000, n_chan=8,
                                  chunk_in=8 * 8 * 512, mode="AM",
                                  taps_per=8, n_taps=129)
    m = sharded_wideband.make_mesh()
    proc = sharded_wideband.build(cfg, m)
    p = wideband.make_params(cfg)
    s = wideband.init_state(cfg)
    iq = cx.as_cx(np.zeros(cfg.chunk_in, np.complex64))
    txt = comm_model.lower_hlo(_inner_jit(proc), p, s, (iq,))
    stats = comm_model.collective_bytes_from_hlo(txt)
    model = comm_model.wideband_comm_model(cfg, d)
    assert stats.counts.get("all-to-all", 0) >= 1
    # reshard volume is the dominant modeled term and bounded by ~2x of
    # the full chans buffer
    assert model["all_to_all_bytes"] <= model["total_bytes"]
    assert stats.total_bytes <= 4 * (model["total_bytes"]
                                     + cfg.chunk_in // d * 8)


def test_projected_efficiency_exceeds_north_star():
    """At the bench config, the projected multi-chip efficiency from the
    measured collective volume clears the ≥80 % BASELINE.md target with
    a large margin."""
    cfg = chain.ChainConfig(mode="AM", chunk=16128, os_block=16128,
                            n_taps=257)
    model = comm_model.chain_comm_model(cfg, n_time=8, n_chan_local=2560)
    # measured single-chip step: ~122 ms per 41.3 Msample chunk (bench)
    eff = comm_model.scaling_efficiency(0.122, model["total_bytes"])
    assert eff > 0.95


def test_projected_efficiency_with_latency_term():
    """α-β model (per-collective launch latency + bytes): still clears
    80 % at 8/16/64 chips using the HLO-measured collective count, and
    the latency term visibly dominates the bandwidth term for the tiny
    per-step exchanges (the failure mode the bandwidth-only model could
    not catch, VERDICT r2 #6)."""
    _, stats = _chain_hlo(2048)
    n_coll = sum(stats.counts.values())
    cfg = chain.ChainConfig(mode="AM", chunk=16128, os_block=16128,
                            n_taps=257)
    model = comm_model.chain_comm_model(cfg, n_time=8, n_chan_local=2560)
    for d in (8, 16, 64):
        eff = comm_model.scaling_efficiency_ab(
            0.073, n_coll, model["total_bytes"], hops=max(1, d // 8))
        assert eff > 0.8, (d, eff)
    # the α term dominates β for small exchanges: a 1-channel chain step
    # moves ~17 KB across ~n_coll collectives
    small = comm_model.chain_comm_model(cfg, n_time=8, n_chan_local=1)
    t = comm_model.comm_time_ab(n_coll, small["total_bytes"])
    beta_only = small["total_bytes"] / (45.0 * 1e9)
    assert t > 5 * beta_only


def test_tmajor_mesh_collectives_and_projection():
    """The round-4 time-major mesh (fused Pallas kernels per device,
    collectives between) keeps the Ulysses structure: ONE all-to-all
    dominating the volume. Projected efficiency at the MEASURED mesh
    step (6.4 ms/chunk on the bench chip, benchmarks/mesh_step_tpu.py)
    clears the ≥80 % north star at 8..64 chips."""
    d = 2
    cfg = wideband.WidebandConfig(fs_in=512 * 12_000, n_chan=512,
                                  chunk_in=2 * 512 * 128, mode="AM",
                                  taps_per=4, n_taps=129,
                                  **wideband.PROFILES["fast"])
    m = sharded_wideband.make_mesh(
        __import__("jax").devices()[:d])
    proc = sharded_wideband.build(cfg, m)
    p = wideband.make_params(cfg)
    iq = cx.as_cx(np.zeros(cfg.chunk_in, np.complex64))
    txt = comm_model.lower_hlo(_inner_jit(proc), p,
                               wideband.init_state(cfg), (iq,))
    stats = comm_model.collective_bytes_from_hlo(txt)
    assert stats.counts.get("all-to-all", 0) >= 1
    model = comm_model.wideband_comm_model(cfg, d)
    # the reshard stays the dominant volume term on the tmajor mesh too
    assert model["all_to_all_bytes"] >= 0.5 * model["total_bytes"]
    # collective COUNT is small and static (the α term stays bounded)
    assert sum(stats.counts.values()) < 32

    # projection at the headline, CONSISTENT weak-scaling accounting
    # (r5 — the r4 table paired full-chunk compute with 1/d-slice comm
    # bytes, overstating efficiency): each chip ingests its own 41.3 Ms
    # chunk (measured 6.4 ms), and its all_to_all moves (d−1)/d of its
    # OWN buffer — i.e. the model's strong-scaled slice bytes × d. The
    # conservative single-link no-overlap floor lands 60-70 %; hiding
    # the reshard behind the previous chunk's tail (the structure
    # process_n's multi-chunk programs expose) restores ≥80 %.
    head = wideband.WidebandConfig(
        fs_in=30_720_000, n_chan=2560, chunk_in=2560 * (16384 - 256),
        mode="AM", taps_per=8, n_taps=257,
        **wideband.PROFILES["fast"])
    n_coll = sum(stats.counts.values())
    for dd in (8, 16, 64):
        mdl = comm_model.wideband_comm_model(head, dd)
        bytes_weak = mdl["total_bytes"] * dd
        hops = max(1, dd // 8)
        eff_floor = comm_model.scaling_efficiency_ab(
            0.0064, n_coll, bytes_weak, hops=hops)
        assert eff_floor > 0.40, (dd, eff_floor)
        t_comm = comm_model.comm_time_ab(n_coll, bytes_weak, hops=hops)
        eff_overlap = 0.0064 / max(0.0064, t_comm)
        assert eff_overlap > 0.8, (dd, eff_overlap)
