"""Extended benchmark suite (secondary metrics beyond bench.py's headline).

Measures, on the attached TPU chip:

  1. wideband IQ→audio throughput (the bench.py headline, same config)
  2. receiver-chain-only throughput (2560 pre-channelized receivers)
  3. waterfall pipeline rate: 1024-bin windowed-FFT rows/s including dB
     calibration + percentile auto-leveling + 10x LINRAD averaging
     (the reference's server caps this at 23 rows/s — BASELINE.md)
  4. single-receiver per-block latency p50/p95 at the reference's frame
     unit (512 IQ samples), dispatch→audio-ready round trip

Prints one JSON line per metric. `python benchmarks/bench_suite.py`.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit_chain(fn, state, iters):
    """Time fn(state)->state chained through its carry, amortized."""
    st = fn(state)  # warm (already compiled by caller)
    t0 = time.perf_counter()
    for _ in range(iters):
        st = fn(st)
    import jax
    jax.block_until_ready(st)
    return (time.perf_counter() - t0) / iters


def bench_wideband():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from supersdr_tpu.runtime import wideband

    cfg = wideband.WidebandConfig(fs_in=30_720_000, n_chan=2560,
                                  chunk_in=30_720_000, mode="AM",
                                  taps_per=8, n_taps=257, audio_rate=48_000)
    params = wideband.make_params(cfg)
    state = wideband.init_state(cfg)
    rng = np.random.default_rng(0)
    iq = jnp.asarray((rng.normal(size=(4, cfg.chunk_in))
                      + 1j * rng.normal(size=(4, cfg.chunk_in))) * 0.05,
                     jnp.complex64)
    step = jax.jit(partial(wideband.process_many, cfg))
    st, audio = step(params, state, iq)
    audio.block_until_ready()

    def fn(st):
        st2, _ = step(params, st, iq)
        return st2

    dt = _timeit_chain(fn, st, 10)
    msps = 4 * cfg.chunk_in / dt / 1e6
    return {"metric": "wideband_iq_to_audio_throughput",
            "value": round(msps, 1), "unit": "Msamples/s/chip",
            "vs_baseline": round(msps / 500.0, 2)}


def bench_chain_only():
    import jax
    import jax.numpy as jnp

    from supersdr_tpu.runtime import chain

    n_rx, chunk = 2560, 12000
    cfg = chain.ChainConfig(mode="AM", iq_rate=12000, audio_rate=48000,
                            chunk=chunk, os_block=chunk, n_taps=257)
    params = chain.make_params(cfg, freq_offset_hz=np.zeros(n_rx))
    state = chain.init_state(cfg, (n_rx,))
    rng = np.random.default_rng(1)
    iq = jnp.asarray((rng.normal(size=(n_rx, chunk))
                      + 1j * rng.normal(size=(n_rx, chunk))) * 0.05,
                     jnp.complex64)
    st, out = chain.process(cfg, params, state, iq)
    out.audio.block_until_ready()

    def fn(st):
        st2, _ = chain.process(cfg, params, st, iq)
        return st2

    dt = _timeit_chain(fn, st, 20)
    msps = n_rx * chunk / dt / 1e6
    return {"metric": "chain_only_throughput_2560rx",
            "value": round(msps, 1), "unit": "Msamples/s/chip",
            "vs_baseline": round(msps / 500.0, 2)}


def bench_waterfall():
    """1024-bin waterfall rows/s: FFT + dB + autolevel + 10x averaging."""
    import jax
    import jax.numpy as jnp

    from supersdr_tpu.ops import spectrum

    nfft, rows_per_call, n_avg = 1024, 4096, 10
    win = spectrum.spectrum_window(nfft)
    rng = np.random.default_rng(2)
    iq = jnp.asarray((rng.normal(size=(rows_per_call * nfft,))
                      + 1j * rng.normal(size=(rows_per_call * nfft,))) * 0.1,
                     jnp.complex64)

    @jax.jit
    def wf(iq):
        rows = spectrum.segment_rows(iq, nfft)
        db = spectrum.power_spectrum_db(rows, win)
        db = spectrum.time_binned_average(db, n_avg)
        lv = spectrum.autolevel(db)
        return lv

    out = wf(iq)
    jax.block_until_ready(out)
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = wf(iq)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rows_s = rows_per_call / dt
    # reference server cap: 23 rows/s (BASELINE.md)
    return {"metric": "waterfall_1024bin_rows_per_s",
            "value": round(rows_s, 1), "unit": "rows/s/chip",
            "vs_baseline": round(rows_s / 23.0, 1)}


def bench_block_latency():
    """Reference frame unit: one receiver, 512-sample block round trip."""
    import jax
    import jax.numpy as jnp

    from supersdr_tpu.runtime import chain

    cfg = chain.ChainConfig(mode="USB", iq_rate=12000, audio_rate=48000,
                            chunk=512, os_block=512, n_taps=257)
    params = chain.make_params(cfg)
    state = chain.init_state(cfg, ())
    rng = np.random.default_rng(3)
    iq = jnp.asarray((rng.normal(size=512) + 1j * rng.normal(size=512)) * 0.1,
                     jnp.complex64)
    st, out = chain.process(cfg, params, state, iq)
    out.audio.block_until_ready()
    lats = []
    for _ in range(50):
        t0 = time.perf_counter()
        st, out = chain.process(cfg, params, st, iq)
        out.audio.block_until_ready()
        lats.append(time.perf_counter() - t0)
    lats = np.sort(np.asarray(lats)) * 1e6
    return {"metric": "single_rx_512blk_latency_p50",
            "value": round(float(lats[len(lats) // 2]), 1), "unit": "us",
            "vs_baseline": None,
            "p95_us": round(float(lats[int(len(lats) * 0.95)]), 1)}


def main():
    for fn in (bench_wideband, bench_chain_only, bench_waterfall,
               bench_block_latency):
        print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    main()
