"""Benchmark: wideband IQ→audio throughput on one TPU chip.

Runs the flagship pipeline — polyphase channelizer splitting a 30.72 MHz
capture into 2560 channels, each through the full receiver chain (NCO →
overlap-save passband → AM demod → AGC → 4× polyphase resample) — and
reports aggregate input Msamples/s on the chip.

Baseline: the reference client processes one 12 kHz receiver in real time
(0.012 Msamples/s per receiver, two receivers max — SURVEY.md §6); the
repo's north-star target is 1 Gsample/s aggregate over ≥2 hosts, i.e.
500 Msamples/s per host. `vs_baseline` is measured Msps / 500.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from supersdr_tpu.runtime import wideband

    # 1 second of a 30.72 MHz capture per step → 2560 AM receivers at
    # 12 kHz IQ each ("thousands of virtual receivers", BASELINE north star)
    cfg = wideband.WidebandConfig(fs_in=30_720_000, n_chan=2560,
                                  chunk_in=30_720_000, mode="AM",
                                  taps_per=8, n_taps=257,
                                  audio_rate=48_000)
    params = wideband.make_params(cfg)
    state = wideband.init_state(cfg)
    rng = np.random.default_rng(0)
    iq = jnp.asarray((rng.normal(size=cfg.chunk_in)
                      + 1j * rng.normal(size=cfg.chunk_in)) * 0.05,
                     jnp.complex64)

    # multi-chunk streaming step: scan 4 consecutive chunks per dispatch
    # (sample-exact vs 4 process() calls; amortizes per-dispatch latency)
    n_scan = 4
    iq_chunks = jnp.stack([iq] * n_scan)

    step = jax.jit(partial(wideband.process_many, cfg))

    # warmup / compile
    st, audio = step(params, state, iq_chunks)
    audio.block_until_ready()
    st, audio = step(params, st, iq_chunks)
    audio.block_until_ready()

    # enough iterations to amortize residual RPC latency (the axon
    # tunnel adds jittery milliseconds per call)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        st, audio = step(params, st, iq_chunks)
    audio.block_until_ready()
    dt = time.perf_counter() - t0

    msps = n_scan * cfg.chunk_in * iters / dt / 1e6
    print(json.dumps({
        "metric": "wideband_iq_to_audio_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
