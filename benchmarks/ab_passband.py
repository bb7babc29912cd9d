"""On-chip A/B: passband fft vs matmul, PFB slice-fold vs Pallas fold.

ROUND-2 HARNESS, superseded by `benchmarks/ab_full.py` (which generates
its timed inputs on device — this one ships 660 MB through the ~1 MB/s
tunnel and takes ~12 minutes to start). Kept for the historical variant
matrix recorded in docs/PERFORMANCE.md.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

SMALL = dict(fs_in=192_000, n_chan=16, chunk_in=32_768, mode="AM",
             taps_per=8, n_taps=257, audio_rate=48_000)
HEADLINE = dict(fs_in=30_720_000, n_chan=2560,
                chunk_in=2560 * (16384 - 256), mode="AM",
                taps_per=8, n_taps=257, audio_rate=48_000)
N_SCAN = 2
MIN_MEASURE_S = 2.0

_ORACLE_SRC = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from supersdr_tpu.runtime import wideband
d = np.load(sys.argv[1])
cfg = wideband.WidebandConfig(**{cfg!r})
params = wideband.make_params(cfg)
state = wideband.init_state(cfg)
_, audio = wideband.process_many(cfg, params, state, d["iq"])
np.savez(sys.argv[2], audio=np.asarray(audio))
"""


def _snr_db(ref, got):
    den = float(np.linalg.norm(got - ref))
    if den == 0.0:
        return np.inf
    return 20.0 * np.log10(max(float(np.linalg.norm(ref)), 1e-30) / den)


def integrity(variant: dict) -> float:
    from supersdr_tpu.runtime import wideband
    cfg = wideband.WidebandConfig(**SMALL, **variant)
    rng = np.random.default_rng(0)
    iq = ((rng.normal(size=(2, cfg.chunk_in))
           + 1j * rng.normal(size=(2, cfg.chunk_in))) * 0.05
          ).astype(np.complex64)
    params = wideband.make_params(cfg)
    state = wideband.init_state(cfg)
    _, audio = wideband.process_many(cfg, params, state, iq)
    got = np.asarray(audio)
    inp, outp = "/tmp/ab_oracle_in.npz", "/tmp/ab_oracle_out.npz"
    np.savez(inp, iq=iq)
    # oracle: CPU backend, FFT reference path (cross-impl as well as
    # cross-backend when the variant isn't the default)
    src = _ORACLE_SRC.format(repo=_REPO, cfg=SMALL)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    subprocess.run([sys.executable, "-c", src, inp, outp], check=True,
                   env=env, timeout=900)
    ref = np.load(outp)["audio"]
    snr = _snr_db(ref, got)
    assert np.isfinite(got).all() and float(np.abs(got).mean()) > 0, "bad audio"
    assert snr >= 50.0, f"integrity FAIL: snr {snr:.1f} dB"
    return snr


def time_variant(variant: dict) -> dict:
    import jax.numpy as jnp
    from supersdr_tpu.ops import cx
    from supersdr_tpu.runtime import wideband

    snr = integrity(variant)
    cfg = wideband.WidebandConfig(**HEADLINE, **variant)
    params = wideband.make_params(cfg)
    state = wideband.init_state(cfg)
    rng = np.random.default_rng(1)
    iq = ((rng.normal(size=(N_SCAN, cfg.chunk_in))
           + 1j * rng.normal(size=(N_SCAN, cfg.chunk_in))) * 0.05
          ).astype(np.complex64)
    iq_dev = cx.as_cx(iq)

    st, audio = wideband.process_many(cfg, params, state, iq_dev)
    stat0 = float(jnp.mean(jnp.abs(audio)))
    assert np.isfinite(stat0) and stat0 > 0, f"warmup bad: {stat0}"

    samples = N_SCAN * cfg.chunk_in
    iters = 4
    while True:
        t0 = time.perf_counter()
        st_t = st
        for _ in range(iters):
            st_t, audio = wideband.process_many(cfg, params, st_t, iq_dev)
        stat = float(jnp.mean(jnp.abs(audio)))
        dt = time.perf_counter() - t0
        if dt >= MIN_MEASURE_S or iters >= 64:
            break
        iters *= 2
    assert np.isfinite(stat) and stat > 0, f"timed bad: {stat}"
    msps = samples * iters / dt / 1e6
    return {"variant": variant, "msps": round(msps, 2),
            "step_ms": round(dt / iters * 1e3, 2),
            "oracle_snr_db": round(snr, 1), "iters": iters}


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    variants = [
        {"passband_impl": "fft", "pallas_fold": False},
        {"passband_impl": "matmul", "pallas_fold": False},
        {"passband_impl": "matmul", "pallas_fold": True},
        {"passband_impl": "matmul", "passband_precision": "high"},
        {"passband_impl": "matmul", "resample_impl": "fma"},
        {"passband_impl": "matmul", "mxu_chan_fft": True},
        {"passband_impl": "matmul", "passband_precision": "high",
         "mxu_chan_fft": True},
        {"passband_impl": "matmul_real", "passband_precision": "high",
         "mxu_chan_fft": True},
    ]
    if len(sys.argv) > 1:          # run a subset: indices as args
        variants = [variants[int(a)] for a in sys.argv[1:]]
    for v in variants:
        try:
            res = time_variant(v)
        except Exception as e:  # noqa: BLE001 — report per-variant failure
            res = {"variant": v, "error": repr(e)[:300]}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
