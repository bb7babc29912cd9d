"""Round-3 full-pipeline on-chip A/B (device-generated inputs).

Each variant: (1) SMALL-config integrity gate against the CPU-backend
oracle running the plain reference path (cross-backend AND cross-impl,
host data — small enough for the ~1 MB/s tunnel), then (2) HEADLINE
timing with the IQ generated ON DEVICE (shipping a 660 MB chunk eagerly
through the tunnel costs ~12 min and is never part of an experiment).
Fetch-forced timing throughout. Winners become bench.py defaults.

Usage: python benchmarks/ab_full.py [variant-indices...]
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
N_SCAN = int(os.environ.get("BENCH_N_SCAN", "2"))
MIN_S = 2.0

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

BASE = dict(passband_impl="matmul", passband_precision="high",
            mxu_chan_fft=True)

VARIANTS = [
    BASE,                                                          # 0 r2 ref
    {**BASE, "chan_impl": "mxu2"},                                 # 1
    {**BASE, "chan_impl": "mxu2", "chan_precision": "default"},    # 2
    {**BASE, "chan_impl": "mxu2", "chan_precision": "default",
     "chan_fold_dtype": "f16"},                                    # 3
    {**BASE, "chan_impl": "mxu2", "chan_precision": "high",
     "chan_fold_dtype": "f16"},                                    # 4
    {**BASE, "chan_impl": "mxu2", "chan_precision": "default",
     "chan_fold_dtype": "f16", "resample_impl": "matmul"},         # 5
    {**BASE, "chan_impl": "mxu2", "chan_precision": "default",
     "chan_fold_dtype": "f16", "resample_impl": "matmul",
     "passband_precision": "default"},                             # 6
    {**BASE, "chan_impl": "mxu2conv", "chan_precision": "default",
     "chan_fold_dtype": "f16"},                                    # 7
    # the balanced config: chan HIGH FFT (3-pass, ~98 dB) + f16 fold +
    # matmul resampler — accuracy limited only by the f16 fold (~76 dB)
    {**BASE, "chan_impl": "mxu2", "chan_precision": "high",
     "chan_fold_dtype": "f16", "resample_impl": "matmul"},         # 8
    # + passband at HIGH (already BASE) but resampler DEFAULT
    {**BASE, "chan_impl": "mxu2", "chan_precision": "high",
     "chan_fold_dtype": "f16", "resample_impl": "matmul",
     "resample_precision": "high"},                                # 9
    # all-DEFAULT everything (speed ceiling)
    {**BASE, "chan_impl": "mxu2", "chan_precision": "default",
     "chan_fold_dtype": "f16", "resample_impl": "matmul",
     "passband_precision": "default",
     "resample_precision": "default"},                             # 10
    # v6 + resampler precision high instead of HIGHEST
    {**BASE, "chan_impl": "mxu2", "chan_precision": "default",
     "chan_fold_dtype": "f16", "resample_impl": "matmul",
     "passband_precision": "default",
     "resample_precision": "high"},                                # 11
    # fftmxu passband (layout-rotating MXU overlap-save, round 3b)
    {"passband_impl": "fftmxu", "passband_precision": "default",
     "chan_impl": "mxu2", "chan_precision": "default",
     "chan_fold_dtype": "f16", "resample_impl": "matmul",
     "resample_precision": "high"},                                # 12
    {"passband_impl": "fftmxu", "passband_precision": "high",
     "chan_impl": "mxu2", "chan_precision": "default",
     "chan_fold_dtype": "f16", "resample_impl": "matmul",
     "resample_precision": "high"},                                # 13
    {"passband_impl": "fftmxu", "passband_precision": "high",
     "chan_impl": "mxu2", "chan_precision": "high",
     "chan_fold_dtype": "f16", "resample_impl": "matmul",
     "resample_precision": "high"},                                # 14
    # Mosaic compiles as of round 3: single-VMEM-pass Pallas fold (f32)
    {**BASE, "chan_impl": "mxu2pallas", "chan_precision": "default",
     "resample_impl": "matmul", "passband_precision": "default",
     "resample_precision": "high"},                                # 15
    {**BASE, "chan_impl": "mxu2pallas", "chan_precision": "high",
     "resample_impl": "matmul",
     "resample_precision": "high"},                                # 16
    # quality-with-pallas: full-precision fold lifts the f16 76 dB floor
    {"passband_impl": "matmul", "passband_precision": "high",
     "chan_impl": "mxu2pallas", "chan_precision": "high",
     "resample_impl": "matmul", "resample_precision": "high"},     # 17
    # DIT fft form (no batched dot dims) vs the DIF default, in context
    {**BASE, "chan_impl": "mxu2", "chan_precision": "default",
     "chan_fold_dtype": "f16", "resample_impl": "matmul",
     "passband_precision": "default", "resample_precision": "high",
     "chan_fft_form": "dit"},                                      # 18
    {"passband_impl": "matmul", "passband_precision": "high",
     "chan_impl": "mxu2pallas", "chan_precision": "high",
     "resample_impl": "matmul", "resample_precision": "high",
     "chan_fft_form": "dit"},                                      # 19
    # fully-fused Pallas channelizer (fold + both FFT stages, one VMEM
    # pass — ops/pallas/channelize_fused.py)
    {"passband_impl": "matmul", "passband_precision": "default",
     "chan_impl": "mxu2fused", "chan_precision": "default",
     "resample_impl": "matmul", "resample_precision": "high"},     # 20
    {"passband_impl": "matmul", "passband_precision": "high",
     "chan_impl": "mxu2fused", "chan_precision": "high",
     "resample_impl": "matmul", "resample_precision": "high"},     # 21
    # fused chain tail (demod+DC+AGC+resample in one Mosaic kernel)
    {"passband_impl": "matmul", "passband_precision": "default",
     "chan_impl": "mxu2fused", "chan_precision": "default",
     "resample_impl": "matmul", "resample_precision": "high",
     "tail_impl": "pallas"},                                       # 22
    {"passband_impl": "matmul", "passband_precision": "high",
     "chan_impl": "mxu2fused", "chan_precision": "high",
     "resample_impl": "matmul", "resample_precision": "high",
     "tail_impl": "pallas"},                                       # 23
    # quality candidate: full-precision Pallas fold + XLA HIGH FFT
    # stages + fused tail (the fused channelizer's in-kernel stage B
    # cannot reach f32 at speed — Mosaic has no multi-pass dot)
    {"passband_impl": "matmul", "passband_precision": "high",
     "chan_impl": "mxu2pallas", "chan_precision": "high",
     "resample_impl": "matmul", "resample_precision": "high",
     "tail_impl": "pallas"},                                       # 24
]


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
    inp, outp = "/tmp/abf_oracle_in.npz", "/tmp/abf_oracle_out.npz"
    np.savez(inp, iq=iq)
    src = _ORACLE_SRC.format(repo=_REPO, cfg=SMALL)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    subprocess.run([sys.executable, "-c", src, inp, outp], check=True,
                   env=env, timeout=900)
    ref = np.load(outp)["audio"]
    snr = _snr_db(ref, got)
    assert np.isfinite(got).all() and float(np.abs(got).mean()) > 0, "bad audio"
    return snr


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    from supersdr_tpu.ops import cx
    from supersdr_tpu.runtime import wideband

    idxs = [int(a) for a in sys.argv[1:]] or range(len(VARIANTS))
    for i in idxs:
        variant = VARIANTS[i]
        try:
            snr = integrity(variant)
            cfg = wideband.WidebandConfig(**HEADLINE, **variant)
            params = wideband.make_params(cfg)
            state = wideband.init_state(cfg)

            @jax.jit
            def gen(key):
                kr, ki = jax.random.split(key)
                shp = (N_SCAN, cfg.chunk_in)
                return cx.CX(0.05 * jax.random.normal(kr, shp, jnp.float32),
                             0.05 * jax.random.normal(ki, shp, jnp.float32))

            iq_dev = gen(jax.random.PRNGKey(1))
            assert np.isfinite(float(jnp.sum(jnp.abs(iq_dev.re[0, :8]))))

            st, audio = wideband.process_many(cfg, params, state, iq_dev)
            stat0 = float(jnp.mean(jnp.abs(audio)))
            assert np.isfinite(stat0) and stat0 > 0, f"warmup bad: {stat0}"

            samples = N_SCAN * cfg.chunk_in
            iters = 4
            while True:
                t0 = time.perf_counter()
                st_t = st
                for _ in range(iters):
                    st_t, audio = wideband.process_many(cfg, params, st_t,
                                                        iq_dev)
                stat = float(jnp.mean(jnp.abs(audio)))
                dt = time.perf_counter() - t0
                if dt >= MIN_S or iters >= 64:
                    break
                iters *= 2
            assert np.isfinite(stat) and stat > 0
            msps = samples * iters / dt / 1e6
            print(json.dumps({"i": i, "variant": variant,
                              "msps": round(msps, 2),
                              "step_ms": round(dt / iters * 1e3, 2),
                              "oracle_snr_db": round(snr, 1),
                              "iters": iters}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"i": i, "variant": variant,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
