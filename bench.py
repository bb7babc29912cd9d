"""Benchmark: wideband IQ→audio throughput on one TPU chip — self-validating.

Runs the flagship pipeline — polyphase channelizer splitting a 30.72 MHz
capture into 2560 channels, each through the full receiver chain (NCO →
overlap-save passband → AM demod → AGC → 4× polyphase resample) — and
reports aggregate input Msamples/s on the chip.

Methodology (round-1 post-mortem, VERDICT.md):
  * complex64 never crosses a program boundary — all inputs/outputs/state
    are split-complex float pairs (`ops.cx.CX`), so dispatches execute
    instead of silently aborting.
  * `block_until_ready()` is NOT trusted: on the tunneled backend it can
    return before execution finishes (and never raises on aborted
    buffers). All timing is fetch-forced: the clock stops only when a
    device-computed reduction over the final audio has been fetched to
    the host.
  * Integrity gate: before timing, the same pipeline (small config) runs
    on this backend AND on a CPU-backend subprocess oracle; the fetched
    audio must be finite, nonzero, and ≥50 dB SNR against the oracle.
    The timed run's audio statistics are additionally checked finite and
    consistent with the small-config level.

Baseline: the reference client processes one 12 kHz receiver in real time
(0.012 Msamples/s per receiver, two receivers max — SURVEY.md §6); the
repo's north-star target is 1 Gsample/s aggregate over ≥2 hosts, i.e.
500 Msamples/s per host; `vs_baseline` = measured Msps / 500 (the
per-host share — the aggregate multi-host claim is argued separately in
docs/PERFORMANCE.md's scaling section).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_REPO, ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

SMALL = dict(fs_in=192_000, n_chan=16, chunk_in=32_768, mode="AM",
             taps_per=8, n_taps=257, audio_rate=48_000)

# Headline: 2560 AM receivers from a 30.72 MHz capture. chunk_per_chan is
# chosen so the matmul-FIR blocks tile evenly (63 × 256) and the fallback
# FFT segment exactly fills the pow2 16384. Tuning fields are the winners
# of the on-chip A/B matrix (benchmarks/ab_passband.py, results in
# docs/PERFORMANCE.md): Toeplitz-matmul passband at HIGH precision
# (82 dB oracle SNR retained) + MXU four-step channelizer FFT.
HEADLINE = dict(fs_in=30_720_000, n_chan=2560,
                chunk_in=2560 * (16384 - 256), mode="AM",
                taps_per=8, n_taps=257, audio_rate=48_000,
                passband_impl="matmul", passband_precision="high",
                mxu_chan_fft=True)
N_SCAN = int(os.environ.get("BENCH_N_SCAN", "2"))  # chunks per device program
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


def _snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    num = float(np.linalg.norm(ref))
    den = float(np.linalg.norm(got - ref))
    if den == 0.0:
        return np.inf
    return 20.0 * np.log10(max(num, 1e-30) / den)


def integrity_check() -> dict:
    """Small-config validation with full audio readback: the device runs
    the HEADLINE's tuned pipeline (matmul passband, MXU FFT) while the
    CPU oracle runs the plain FFT path — so the gate is cross-backend AND
    cross-implementation."""
    import jax.numpy as jnp

    from supersdr_tpu.runtime import wideband

    tuning = {k: HEADLINE[k] for k in ("passband_impl", "passband_precision",
                                       "mxu_chan_fft") if k in HEADLINE}
    cfg = wideband.WidebandConfig(**SMALL, **tuning)
    rng = np.random.default_rng(0)
    iq = ((rng.normal(size=(2, cfg.chunk_in))
           + 1j * rng.normal(size=(2, cfg.chunk_in))) * 0.05
          ).astype(np.complex64)
    params = wideband.make_params(cfg)
    state = wideband.init_state(cfg)
    _, audio = wideband.process_many(cfg, params, state, iq)
    got = np.asarray(audio)          # full fetch — fails loudly if aborted

    inp, outp = "/tmp/bench_oracle_in.npz", "/tmp/bench_oracle_out.npz"
    np.savez(inp, iq=iq)
    src = _ORACLE_SRC.format(repo=_REPO, cfg=SMALL)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    subprocess.run([sys.executable, "-c", src, inp, outp], check=True,
                   env=env, timeout=600)
    ref = np.load(outp)["audio"]
    snr = _snr_db(ref, got)
    ok = bool(np.isfinite(got).all()) and float(np.abs(got).mean()) > 0 \
        and snr >= 50.0
    return {"integrity": "pass" if ok else "fail",
            "oracle_snr_db": round(float(snr), 1),
            "audio_mean_abs": round(float(np.abs(got).mean()), 6)}


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from supersdr_tpu.runtime import wideband

    checks = integrity_check()
    if checks["integrity"] != "pass":
        print(json.dumps({"metric": "wideband_iq_to_audio_throughput",
                          "value": 0.0, "unit": "Msamples/s/chip",
                          "vs_baseline": 0.0, **checks}))
        sys.exit(1)

    cfg = wideband.WidebandConfig(**HEADLINE)
    params = wideband.make_params(cfg)
    state = wideband.init_state(cfg)
    rng = np.random.default_rng(1)
    iq = ((rng.normal(size=(N_SCAN, cfg.chunk_in))
           + 1j * rng.normal(size=(N_SCAN, cfg.chunk_in))) * 0.05
          ).astype(np.complex64)

    from supersdr_tpu.ops import cx
    iq_dev = cx.as_cx(iq)            # float-pair transfer, stays on device

    def fetch_stat(audio):
        # device-side reduction over the WHOLE audio tensor; fetching the
        # scalar forces completion of everything it depends on
        return float(jnp.mean(jnp.abs(audio)))

    # warmup / compile (cold compile through the tunnel can take minutes;
    # the persistent cache makes repeat runs fast)
    st, audio = wideband.process_many(cfg, params, state, iq_dev)
    stat0 = fetch_stat(audio)
    assert np.isfinite(stat0) and stat0 > 0, f"warmup audio bad: {stat0}"

    # timed: state-chained steps; the clock stops at the fetched reduction
    samples_per_step = N_SCAN * cfg.chunk_in
    iters = 4
    while True:
        t0 = time.perf_counter()
        st_t = st
        for _ in range(iters):
            st_t, audio = wideband.process_many(cfg, params, st_t, iq_dev)
        stat = fetch_stat(audio)
        dt = time.perf_counter() - t0
        if dt >= MIN_MEASURE_S or iters >= 64:
            break
        iters *= 2

    assert np.isfinite(stat) and stat > 0, f"timed audio bad: {stat}"
    tail = np.asarray(audio.re[0, :2, :64] if hasattr(audio, "re")
                      else audio[0, :2, :64])
    assert np.isfinite(tail).all(), "audio slice not finite"

    msps = samples_per_step * iters / dt / 1e6
    # roofline sanity: ~7 HBM-traffic bytes and ~300 f32 FLOPs per input
    # sample (PFB fold+FFT, 16k-point overlap-save fwd+inv, scans,
    # 4x resample) — numbers must stay under chip limits
    gbps = msps * 1e6 * (2 * 4 + 4 * 4) / 1e9  # in planes + audio out, lower bound
    out = {
        "metric": "wideband_iq_to_audio_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 500.0, 4),
        "baseline_definition": "north-star 1 Gsps aggregate / 2 hosts = 500 Msps per-host share",
        "config": {"n_chan": cfg.n_chan, "fs_in": cfg.fs_in,
                   "chunk_in": cfg.chunk_in, "n_scan": N_SCAN,
                   "iters": iters, "pallas_fold": cfg.pallas_fold},
        "elapsed_s": round(dt, 3),
        "audio_mean_abs_headline": round(stat, 6),
        "min_hbm_gbps_implied": round(gbps, 1),
        **checks,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
