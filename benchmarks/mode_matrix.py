"""Mode / controls cost matrix at the HEADLINE shape (round 5).

Round-5 closed the "enabling a reference control forfeits the fast
tier" gap (VERDICT r4 items 3-5) with tier-retention TESTS; this
harness puts NUMBERS on the same claim: the per-chunk step time and
oracle SNR for every demod mode and every fused control, at the exact
headline shape/profile bench.py times (2560 channels, 41.3 Msample
chunks, process_n N_SCAN=2, fetch-forced).

Also measures the MID-SSB margin experiment (VERDICT r4 weak #3): the
fast profile's one-sided (complex-tap) FIR at bf16 gates 50.4 dB —
only 0.4 dB over the 50 dB floor, because SSB audio takes the FULL
complex rounding error where AM's envelope projects out ~half of it.
Row "USB fast+fir3" runs the split-bf16 x3 in-tail FIR (the quality
tier's FIR, everything else fast) to price the margin fix.

Usage: python benchmarks/mode_matrix.py [row-names...]
Rows gate against the CPU plain-path oracle at the MID shape before
timing (hang rows are gated informationally: the fused hang window is
tile-granular by design — [W, W+2*tile] — so exact-oracle SNR on noise
is NOT a correctness bound there; tests/test_fused_controls.py bounds
its ballistics instead).
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import bench  # the shipped bench harness: gates + config constants

MIN_S = 2.0
N_SCAN = 2

FAST = dict(bench.PROFILES["fast"])
QUALITY = dict(bench.PROFILES["quality"])
FAST_FIR3 = {**FAST, "passband_precision": "high"}

# name -> (headline overrides, tuning, gate spec)
#   gate spec: ("std", mid_overrides, seed, tag) | ("nbfm",) | None
ROWS = {
    "AM fast":        ({}, FAST, ("std", {}, 2, "mid")),
    "USB fast":       (dict(mode="USB"), FAST,
                       ("std", dict(mode="USB"), 4, "midssb")),
    "USB fast+fir3":  (dict(mode="USB"), FAST_FIR3,
                       ("std", dict(mode="USB"), 4, "midssb")),
    "NBFM fast":      (dict(mode="NBFM"), FAST, ("nbfm",)),
    "AM fast squelch": (dict(squelch_enabled=True), FAST,
                        ("std", dict(squelch_enabled=True), 2, "midsq")),
    "AM fast hang":   (dict(hang_enabled=True, hang_ms=500.0), FAST,
                       ("info", dict(hang_enabled=True, hang_ms=500.0),
                        2, "midhang")),
    "USB quality":    (dict(mode="USB"), QUALITY,
                       ("std", dict(mode="USB"), 4, "midssb")),
    "NBFM quality":   (dict(mode="NBFM"), QUALITY, ("nbfm",)),
    "AM fast+fir3":   ({}, FAST_FIR3, ("std", {}, 2, "mid")),
}


def time_headline(overrides: dict, tuning: dict) -> dict:
    import jax
    import jax.numpy as jnp
    from supersdr_tpu.ops import cx
    from supersdr_tpu.runtime import wideband

    cfg = wideband.WidebandConfig(**{**bench.HEADLINE, **overrides},
                                  **tuning)
    params = wideband.make_params(cfg)
    state = wideband.init_state(cfg)

    @jax.jit
    def gen(key):
        kr, ki = jax.random.split(key)
        shp = (cfg.chunk_in,)
        return cx.CX(0.05 * jax.random.normal(kr, shp, jnp.float32),
                     0.05 * jax.random.normal(ki, shp, jnp.float32))

    iq1 = gen(jax.random.PRNGKey(1))
    assert np.isfinite(float(jnp.mean(jnp.abs(iq1.re[:64]))))
    iq_tup = (iq1,) * N_SCAN

    def step(st_):
        st2, outs = wideband.process_n(cfg, params, st_, iq_tup)
        return st2, outs[-1]

    def fetch(audio):
        return float(jnp.mean(jnp.abs(audio.astype(jnp.float32))))

    st, audio = step(state)
    stat0 = fetch(audio)
    assert np.isfinite(stat0), f"warmup audio bad: {stat0}"

    iters = 8
    while True:
        t0 = time.perf_counter()
        st_t = st
        for _ in range(iters):
            st_t, audio = step(st_t)
        stat = fetch(audio)
        dt = time.perf_counter() - t0
        if dt >= MIN_S or iters >= 256:
            break
        iters *= 2
    assert np.isfinite(stat), f"timed audio bad: {stat}"
    msps = N_SCAN * cfg.chunk_in * iters / dt / 1e6
    return {"msps": round(msps, 1),
            "step_ms": round(dt / iters / N_SCAN * 1e3, 2),
            "iters": iters}


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    names = sys.argv[1:] or list(ROWS)
    for name in names:
        overrides, tuning, gate = ROWS[name]
        res = {"row": name}
        try:
            if gate and gate[0] in ("std", "info"):
                _, mid_over, seed, tag = gate
                g = bench._gate(tuning, {**bench.MID, **mid_over},
                                n_chunks=1, seed=seed, tag=tag)
                res["gate_snr_db"] = g[f"oracle_snr_db_{tag}"]
                res["gate_ok"] = (bool(g[f"ok_{tag}"]) if gate[0] == "std"
                                  else "informational")
            elif gate and gate[0] == "nbfm":
                g = bench._gate_nbfm(tuning)
                res["gate_snr_db"] = g["oracle_snr_db_midnbfm"]
                res["gate_ok"] = bool(g["ok_midnbfm"])
            if res.get("gate_ok") is False:
                print(json.dumps(res), flush=True)
                continue
            res.update(time_headline(overrides, tuning))
        except Exception as e:  # noqa: BLE001
            res["error"] = repr(e)[:300]
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
