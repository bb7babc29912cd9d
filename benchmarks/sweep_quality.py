"""Quality-profile sweep (VERDICT r3 #3): can the fused channelizer's
in-kernel split-bf16 dot3 stage B reach headline throughput at ≥80 dB?

For each variant: (a) MID-config (2560 chans, short chunk) SNR vs the
CPU-oracle plain path — the gate that caught the r3 fused-quality bug;
(b) headline step time (fetch-forced). Variants that fail to compile
are recorded as such.

Run: python benchmarks/sweep_quality.py
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from supersdr_tpu.ops import cx
from supersdr_tpu.runtime import wideband

MID = dict(fs_in=30_720_000, n_chan=2560, chunk_in=2560 * 512, mode="AM",
           taps_per=8, n_taps=257, audio_rate=48_000)
HEAD = dict(fs_in=30_720_000, n_chan=2560, chunk_in=2560 * (16384 - 256),
            mode="AM", taps_per=8, n_taps=257, audio_rate=48_000)

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

_oracle_cache = {}


def oracle_mid():
    if "mid" in _oracle_cache:
        return _oracle_cache["mid"]
    rng = np.random.default_rng(2)
    iq = ((rng.normal(size=(1, MID["chunk_in"]))
           + 1j * rng.normal(size=(1, MID["chunk_in"]))) * 0.05
          ).astype(np.complex64)
    np.savez("/tmp/sweep_mid_in.npz", iq=iq)
    src = _ORACLE_SRC.format(repo="/root/repo", cfg=MID)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    subprocess.run([sys.executable, "-c", src, "/tmp/sweep_mid_in.npz",
                    "/tmp/sweep_mid_out.npz"], check=True, env=env,
                   timeout=1800)
    ref = np.load("/tmp/sweep_mid_out.npz")["audio"]
    _oracle_cache["mid"] = (iq, ref)
    return iq, ref


def snr_db(ref, got):
    num = float(np.linalg.norm(ref))
    den = float(np.linalg.norm(got - ref))
    return 20.0 * np.log10(max(num, 1e-30) / max(den, 1e-30))


def run(tag, tuning):
    iq, ref = oracle_mid()
    try:
        cfg = wideband.WidebandConfig(**MID, **tuning)
        params = wideband.make_params(cfg)
        state = wideband.init_state(cfg)
        _, audio = wideband.process_many(cfg, params, state, iq)
        got = np.asarray(audio).astype(np.float32)
        if tuning.get("time_major"):
            got = np.swapaxes(got, -1, -2)
        s = snr_db(ref, got)

        hcfg = wideband.WidebandConfig(**HEAD, **tuning)
        hp = wideband.make_params(hcfg)
        hs = wideband.init_state(hcfg)

        @jax.jit
        def gen(key):
            kr, ki = jax.random.split(key)
            return cx.CX(
                0.05 * jax.random.normal(kr, (1, hcfg.chunk_in),
                                         jnp.float32),
                0.05 * jax.random.normal(ki, (1, hcfg.chunk_in),
                                         jnp.float32))

        hiq = gen(jax.random.PRNGKey(1))
        hs, haudio = wideband.process_many(hcfg, hp, hs, hiq)
        stat = float(jnp.mean(jnp.abs(haudio.astype(jnp.float32))))
        assert np.isfinite(stat) and stat > 0
        iters = 8
        while True:
            t0 = time.perf_counter()
            s2 = hs
            for _ in range(iters):
                s2, haudio = wideband.process_many(hcfg, hp, s2, hiq)
            x = float(jnp.mean(jnp.abs(haudio.astype(jnp.float32))))
            dt = time.perf_counter() - t0
            if dt > 2.0 or iters >= 128:
                break
            iters *= 2
        assert np.isfinite(x) and x > 0
        ms = dt / iters * 1e3
        msps = hcfg.chunk_in * iters / dt / 1e6
        print(f"{tag:36s} SNR {s:6.1f} dB   step {ms:6.2f} ms  "
              f"{msps:7.0f} Msps")
    except Exception as e:
        print(f"{tag:36s} FAILED: {type(e).__name__}: {str(e)[:160]}")


def main():
    q = dict(wideband.PROFILES["quality"])
    run("quality r3 (mxu2pallas+XLA HIGH)", q)
    for tile in (72, 80, 96, 112):
        t = dict(q)
        t.update(chan_impl="mxu2fused", time_major=True, chan_tile_t=tile)
        run(f"quality fused-dot3 tmajor T={tile}", t)
    # fast-tier tile sweep
    for tile in (96, 128, 192, 256):
        f = dict(wideband.PROFILES["fast"])
        f.update(chan_tile_t=tile)
        run(f"fast tmajor T={tile}", f)


if __name__ == "__main__":
    main()
