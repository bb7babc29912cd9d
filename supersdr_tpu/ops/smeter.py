"""RSSI / S-meter estimation and display ballistics.

The reference receives an RSSI value in every SND frame header
(rssi = 0.1·s_meter_u16 - 127, /root/reference/utils_supersdr.py:1066-1069)
computed by the server from the passband signal, then smooths it for
display with asymmetric attack/decay ballistics in the render loop
(supersdr.py:936-947). Here RSSI is measured natively from the
passband-filtered block, with the same wire-format convention available for
interop (encode/decode of the 0.1·x-127 u16 scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Full-scale (|iq| = 1.0) calibration, dB. The KiwiSDR waterfall convention
# uses a -13 dB cal term (utils_supersdr.py:789 "typical Kiwi wf cal").
DEFAULT_CAL_DB = -13.0
RSSI_FLOOR_DB = -127.0


def rssi_db(y: jax.Array, cal_db: float = DEFAULT_CAL_DB) -> jax.Array:
    """Mean-power RSSI of a passband block [*batch, n] → [*batch] dB."""
    p = jnp.mean(jnp.abs(y) ** 2, axis=-1)
    return jnp.maximum(10.0 * jnp.log10(jnp.maximum(p, 1e-30)) + cal_db,
                       RSSI_FLOOR_DB)


def encode_smeter_u16(rssi: jax.Array) -> jax.Array:
    """Inverse of the SND-header decode: u16 = 10·(rssi + 127)."""
    return jnp.clip(jnp.round((rssi + 127.0) * 10.0), 0, 65535).astype(jnp.uint16)


def decode_smeter_u16(raw: jax.Array) -> jax.Array:
    return 0.1 * raw.astype(jnp.float32) - 127.0


def smooth(prev: jax.Array, rssi: jax.Array, attack: float = 0.5,
           decay: float = 0.1) -> jax.Array:
    """Display ballistics: fast rise, slow fall (supersdr.py:936-947)."""
    coeff = jnp.where(rssi > prev, attack, decay)
    return prev + coeff * (rssi - prev)


def s_units(rssi: jax.Array) -> jax.Array:
    """Map dBm-convention RSSI to S-units (S9 = -73 dBm, 6 dB per unit)."""
    return (rssi + 127.0) / 6.0
