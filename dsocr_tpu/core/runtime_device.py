"""Runtime device selection (ref: core/src/runtime.rs:22-47).

The reference picks cpu / metal / cuda at startup; here the backends are
the tunneled TPU (``axon``, this machine's default platform) and host CPU.
JAX owns device initialization, so "selecting a device" means steering
platform resolution BEFORE the first backend initializes.

This machine auto-imports jax at interpreter startup with
``JAX_PLATFORMS=axon`` pre-set, so env manipulation is too late —
``jax.config.update`` is the only lever that works (see tests/conftest).
"""

from __future__ import annotations

from typing import Optional

_ALIASES = {
    "tpu": None,  # default platform on this machine is the tunneled TPU
    "axon": None,
    "cpu": "cpu",
}


def apply_device_selection(device: Optional[str]) -> None:
    """Steer JAX platform resolution to honour ``--device``.

    Must run before the first device computation (backends initialize
    lazily on first use). A no-op for the default TPU platform or when
    ``device`` is unset. Raises if the backend already initialized with a
    different platform — silently ignoring the flag would be worse.
    """
    if not device:
        return
    key = device.strip().lower()
    if key not in _ALIASES:
        raise ValueError(
            f"unsupported device {device!r}; expected one of {sorted(_ALIASES)}"
        )
    platform = _ALIASES[key]
    if platform is None:
        return  # default resolution already points at the TPU tunnel

    import jax

    jax.config.update("jax_platforms", platform)
    # jax.config.update is silently ineffective once a backend exists;
    # verify the resolution actually landed where the flag asked.
    current = {d.platform for d in jax.devices()}
    if platform not in current:
        raise RuntimeError(
            f"--device {device} requested but the JAX backend already "
            f"initialized on {sorted(current)}"
        )
