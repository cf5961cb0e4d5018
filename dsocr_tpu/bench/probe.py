"""Tunnel-health probe shared by every real-TPU bench entry point.

The axon tunnel has two observed failure states (see CLAUDE.md):
wedged (device listing works, any compute hangs — often after a client
was killed mid-device-op) and fully down (backend init blocks then
raises UNAVAILABLE). Exiting with a probe op still in flight is itself
a wedge trigger, so the probe runs the op on a daemon thread and WAITS
out the budget instead of killing anything; init-time errors retry
within the same budget after clearing the cached (failed) backend.
"""

from __future__ import annotations

import sys
import time


def probe_tunnel(timeout_s: float = 3600.0, tag: str = "probe") -> float:
    """Run a 1-op matmul on the default backend; return seconds taken.

    Retries init-time failures every 60s within ``timeout_s``; raises
    once the budget is exhausted (wedge: RuntimeError; down: the last
    backend error).
    """
    import queue
    import threading

    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    while True:
        out: "queue.Queue" = queue.Queue()

        def work():
            try:
                x = jnp.full((256, 256), 1.0, jnp.bfloat16)
                out.put(float(np.asarray((x @ x))[0, 0]))
            except Exception as err:  # pragma: no cover - device-dependent
                out.put(err)

        threading.Thread(target=work, daemon=True).start()
        remaining = timeout_s - (time.perf_counter() - t0)
        try:
            result = out.get(timeout=max(1.0, remaining))
        except queue.Empty:
            raise RuntimeError(
                f"TPU tunnel {tag} did not complete within {timeout_s:.0f}s "
                "— the axon tunnel is likely wedged; retry later"
            )
        if not isinstance(result, Exception):
            return time.perf_counter() - t0
        if time.perf_counter() - t0 + 60 > timeout_s:
            raise result
        print(
            f"[{tag}] tunnel probe failed ({type(result).__name__}); "
            "retrying in 60s",
            file=sys.stderr,
        )
        time.sleep(60)
        try:
            # a failed backend init is cached for the process lifetime —
            # drop it so the retry actually re-dials the tunnel
            import jax.extend.backend

            jax.extend.backend.clear_backends()
        except Exception:  # pragma: no cover - best effort
            pass
