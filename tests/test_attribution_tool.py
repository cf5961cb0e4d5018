"""The serving-stage attribution tool stays runnable (tiny CPU mode)."""

import os
import subprocess
import sys


def test_attribution_tiny_smoke():
    env = dict(os.environ, ATTR_TINY="1", ATTR_SLOTS="2")
    out = subprocess.run(
        [sys.executable, "-m", "dsocr_tpu.bench.attribution"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "tower+prefill wave of 2" in out.stdout
    assert "decode chunk" in out.stdout
    assert "harvest:" in out.stdout
