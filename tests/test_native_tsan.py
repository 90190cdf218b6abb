"""ThreadSanitizer run of the native ring/pump stress harness.

SURVEY §5.2: the functional JAX design eliminates DSP-layer races, but
the C++ host edge (SPSC ring + socket ingest pump) is real threaded
code — it runs under TSan here and in CI (workflow job ``native-tsan``).
"""

import os
import shutil
import subprocess
import tempfile

import pytest

SRC = os.path.join(os.path.dirname(__file__), "..", "sdrtpu", "native", "src")
SOURCES = ["ringbuffer.cpp", "ingest.cpp", "tsan_stress.cpp"]


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_tsan_stress():
    with tempfile.TemporaryDirectory() as tmp:
        binary = os.path.join(tmp, "tsan_stress")
        build = subprocess.run(
            ["g++", "-std=c++17", "-O1", "-g", "-fsanitize=thread"]
            + [os.path.join(SRC, s) for s in SOURCES]
            + ["-o", binary],
            capture_output=True, text=True,
        )
        if build.returncode != 0:
            if "thread" in (build.stderr or "") and "sanitizer" in (
                build.stderr or ""
            ).lower():
                pytest.skip("toolchain lacks TSan runtime")
            raise AssertionError(f"tsan build failed:\n{build.stderr}")
        run = subprocess.run(
            [binary], capture_output=True, text=True, timeout=300,
            env={**os.environ, "TSAN_OPTIONS": "halt_on_error=1"},
        )
        assert run.returncode == 0, (
            f"tsan_stress failed (rc {run.returncode}):\n"
            f"{run.stdout}\n{run.stderr}"
        )
        assert "ALL OK" in run.stdout
