"""ASan/TSan jobs for the native layer (SURVEY.md §5 upgrade: the
reference ships no sanitizer configuration at all).

Each test builds a sanitized libspringtpu and runs sanitizer_driver.py
(all native codec paths incl. OpenMP parallelism and corrupt-stream
decodes) in a subprocess with the sanitizer runtime preloaded.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSRC = os.path.join(REPO, "spring_tpu", "csrc")
DRIVER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "sanitizer_driver.py")
GCC_LIB = "/usr/lib/x86_64-linux-gnu"


def _run_with(so_name: str, preload: str, extra_env: dict) -> str:
    r = subprocess.run(["make", "-s", "-C", CSRC, so_name],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ)
    env.update(extra_env)
    env["SPRING_TPU_SO"] = os.path.join(CSRC, so_name)
    env["LD_PRELOAD"] = preload
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run([sys.executable, DRIVER], capture_output=True,
                       text=True, env=env, cwd=REPO, timeout=600)
    out = p.stdout + p.stderr
    assert "SANITIZER-DRIVER-OK" in out, out[-4000:]
    return out


@pytest.mark.skipif(not os.path.exists(f"{GCC_LIB}/libasan.so.8"),
                    reason="libasan not installed")
def test_native_layer_asan():
    out = _run_with(
        "libspringtpu_asan.so", f"{GCC_LIB}/libasan.so.8",
        # leak check off: the long-lived Python interpreter "leaks" by design
        {"ASAN_OPTIONS": "detect_leaks=0,abort_on_error=0"})
    assert "AddressSanitizer" not in out, out[-4000:]


@pytest.mark.skipif(not os.path.exists(f"{GCC_LIB}/libtsan.so.2"),
                    reason="libtsan not installed")
def test_native_layer_tsan():
    out = _run_with(
        "libspringtpu_tsan.so", f"{GCC_LIB}/libtsan.so.2",
        # gcc's libgomp has no TSan annotations: every OMP fork/join is a
        # false positive, so the TSan job drives pthread-level concurrency
        # (Python threads x serial-OMP codec calls) instead
        {"TSAN_OPTIONS": "report_bugs=1,halt_on_error=0,exitcode=0",
         "SAN_SCALE": "0.1", "SAN_PTHREADS": "1", "SAN_OMP": "1",
         "OMP_NUM_THREADS": "1"})
    assert "WARNING: ThreadSanitizer" not in out, out[-4000:]
