"""Native C API end-to-end tests: build the shared library + C clients with
the repo Makefile and run them as subprocesses — the analogue of the
reference's ctest-driven C clients (tests/CMakeLists.txt:19-23, run by CI
.github/workflows/build.yml:96-99).

test00: core surface (materials, streamed cornell box, area light, render,
        pixel readback).
test05: full surface (RAM image texture, node material, orco vertices,
        all 7 render callbacks + logger callback, named outputs, extra
        layers, tables, version fns, and a test04-style scene mutation
        between renders).
"""
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


@pytest.fixture(scope="module")
def native_build():
    if shutil.which("g++") is None or shutil.which("make") is None:
        pytest.skip("no native toolchain")
    r = subprocess.run(["make", "-C", NATIVE], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.fail(f"native build failed:\n{r.stdout}\n{r.stderr}")
    return NATIVE


def _run_client(name):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([os.path.join(NATIVE, name)], cwd=NATIVE, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (
        f"{name} exited {r.returncode}\nstdout:\n{r.stdout}\n"
        f"stderr:\n{r.stderr[-4000:]}")
    return r.stdout


def test_capi_client_test00(native_build):
    out = _run_client("test00_client")
    assert "test00 C client OK" in out


def test_capi_client_test05(native_build):
    out = _run_client("test05_client")
    assert "test05 C client OK" in out
