"""C ABI integration test: compile native/capi.cpp (embedded-CPython
runtime, role of reference crates/diffsol-c) + native/test_capi.c (a pure-C
consumer, role of the diffsol-c integration tests) and run the binary.

The C program builds DiffSL models, mutates settings, solves (dense,
adaptive, forward-sens), and checks trajectories against analytic / IDA
reference values -- all through the extern "C" surface only.
"""

import os
import shutil
import subprocess
import sys
import sysconfig
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_c_abi_end_to_end():
    build = os.path.join(tempfile.gettempdir(), "diffsol_tpu_capi")
    os.makedirs(build, exist_ok=True)
    so = os.path.join(build, "libdiffsol_tpu.so")
    exe = os.path.join(build, "test_capi")

    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR")
    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"

    srcs = [os.path.join(NATIVE, "capi.cpp")]
    newest_src = max(os.path.getmtime(s) for s in srcs + [
        os.path.join(NATIVE, "test_capi.c"),
        os.path.join(NATIVE, "diffsol_tpu.h"),
    ])
    if not os.path.exists(exe) or os.path.getmtime(exe) < newest_src:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so,
             os.path.join(NATIVE, "capi.cpp"), f"-I{inc}", f"-I{NATIVE}",
             f"-L{libdir}", f"-l{pyver}", f"-Wl,-rpath,{libdir}"],
            check=True, capture_output=True, text=True,
        )
        subprocess.run(
            ["gcc", "-O2", "-o", exe, os.path.join(NATIVE, "test_capi.c"),
             f"-I{NATIVE}", f"-L{build}", "-ldiffsol_tpu", "-lm",
             f"-Wl,-rpath,{build}"],
            check=True, capture_output=True, text=True,
        )

    env = dict(os.environ)
    site = sysconfig.get_path("purelib")
    # the embedded interpreter boots from the BASE prefix: hand it the repo
    # and the venv site-packages explicitly, and force the CPU backend
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, site] + [p for p in sys.path if "site-packages" in p]
    )
    env["DIFFSOL_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [exe], env=env, capture_output=True, text=True, timeout=900
    )
    assert res.returncode == 0, (
        f"capi test failed\nstdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    )
    assert "ALL CHECKS PASSED" in res.stdout
