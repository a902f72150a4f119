"""Native (C++) runtime components.

The HDP Gibbs sampler is the reference's one host-hot native subsystem
(OpenMP C, impl/hdp.c); here it is a C++/OpenMP shared library built on
demand with g++ and loaded through ctypes.  Everything TPU-side stays
JAX/Pallas; this package is host-only.
"""

import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _so_path(name):
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_DIR, name + suffix)


def build_library(name="hdp_gibbs", force=False):
    """Compile native/<name>.cc into a shared library next to it.  Returns
    the .so path, or None if no C++ toolchain is available."""
    src = os.path.join(_DIR, name + ".cc")
    out = _so_path(name)
    if not force and os.path.exists(out) and (
            os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", src, "-o", out]
    try:
        subprocess.check_call(cmd, stderr=subprocess.DEVNULL)
    except (OSError, subprocess.CalledProcessError):
        try:  # retry without -march=native / OpenMP for minimal toolchains
            subprocess.check_call(["g++", "-O3", "-shared", "-fPIC",
                                   "-std=c++17", src, "-o", out])
        except (OSError, subprocess.CalledProcessError):
            return None
    return out


def load_library(name="hdp_gibbs"):
    """Build (if needed) and dlopen the native library; None when
    unavailable (callers fall back to the pure-Python path)."""
    import ctypes
    path = build_library(name)
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None
