"""ctypes loader for the native SHT recursion kernels (_sht_native.cpp).

Compiled on demand with g++ -O3 -fopenmp into a per-machine cache dir;
falls back silently (available() -> False) when no toolchain exists.
Disable with MARIA_TPU_SHT_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import platform
import stat
import subprocess
import sys

import numpy as np

logger = logging.getLogger("maria_tpu")

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "_sht_native.cpp")
_LIB = None
_TRIED = False

# Fixed stack buffers in _sht_native.cpp bound the batch dimension.
MAX_S = 8


def _machine_tag() -> str:
    """-march=native artifacts must never be shared across hosts with
    different CPU features (SIGILL); key the .so by a machine fingerprint
    like the XLA compile cache in __graft_entry__.py."""
    try:
        with open("/proc/cpuinfo") as f:
            cpu = next((line for line in f if line.startswith("flags")), "")
    except OSError:
        cpu = platform.processor()
    return hashlib.md5((platform.machine() + cpu).encode()).hexdigest()[:8]


def _cache_dir() -> str:
    """A user-owned 0700 cache dir: a predictable world-writable /tmp path
    would let another local user pre-plant a .so that ctypes then executes."""
    cache = os.environ.get("MARIA_TPU_NATIVE_CACHE")
    if cache is None:
        base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        cache = os.path.join(base, "maria-tpu")
    os.makedirs(cache, mode=0o700, exist_ok=True)
    st = os.stat(cache)
    if st.st_uid != os.getuid():
        raise OSError(f"native cache dir {cache!r} is owned by uid {st.st_uid}, not us")
    if st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
        os.chmod(cache, 0o700)
    return cache


def _lib_path() -> str:
    src_hash = hashlib.md5(open(_SRC, "rb").read()).hexdigest()[:10]
    return os.path.join(
        _cache_dir(), f"_sht_native-{src_hash}-{_machine_tag()}.so"
    )


def _compile(path: str) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", path, _SRC,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:  # no toolchain
        logger.debug(f"native SHT compile unavailable: {e}")
        return False
    if r.returncode != 0:
        logger.warning(f"native SHT compile failed:\n{r.stderr[-2000:]}")
        return False
    return True


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MARIA_TPU_SHT_NATIVE", "1") == "0":
        return None
    try:
        path = _lib_path()
    except OSError as e:
        logger.warning(f"native SHT cache dir unusable: {e}")
        return None
    # never load a cached .so we don't own or that others can write
    # (a user-supplied MARIA_TPU_NATIVE_CACHE may predate the 0700 fix)
    if os.path.exists(path):
        st = os.stat(path)
        if st.st_uid != os.getuid() or st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
            logger.warning(f"discarding untrusted cached {path}; recompiling")
            try:
                os.unlink(path)
            except OSError:
                return None
    if not os.path.exists(path) and not _compile(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        logger.warning(f"native SHT load failed: {e}")
        return None
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    for name in ("sht_synth", "sht_anal"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            f32, f32, f32, f32, f32, i32, f32, f32, f32,
        ]
    lib.sht_native_nthreads.restype = ctypes.c_int32
    lib.sht_native_nthreads.argtypes = []
    logger.info(
        f"native SHT kernels loaded ({lib.sht_native_nthreads()} threads)."
    )
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _c32(x):
    return np.ascontiguousarray(x, dtype=np.float32)


def _tables_T(tables: dict) -> dict:
    """Transposed [m][l] recursion tables (contiguous inner l-loop).
    Memoized inside the source dict itself so the O(L^2) copies share the
    lru_cache lifetime of _host_tables and are evicted together."""
    cached = tables.get("_native_T")
    if cached is None:
        cached = {
            "alpha": _c32(tables["alpha"].T),
            "beta": _c32(tables["beta"].T),
            "gamma": _c32(tables["gamma"].T),
        }
        tables["_native_T"] = cached
    return cached


def synth(tables: dict, rows: np.ndarray) -> np.ndarray:
    """rows (S, L, L)[l, m] -> acc (S, L, nh)[m, r]."""
    lib = _load()
    S, L = rows.shape[0], rows.shape[1]
    if S > MAX_S:
        raise ValueError(f"native SHT batch {S} exceeds MAX_S={MAX_S}")
    nh = tables["seed_val"].shape[1]
    acc = np.zeros((S, L, nh), dtype=np.float32)
    t = _tables_T(tables)
    rows = _c32(np.swapaxes(rows, -1, -2))  # -> [s][m][l]
    lib.sht_synth(
        L, nh, S,
        t["alpha"], t["beta"], t["gamma"],
        _c32(tables["seed_val"]), _c32(tables["seed_exp"]),
        np.ascontiguousarray(tables["seed_step"], dtype=np.int32),
        _c32(tables["z"]), rows, acc,
    )
    return acc


def anal(tables: dict, h: np.ndarray) -> np.ndarray:
    """h (S, L, nh)[m, r] -> ys (S, L, L)[l, m]."""
    lib = _load()
    S, L = h.shape[0], h.shape[1]
    if S > MAX_S:
        raise ValueError(f"native SHT batch {S} exceeds MAX_S={MAX_S}")
    nh = h.shape[2]
    ys = np.zeros((S, L, L), dtype=np.float32)
    t = _tables_T(tables)
    lib.sht_anal(
        L, nh, S,
        t["alpha"], t["beta"], t["gamma"],
        _c32(tables["seed_val"]), _c32(tables["seed_exp"]),
        np.ascontiguousarray(tables["seed_step"], dtype=np.int32),
        _c32(tables["z"]), _c32(h), ys,
    )
    return np.swapaxes(ys, -1, -2)  # C wrote [m][l]; callers expect [l][m]
