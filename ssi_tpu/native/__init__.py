"""First-party native (C++) runtime components.

The reference offloads two host-side hot paths to native code via Rust crates:
tiktoken's BPE core and safetensors' checkpoint (de)serialization (SURVEY.md
§2.3). This package provides first-party C++ implementations of both, built
on demand with the system toolchain and bound over a plain C ABI with ctypes
(no pybind11 dependency).

Build model: all sources in ``src/`` compile into one shared library cached
under ``_build/``, keyed by a content hash of the sources and compile flags —
editing a source triggers a rebuild on next import, and stale caches are
unreachable (new hash, new filename). If no C++ toolchain is available the
callers fall back to the pure-Python/bundled paths, so the native layer is an
acceleration, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path

LOGGER = logging.getLogger(__name__)

_SRC_DIR = Path(__file__).parent / "src"
_BUILD_DIR = Path(__file__).parent / "_build"
_CXX_FLAGS = ["-O2", "-std=c++17", "-shared", "-fPIC", "-Wall"]

_lib: ctypes.CDLL | None = None
_lib_error: str | None = None


def _source_hash() -> str:
    h = hashlib.sha256()
    for path in sorted(_SRC_DIR.glob("*")):
        h.update(path.name.encode())
        h.update(path.read_bytes())
    h.update(" ".join(_CXX_FLAGS).encode())
    return h.hexdigest()[:16]


def _build_library() -> Path:
    """Compile src/*.cc into one cached .so; returns its path."""
    tag = _source_hash()
    out = _BUILD_DIR / f"libssi_native_{tag}.so"
    if out.exists():
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    sources = sorted(str(p) for p in _SRC_DIR.glob("*.cc"))
    if not sources:
        raise RuntimeError(f"no C++ sources under {_SRC_DIR}")
    # Build to a temp name then atomic-rename so concurrent importers never
    # dlopen a half-written library.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_BUILD_DIR)
    os.close(fd)
    cmd = ["g++", *_CXX_FLAGS, "-I", str(_SRC_DIR), "-o", tmp, *sources]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if proc.returncode != 0:
            raise RuntimeError(f"native build failed:\n{proc.stderr[-4000:]}")
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    LOGGER.info("built native library: %s", out)
    return out


def load_native() -> ctypes.CDLL | None:
    """Build (if needed) and dlopen the native library; None if unavailable."""
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        _lib = ctypes.CDLL(str(_build_library()))
        _bind_signatures(_lib)
    except Exception as e:  # no toolchain / build failure -> pure-Python fallback
        _lib_error = str(e)
        LOGGER.warning("native library unavailable (%s); using fallbacks", e)
        _lib = None
    return _lib


def native_error() -> str | None:
    return _lib_error


def _bind_signatures(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.st_last_error.restype = c.c_char_p
    lib.st_open.argtypes = [c.c_char_p]
    lib.st_open.restype = c.c_void_p
    lib.st_close.argtypes = [c.c_void_p]
    lib.st_n_tensors.argtypes = [c.c_void_p]
    lib.st_n_tensors.restype = c.c_int64
    lib.st_tensor_name.argtypes = [c.c_void_p, c.c_int64]
    lib.st_tensor_name.restype = c.c_char_p
    lib.st_metadata_json.argtypes = [c.c_void_p]
    lib.st_metadata_json.restype = c.c_char_p
    lib.st_tensor_info.argtypes = [
        c.c_void_p, c.c_char_p, c.c_char_p, c.POINTER(c.c_int64),
        c.POINTER(c.c_int64), c.c_int64, c.POINTER(c.POINTER(c.c_uint8)),
        c.POINTER(c.c_int64),
    ]
    lib.st_tensor_info.restype = c.c_int
    lib.st_save.argtypes = [
        c.c_char_p, c.c_int64, c.POINTER(c.c_char_p), c.POINTER(c.c_char_p),
        c.POINTER(c.c_int64), c.POINTER(c.c_int64),
        c.POINTER(c.POINTER(c.c_uint8)), c.POINTER(c.c_int64), c.c_char_p,
    ]
    lib.st_save.restype = c.c_int
