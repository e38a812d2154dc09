"""Build-and-load helper for the repo's native (C++) runtime components.

The reference leans on third-party native code for its host runtime (KenLM /
pyctcdecode C++ loaders, word_beam_search C++, sox via WavAugment); this
repo's equivalents live in ``native/*.cc`` as plain C-ABI shared libraries
(no pybind11 in the image — ctypes).  Each binding module calls
:func:`load` which compiles the source on demand with ``g++ -shared``,
caches the ``.so`` under ``native/build/``, rebuilds when the source is
newer, and returns ``None`` on any failure so callers can fall back to their
pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")

_lock = threading.Lock()
_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def source_path(src_name: str) -> str:
    return os.path.join(_NATIVE_DIR, src_name)


def _build(src: str, so: str, libs: Sequence[str]) -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # compile to a per-process temp name, then os.rename (atomic on POSIX):
    # the in-process lock doesn't cover concurrent PROCESSES (parallel eval
    # jobs, pytest workers) sharing the repo — a direct write could let one
    # dlopen a half-written library and cache the failure for its lifetime
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", tmp, src]
    cmd += [f"-l{l}" for l in libs]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if proc.returncode != 0:
            print(f"WARNING: native build of {os.path.basename(src)} failed:\n"
                  f"{proc.stderr[-1000:]}")
            return False
        os.rename(tmp, so)
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    return True


def load(src_name: str, libs: Sequence[str] = ()) -> Optional[ctypes.CDLL]:
    """Load (building if needed) ``native/<src_name>`` as a CDLL.

    Returns ``None`` when the toolchain or load fails; the result (including
    failure) is cached per source file.
    """
    src = source_path(src_name)
    so = os.path.join(_BUILD_DIR, "lib" + os.path.splitext(src_name)[0] + ".so")
    with _lock:
        if so in _cache:
            return _cache[so]
        lib: Optional[ctypes.CDLL] = None
        stale = not os.path.exists(so) or (
            os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
        )
        if not stale or _build(src, so, libs):
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                lib = None
        _cache[so] = lib
        return lib
