"""Shared ctypes build-and-load scaffolding for the native libraries
(native/*.cpp): source/library path discovery, mtime-based g++ rebuild,
one-shot caching.  Keeps the rebuild policy in ONE place for maskops
(utils/native.py) and imageops (utils/native_image.py)."""

import ctypes
import os
import subprocess
from typing import Callable, Optional, Sequence

_NATIVE_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "native",
)


class NativeLib:
    """Lazily builds (g++) and loads one shared library; ``get()``
    returns the CDLL with argtypes registered, or None when the source,
    toolchain, or a link dependency is unavailable (callers fall back
    to their numpy/PIL paths)."""

    def __init__(
        self,
        src_name: str,
        lib_name: str,
        extra_flags: Sequence[str] = (),
        register: Optional[Callable[[ctypes.CDLL], None]] = None,
    ):
        self.src = os.path.join(_NATIVE_DIR, src_name)
        self.lib_path = os.path.join(_NATIVE_DIR, lib_name)
        self.extra_flags = list(extra_flags)
        self.register = register
        self._lib: Optional[ctypes.CDLL] = None
        self._tried = False

    def _build(self) -> bool:
        try:
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC",
                    "-o", self.lib_path, self.src, *self.extra_flags,
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except Exception:
            return False

    def get(self) -> Optional[ctypes.CDLL]:
        if self._lib is not None or self._tried:
            return self._lib
        self._tried = True
        stale = not os.path.exists(self.lib_path) or (
            os.path.exists(self.src)
            and os.path.getmtime(self.src) > os.path.getmtime(self.lib_path)
        )
        if stale and (not os.path.exists(self.src) or not self._build()):
            return None
        try:
            lib = ctypes.CDLL(self.lib_path)
            if self.register is not None:
                self.register(lib)
            self._lib = lib
        except OSError:
            self._lib = None
        return self._lib
