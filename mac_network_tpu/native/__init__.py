"""Native (C++) host ops with transparent build + pure-Python fallback.

The compute path is JAX/XLA/Pallas on the TPU; the host runtime's hot
preprocessing loop (tokenize + vocab-encode ~700k CLEVR questions on a
single-core host) is implemented natively here.  On first use the
extension is compiled with g++ into the package directory; if no
toolchain is available everything falls back to the pure-Python
implementations in data/preprocess.py with identical results
(tests/test_native.py asserts equality).
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
from typing import List, Optional

_NATIVE = None
_TRIED = False


def _build_and_load():
    global _NATIVE, _TRIED
    if _TRIED:
        return _NATIVE
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    so_path = os.path.join(here, "_mac_native.so")
    src = os.path.join(here, "tokenizer.cpp")
    if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(src)):
        include = sysconfig.get_paths()["include"]
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               f"-I{include}", src, "-o", so_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location("_mac_native", so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _NATIVE = mod
    except Exception:
        _NATIVE = None
    return _NATIVE


def available() -> bool:
    return _build_and_load() is not None


def tokenize_batch(texts: List[str], kept: str = ".,;:",
                   ignored: str = "?!\\/)(") -> Optional[List[List[str]]]:
    """Native batch tokenizer (reference rules, preprocess.py:188-225);
    None when the extension is unavailable."""
    mod = _build_and_load()
    if mod is None:
        return None
    return mod.tokenize_batch(texts, kept, ignored)


def encode_batch(token_lists, sym2id, unk: int = 1):
    """Native vocab encoding with <UNK> fallback; None when unavailable."""
    mod = _build_and_load()
    if mod is None:
        return None
    return mod.encode_batch(token_lists, sym2id, unk)
