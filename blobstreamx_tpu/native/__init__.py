"""ctypes bindings for the native host runtime (native/bsx_sha256.c):
SHA-256, Tendermint tuple-tree roots, and the SHA-STARK trace fill — the
C equivalent of upstream's native witness generation (SURVEY.md §2.2 C9
[R]). Builds on demand with `make` (cc is in the image); every entry point
has a pure-Python fallback, so the package works without the .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libbsx.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("BSX_NO_NATIVE"):
        return None
    try:
        if not _SO.exists() and (_NATIVE_DIR / "Makefile").exists():
            subprocess.run(
                ["make", "-s", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_SO))
    except Exception:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.bsx_sha256.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.bsx_sha256_many.argtypes = [u8p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, u8p]
    lib.bsx_tuple_root.argtypes = [u64p, u8p, ctypes.c_size_t, u8p]
    lib.bsx_sha_trace_fill.argtypes = [u8p, u8p, ctypes.c_size_t, u64p, u32p, u32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def sha256(message: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from blobstreamx_tpu.golden import sha256 as gsha

        return gsha.sha256(message)
    buf = np.frombuffer(message, dtype=np.uint8) if message else np.zeros(1, np.uint8)
    out = np.zeros(32, np.uint8)
    lib.bsx_sha256(_u8(np.ascontiguousarray(buf)), len(message), _u8(out))
    return out.tobytes()


def tuple_root(heights, data_hashes: list[bytes]) -> bytes:
    """Tendermint data-commitment root over (height, data_hash) tuples."""
    lib = _load()
    if lib is None:
        from blobstreamx_tpu.golden import merkle as gmerkle

        return gmerkle.data_commitment(list(heights), data_hashes)
    h = np.ascontiguousarray(np.asarray(heights, dtype=np.uint64))
    hashes = np.frombuffer(b"".join(data_hashes), dtype=np.uint8)
    out = np.zeros(32, np.uint8)
    lib.bsx_tuple_root(
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        _u8(np.ascontiguousarray(hashes)),
        len(data_hashes),
        _u8(out),
    )
    return out.tobytes()


def sha_trace_fill(chain: tuple[bool, ...], blocks: list[bytes]):
    """Native SHA-STARK trace build; returns (trace, aux) like
    prover.sha_air.build_sha_trace, or None when the library is absent."""
    lib = _load()
    if lib is None:
        return None
    from blobstreamx_tpu.prover import sha_air

    n_blocks = len(blocks)
    blk = np.frombuffer(b"".join(blocks), dtype=np.uint8)
    ch = np.ascontiguousarray(np.array(chain, dtype=np.uint8))
    trace = np.zeros((64 * n_blocks, sha_air.N_COLS), dtype=np.uint64)
    aux_w = np.zeros(16 * n_blocks, dtype=np.uint32)
    aux_out = np.zeros(8 * n_blocks, dtype=np.uint32)
    lib.bsx_sha_trace_fill(
        _u8(np.ascontiguousarray(blk)),
        _u8(ch),
        n_blocks,
        trace.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        aux_w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        aux_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    aux = [
        (
            tuple(int(v) for v in aux_w[16 * b : 16 * b + 16]),
            tuple(int(v) for v in aux_out[8 * b : 8 * b + 8]),
        )
        for b in range(n_blocks)
    ]
    return trace, aux
