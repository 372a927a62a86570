"""Native (C++) binarized-dataset IO: v2 flat format + ctypes bindings.

v2 on-disk layout (written by the binarizer *alongside* the reference-
compatible pickle format, so both readers always work):

- ``<prefix>.bin``: concatenated records, each
  ``[int32 n_frames][int32 n_mels][int32 wav_len][int32 reserved]``
  followed by the mel as row-major float32 (n_frames, n_mels) and the
  waveform as float16 (wav_len == n_frames * hop).
- ``<prefix>.bidx``: ``int64 n_items`` then ``n_items + 1`` int64 offsets.

The C++ library (fastdiff_tpu/native/indexed_io.cpp) mmaps ``.bin`` and
serves threaded batch crops straight into caller-allocated numpy buffers —
no pickle, no GIL, no per-item Python. ``NativeBatchLoader`` is used by the
training pipeline when the library builds and the v2 files exist; otherwise
everything falls back to the pure-Python path transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_LIB_TRIED = False

_HEADER_DTYPE = np.dtype([("n_frames", "<i4"), ("n_mels", "<i4"),
                          ("wav_len", "<i4"), ("reserved", "<i4")])


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "native")


def build_library(force: bool = False) -> Optional[str]:
    """Compile indexed_io.cpp to a shared library (cached)."""
    src = os.path.join(_native_dir(), "indexed_io.cpp")
    out = os.path.join(_native_dir(), "libfastdiff_io.so")
    if os.path.exists(out) and not force and \
            os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        print(f"| native io build failed ({exc}); using Python data path")
        return None


def get_library():
    """Load (building if needed) the native library, or None."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fd_open.restype = ctypes.c_void_p
    lib.fd_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.fd_num_items.restype = ctypes.c_int64
    lib.fd_num_items.argtypes = [ctypes.c_void_p]
    lib.fd_item_frames.restype = ctypes.c_int32
    lib.fd_item_frames.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.fd_item_wav_len.restype = ctypes.c_int32
    lib.fd_item_wav_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.fd_item_n_mels.restype = ctypes.c_int32
    lib.fd_item_n_mels.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.fd_batch_crop.restype = ctypes.c_int32
    lib.fd_batch_crop.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.fd_read_item.restype = ctypes.c_int32
    lib.fd_read_item.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.fd_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


# ---------------------------------------------------------------------------
# v2 writer (used by the binarizer)
# ---------------------------------------------------------------------------

class NativeDatasetBuilder:
    def __init__(self, prefix: str):
        self.prefix = prefix
        self.bin_file = open(f"{prefix}.bin", "wb")
        self.offsets = [0]

    def add_item(self, mel: np.ndarray, wav: np.ndarray) -> None:
        """mel (T, n_mels) float32; wav (T*hop,) float16."""
        mel = np.ascontiguousarray(mel, dtype=np.float32)
        wav = np.ascontiguousarray(wav, dtype=np.float16)
        header = np.zeros((), dtype=_HEADER_DTYPE)
        header["n_frames"] = mel.shape[0]
        header["n_mels"] = mel.shape[1]
        header["wav_len"] = wav.shape[0]
        written = self.bin_file.write(header.tobytes())
        written += self.bin_file.write(mel.tobytes())
        written += self.bin_file.write(wav.tobytes())
        self.offsets.append(self.offsets[-1] + written)

    def finalize(self) -> None:
        self.bin_file.close()
        with open(f"{self.prefix}.bidx", "wb") as f:
            f.write(np.asarray([len(self.offsets) - 1], np.int64).tobytes())
            f.write(np.asarray(self.offsets, np.int64).tobytes())


# ---------------------------------------------------------------------------
# Reader / batch loader
# ---------------------------------------------------------------------------

class NativeBatchLoader:
    """Threaded native crop-collate over a v2 dataset.

    ``load(items, starts, max_frames, hop, n_mels)`` returns the same batch
    dict as ``fastdiff_tpu.data.dataset.crop_batch``.
    """

    def __init__(self, prefix: str):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native io library unavailable")
        if not (os.path.exists(f"{prefix}.bin") and os.path.exists(f"{prefix}.bidx")):
            raise FileNotFoundError(f"no v2 dataset at {prefix}.bin/.bidx")
        self.lib = lib
        self.handle = lib.fd_open(f"{prefix}.bin".encode(),
                                  f"{prefix}.bidx".encode())
        if not self.handle:
            raise RuntimeError(f"fd_open failed for {prefix}")

    def __len__(self) -> int:
        return int(self.lib.fd_num_items(self.handle))

    def item_frames(self, i: int) -> int:
        return int(self.lib.fd_item_frames(self.handle, i))

    def load(self, items, starts, max_frames: int, hop: int,
             n_mels: int) -> dict:
        items = np.ascontiguousarray(items, dtype=np.int64)
        starts = np.ascontiguousarray(starts, dtype=np.int64)
        batch = len(items)
        mels = np.empty((batch, max_frames, n_mels), np.float32)
        wavs = np.empty((batch, max_frames * hop), np.float32)
        rc = self.lib.fd_batch_crop(self.handle, items, starts, batch,
                                    max_frames, hop, n_mels, mels, wavs)
        if rc != 0:
            raise RuntimeError(f"fd_batch_crop failed with {rc}")
        return {"mels": mels, "wavs": wavs[..., None]}

    def read_item(self, i: int) -> dict:
        frames = self.item_frames(i)
        wav_len = int(self.lib.fd_item_wav_len(self.handle, i))
        n_mels = int(self.lib.fd_item_n_mels(self.handle, i))
        mel = np.empty((frames, n_mels), np.float32)
        wav = np.empty((wav_len,), np.float32)
        rc = self.lib.fd_read_item(self.handle, i, mel, wav)
        if rc != 0:
            raise RuntimeError(f"fd_read_item failed with {rc}")
        return {"mel": mel, "wav": wav}

    def close(self):
        if self.handle:
            self.lib.fd_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
