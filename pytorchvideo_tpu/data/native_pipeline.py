"""Threaded native decode pipeline (C++ worker pool) binding.

The host-side "decode service" of SURVEY §2.9: clip requests fan out to a
C++ thread pool (native/pipeline.cc) that decodes + rescales via FFmpeg
(native/decode.cc) into staging buffers entirely off the GIL; completed
clips come back in completion order. This replaces the reference's
decode-in-DataLoader-worker-processes design (PyAV under torch
multiprocessing) with threads + one shared address space, which composes
with ``data.loader.device_prefetch`` for the host->HBM double buffer.

Usage::

    with NativeDecodePipeline(num_threads=8) as pipe:
        for i, (path, s, e) in enumerate(requests):
            pipe.submit(i, path, s, e, out_h=182, out_w=242)
        for _ in range(len(requests)):
            req_id, frames = pipe.wait()     # (T, H, W, 3) uint8 or None

Requires ``make -C native``; ``is_available()`` reports the state.
"""

from __future__ import annotations

import ctypes
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

from pytorchvideo_tpu.data.encoded_video_native import load_native_library

_PIPE_BOUND = False


def _bind(lib):
    global _PIPE_BOUND
    if _PIPE_BOUND or lib is None:
        return lib
    lib.pvtp_create.restype = ctypes.c_void_p
    lib.pvtp_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.pvtp_submit.restype = ctypes.c_int
    lib.pvtp_submit.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.pvtp_wait.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.pvtp_wait.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.pvtp_outstanding.restype = ctypes.c_int64
    lib.pvtp_outstanding.argtypes = [ctypes.c_void_p]
    lib.pvtp_release.restype = None
    lib.pvtp_release.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.pvtp_destroy.restype = None
    lib.pvtp_destroy.argtypes = [ctypes.c_void_p]
    _PIPE_BOUND = True
    return lib


def is_available() -> bool:
    return load_native_library() is not None


class NativeDecodePipeline:
    """Worker-pool clip decoder. Not thread-safe on the Python side by
    design — submit/wait from one coordinator thread (the C++ side is the
    concurrent part)."""

    def __init__(self, num_threads: int = 4, capacity: int = 16):
        self._lib = _bind(load_native_library())
        if self._lib is None:
            raise RuntimeError(
                "libpvt_decode.so not available; build with `make -C native`"
            )
        self._handle = self._lib.pvtp_create(num_threads, capacity)
        if not self._handle:
            raise RuntimeError("pvtp_create failed")

    def submit(
        self,
        req_id: int,
        path: str,
        start_frame: int,
        end_frame: int,
        out_h: int = 0,
        out_w: int = 0,
    ) -> None:
        """Queue a clip decode of frames [start_frame, end_frame), rescaled
        to (out_h, out_w) when nonzero. Blocks while the queue is full."""
        rc = self._lib.pvtp_submit(
            self._handle,
            req_id,
            path.encode(),
            start_frame,
            end_frame,
            out_h,
            out_w,
        )
        if rc != 0:
            raise RuntimeError("pipeline is shut down")

    def wait(self) -> Tuple[int, Optional[np.ndarray]]:
        """Block for the next completed request; returns (req_id, clip)
        with clip (T, H, W, 3) uint8, or (req_id, None) on decode failure.
        Blocks forever if nothing is outstanding — pair submits and waits
        (or check ``outstanding()``)."""
        req_id = ctypes.c_uint64()
        frames = ctypes.c_int64()
        h = ctypes.c_int()
        w = ctypes.c_int()
        buf = self._lib.pvtp_wait(
            self._handle,
            ctypes.byref(req_id),
            ctypes.byref(frames),
            ctypes.byref(h),
            ctypes.byref(w),
        )
        if not buf or frames.value < 0:
            return int(req_id.value), None
        n = frames.value * h.value * w.value * 3
        arr = np.ctypeslib.as_array(buf, shape=(n,))
        out = (
            arr.reshape(frames.value, h.value, w.value, 3).copy()
        )
        self._lib.pvtp_release(self._handle, buf)
        return int(req_id.value), out

    def outstanding(self) -> int:
        return int(self._lib.pvtp_outstanding(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.pvtp_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def iter_decoded_clips(
    requests: Iterable[Tuple[str, int, int]],
    num_threads: int = 4,
    capacity: int = 16,
    out_h: int = 0,
    out_w: int = 0,
) -> Iterator[Tuple[int, Optional[np.ndarray]]]:
    """Stream (index, clip) over ``requests`` = iterable of
    (path, start_frame, end_frame), keeping the worker pool saturated with
    at most ``capacity`` clips in flight. Results arrive in completion
    order (index identifies the request)."""
    with NativeDecodePipeline(num_threads, capacity) as pipe:
        it = enumerate(iter(requests))
        in_flight = 0
        done = False
        while True:
            while not done and in_flight < capacity:
                try:
                    i, (path, s, e) = next(it)
                except StopIteration:
                    done = True
                    break
                pipe.submit(i, path, s, e, out_h, out_w)
                in_flight += 1
            if in_flight == 0:
                return
            yield pipe.wait()
            in_flight -= 1
