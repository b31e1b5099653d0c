"""
File-backed shared-memory store for multi-process deployments.

The reference uses ``structstore``: a C++ shared-memory store library with
per-store process-shared mutexes (reference: library/tpl/util.py:310-333).
The equivalent here is a native C++ engine (tpl_tpu/native/shmstore.cpp):
one mmap'd file per store holding a robust process-shared pthread mutex
and double-buffered pickle payload slots (a writer crash can never tear
the readable slot; a lock holder's death is recovered via EOWNERDEAD).
``lock()`` refreshes the local mirror on entry and publishes mutations on
exit — matching the reference's snapshot-in / snapshot-out usage pattern
(all apps deepcopy under the lock anyway).

When the native engine is unavailable (no compiler, or
``TPL_TPU_SHM_ENGINE=python``), a pure-Python fallback with an fcntl file
lock provides the same semantics.  The engine choice must be uniform
across the processes sharing a store (it is, in practice: same machine,
same build cache); the fallback detects a native-layout file and raises
instead of corrupting it.
"""

import os
import mmap
import time
import pickle
import struct
import fcntl
import threading
from tpl_tpu.util import snapshot

_HEADER = struct.Struct("<QQ")  # version, payload length (python engine)
_NATIVE_MAGIC = b"TPLSHM01"


def _try_native(file_path, size):
    if os.environ.get("TPL_TPU_SHM_ENGINE", "") == "python":
        return None
    try:
        from tpl_tpu.native import NativeShm
        return NativeShm(file_path, size)
    except Exception:
        return None


class ShmStore:

    SHM_DIR = f"/tmp/tpl-tpu-shm-{os.getuid()}"

    def __init__(self, path, size=10 ** 7, reinit=False):
        os.makedirs(self.SHM_DIR, exist_ok=True)
        name = path.lstrip("/").replace("/", "_")
        self._file_path = os.path.join(self.SHM_DIR, name)
        self._size = size

        new = not os.path.exists(self._file_path)

        object.__setattr__(self, "_attrs", {})
        self._version = -1
        self._tlock = threading.RLock()
        self._lock_depth = 0

        self._native = _try_native(self._file_path, size)
        self._fd = None
        self._mm = None
        if self._native is None:
            self._fd = os.open(self._file_path,
                               os.O_RDWR | os.O_CREAT, 0o600)
            cur = os.fstat(self._fd).st_size
            if cur >= 8 and not new:
                with open(self._file_path, "rb") as f:
                    if f.read(8) == _NATIVE_MAGIC:
                        raise RuntimeError(
                            f"{self._file_path} was created by the native "
                            "shm engine; this process fell back to the "
                            "python engine (set TPL_TPU_SHM_ENGINE=python "
                            "uniformly, or remove the stale store file)")
            if cur < size + _HEADER.size:
                os.ftruncate(self._fd, size + _HEADER.size)
            self._mm = mmap.mmap(self._fd, size + _HEADER.size)

        if new or reinit:
            with self.lock():
                self._attrs.clear()

    # internal ------------------------------------------------------

    def _read_locked(self):
        if self._native is not None:
            ver = self._native.version()
            if ver != self._version:
                blob, ver = self._native.read()
                self._attrs = pickle.loads(blob) if blob else {}
                self._version = ver
            return
        version, length = _HEADER.unpack(self._mm[:_HEADER.size])
        if version != self._version and length > 0:
            try:
                self._attrs = pickle.loads(
                    self._mm[_HEADER.size:_HEADER.size + length])
            except Exception:
                self._attrs = {}
            self._version = version

    def _write_locked(self):
        blob = pickle.dumps(self._attrs, protocol=pickle.HIGHEST_PROTOCOL)
        if self._native is not None:
            self._version = self._native.write(blob)
            return
        if len(blob) > self._size:
            raise RuntimeError(
                f"shm store {self._file_path} overflow: "
                f"{len(blob)} > {self._size}")
        self._version += 1
        self._mm[_HEADER.size:_HEADER.size + len(blob)] = blob
        self._mm[:_HEADER.size] = _HEADER.pack(self._version, len(blob))

    def _acquire_file(self):
        if self._native is not None:
            self._native.lock()
        else:
            fcntl.flock(self._fd, fcntl.LOCK_EX)

    def _release_file(self):
        if self._native is not None:
            self._native.unlock()
        else:
            fcntl.flock(self._fd, fcntl.LOCK_UN)

    # public --------------------------------------------------------

    def lock(self):
        store = self

        class _Ctx:
            def __enter__(ctx):
                store._tlock.acquire()
                store._lock_depth += 1
                if store._lock_depth == 1:
                    store._acquire_file()
                    store._read_locked()
                return store

            def __exit__(ctx, *exc):
                store._lock_depth -= 1
                if store._lock_depth == 0:
                    try:
                        store._write_locked()
                    finally:
                        store._release_file()
                store._tlock.release()
                return False

        return _Ctx()

    def revalidate(self):
        with self._tlock:
            self._acquire_file()
            try:
                self._read_locked()
            finally:
                self._release_file()

    def wait_for_attr(self, name, timeout=-1.0):
        start = time.time()
        while True:
            self.revalidate()
            if name in self._attrs:
                return True
            if 0.0 <= timeout < time.time() - start:
                return False
            time.sleep(0.01)

    def deepcopy(self):
        import copy
        from tpl_tpu.util import Bundle
        with self.lock():
            return snapshot(Bundle(**self._attrs))

    def keys(self):
        return self._attrs.keys()

    def items(self):
        return self._attrs.items()

    def __contains__(self, k):
        return k in self._attrs

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return object.__getattribute__(self, "_attrs")[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            self._attrs[name] = value


class ShmObject:
    """Share a whole python object between processes (make_class_shared
    analog over the shm substrate): ``lock()`` refreshes the local object
    from shared memory on entry and publishes it on exit; methods keep
    working on the local mirror."""

    def __init__(self, obj, path, size=10 ** 7, reinit=False):
        object.__setattr__(self, "_obj", obj)
        object.__setattr__(self, "_shm", ShmStore(path, size=size,
                                                  reinit=reinit))

    def lock(self):
        shared = self

        class _Ctx:
            def __enter__(ctx):
                ctx._inner = shared._shm.lock()
                ctx._inner.__enter__()
                state = getattr(shared._shm, "state", None)
                if state is not None:
                    object.__getattribute__(shared, "_obj").__dict__ = state
                return shared

            def __exit__(ctx, *exc):
                shared._shm.state = object.__getattribute__(
                    shared, "_obj").__dict__
                return ctx._inner.__exit__(*exc)

        return _Ctx()

    def revalidate(self):
        self._shm.revalidate()
        state = getattr(self._shm, "state", None)
        if state is not None:
            object.__getattribute__(self, "_obj").__dict__ = state

    def unwrap(self):
        return object.__getattribute__(self, "_obj")

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(object.__getattribute__(self, "_obj"), name)

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            setattr(object.__getattribute__(self, "_obj"), name, value)
