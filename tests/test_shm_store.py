"""Shared-memory store substrate: cross-process semantics."""

import os
import uuid
import multiprocessing as mp

import numpy as np

from tpl_tpu.util.shm_store import ShmStore, ShmObject


def _child_writer(path):
    store = ShmStore(path)
    with store.lock():
        store.reply = {"arr": np.arange(5.0), "msg": "hello"}


def test_shm_store_cross_process():
    path = f"/test_{uuid.uuid4().hex[:8]}"
    store = ShmStore(path, reinit=True)
    with store.lock():
        store.request = 42

    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_child_writer, args=(path,))
    p.start()
    p.join(30)
    assert p.exitcode == 0

    assert store.wait_for_attr("reply", timeout=5.0)
    with store.lock():
        assert store.request == 42
        np.testing.assert_array_equal(store.reply["arr"], np.arange(5.0))
        assert store.reply["msg"] == "hello"


class _Payload:

    def __init__(self):
        self.t = 0.0
        self.values = np.zeros(3)

    def bump(self):
        self.t += 1.0
        self.values = self.values + 1.0


def _child_bumper(path):
    obj = ShmObject(_Payload(), path)
    with obj.lock():
        obj.unwrap().bump()


def test_shm_object_cross_process():
    path = f"/test_obj_{uuid.uuid4().hex[:8]}"
    obj = ShmObject(_Payload(), path, reinit=True)
    with obj.lock():
        obj.t = 5.0

    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_child_bumper, args=(path,))
    p.start()
    p.join(30)
    assert p.exitcode == 0

    with obj.lock():
        assert obj.t == 6.0
        np.testing.assert_array_equal(obj.values, np.ones(3))


def test_shm_store_lock_reentrant():
    path = f"/test_re_{uuid.uuid4().hex[:8]}"
    store = ShmStore(path, reinit=True)
    with store.lock():
        store.a = 1
        with store.lock():
            store.b = 2
    store.revalidate()
    assert store.a == 1 and store.b == 2


def _child_counter(path, iters):
    store = ShmStore(path)
    for _ in range(iters):
        with store.lock():
            store.counter = store.counter + 1


def test_shm_store_mutual_exclusion():
    """N processes x M increments under the store lock lose no update."""
    path = f"/test_mx_{uuid.uuid4().hex[:8]}"
    store = ShmStore(path, reinit=True)
    with store.lock():
        store.counter = 0

    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_child_counter, args=(path, 50))
             for _ in range(4)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
        assert p.exitcode == 0
    store.revalidate()
    assert store.counter == 200


def _child_die_holding_lock(path):
    store = ShmStore(path)
    ctx = store.lock()
    ctx.__enter__()
    store._attrs["held"] = True
    os._exit(1)  # dies while holding the store lock


def test_shm_store_dead_owner_recovery():
    """A lock holder's death must not deadlock the store, and the last
    complete write must survive (native engine: robust mutex EOWNERDEAD
    + double-buffered slots; python engine: flock auto-release)."""
    path = f"/test_dead_{uuid.uuid4().hex[:8]}"
    store = ShmStore(path, reinit=True)
    with store.lock():
        store.safe = "committed"

    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_child_die_holding_lock, args=(path,))
    p.start()
    p.join(30)
    assert p.exitcode == 1

    store.revalidate()  # must not hang
    assert store.safe == "committed"
    with store.lock():
        store.after = 1
    store.revalidate()
    assert store.after == 1


def _child_python_engine(path):
    os.environ["TPL_TPU_SHM_ENGINE"] = "python"
    import importlib
    import tpl_tpu.util.shm_store as mod
    importlib.reload(mod)
    store = mod.ShmStore(path)
    assert store._native is None
    with store.lock():
        store.fallback_reply = 7


def test_shm_store_python_engine_fallback():
    """The pure-python engine keeps working (and stays interoperable
    python<->python) when the native engine is disabled."""
    path = f"/test_py_{uuid.uuid4().hex[:8]}"
    env = os.environ.get("TPL_TPU_SHM_ENGINE")
    os.environ["TPL_TPU_SHM_ENGINE"] = "python"
    try:
        store = ShmStore(path, reinit=True)
        assert store._native is None
        with store.lock():
            store.request = 1
        ctx = mp.get_context("spawn")
        p = ctx.Process(target=_child_python_engine, args=(path,))
        p.start()
        p.join(30)
        assert p.exitcode == 0
        assert store.wait_for_attr("fallback_reply", timeout=5.0)
        with store.lock():
            assert store.fallback_reply == 7
    finally:
        if env is None:
            os.environ.pop("TPL_TPU_SHM_ENGINE", None)
        else:
            os.environ["TPL_TPU_SHM_ENGINE"] = env


def test_shm_store_native_engine_active():
    """On this image (g++ baked in) the native engine must actually be
    the one in use — the python path is a fallback, not the default."""
    if os.environ.get("TPL_TPU_SHM_ENGINE") == "python":
        import pytest
        pytest.skip("python engine forced")
    store = ShmStore(f"/test_nat_{uuid.uuid4().hex[:8]}", reinit=True)
    assert store._native is not None
