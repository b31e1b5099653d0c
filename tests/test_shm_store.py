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
