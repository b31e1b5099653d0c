"""
Hot code reloading: live instances and imported references must pick up
edited code; broken edits must not kill the loop.
"""

import os
import sys
import textwrap

import pytest

from tpl_tpu.util.hotreload import WrappingReloader


@pytest.fixture
def live_module(tmp_path, monkeypatch):
    """A watchable throwaway module whose source we rewrite mid-test."""
    name = "hotreload_target_mod"
    path = tmp_path / f"{name}.py"
    monkeypatch.syspath_prepend(str(tmp_path))

    mtime = [100]

    def write(src):
        path.write_text(textwrap.dedent(src))
        # force a strictly increasing mtime (filesystem granularity can
        # swallow sub-ms rewrites)
        mtime[0] += 1
        os.utime(path, ns=(mtime[0] * 10 ** 9, mtime[0] * 10 ** 9))

    write("""
        VALUE = 1

        def free_fn():
            return 10

        class Planner:
            def step(self):
                return VALUE + self.offset()

            def offset(self):
                return 0
    """)
    module = __import__(name)
    yield module, write
    sys.modules.pop(name, None)


def test_instances_and_refs_update(live_module):
    module, write = live_module
    planner = module.Planner()
    free_ref = module.free_fn  # simulates `from mod import free_fn`

    reloader = WrappingReloader(planner.step, watch=(module.__name__,),
                                poll_interval=0.0, verbose=False)
    assert reloader() == 1
    assert free_ref() == 10

    write("""
        VALUE = 2

        def free_fn():
            return 20

        class Planner:
            def step(self):
                return VALUE + self.offset()

            def offset(self):
                return 100

            def brand_new(self):
                return "new"
    """)
    # the live instance, its bound method, and the imported function all
    # see the new code
    assert reloader() == 102
    assert free_ref() == 20
    assert planner.brand_new() == "new"
    # class identity is stable across the reload
    assert isinstance(planner, module.Planner)


def test_broken_edit_keeps_old_code(live_module, capsys):
    module, write = live_module
    planner = module.Planner()
    reloader = WrappingReloader(planner.step, watch=(module.__name__,),
                                poll_interval=0.0, verbose=False)
    assert reloader() == 1

    write("def broken(:\n")
    assert reloader() == 1       # old code still running
    assert module.Planner        # namespace preserved

    write("""
        VALUE = 7

        def free_fn():
            return 10

        class Planner:
            def step(self):
                return VALUE + self.offset()

            def offset(self):
                return 0
    """)
    assert reloader() == 7       # recovered after the fix


def test_wrapped_exception_is_caught(live_module, capsys):
    module, write = live_module
    planner = module.Planner()
    reloader = WrappingReloader(planner.step, watch=(module.__name__,),
                                poll_interval=0.0, verbose=False)

    write("""
        VALUE = 1

        def free_fn():
            return 10

        class Planner:
            def step(self):
                raise RuntimeError("live bug")

            def offset(self):
                return 0
    """)
    assert reloader() is None    # caught, loop survives
    assert "live bug" in capsys.readouterr().err
