"""
Shared application infrastructure: component discovery, store wiring,
and param-set round-tripping.

Every application process (planning, control) hosts a family of
interchangeable components (planners, controllers).  The pattern is
always the same: discover the concrete subclasses of a base class, give
each one a private bundle inside the app's shared store, remember which
one is active, and persist/restore per-component `params` as named
param sets on disk.  `ComponentRegistry` implements that pattern once;
the apps stay thin.

Behavioral parity targets: the registry/param logic embedded in
library/tpl/application/planning_app.py:27-125 and
library/tpl/application/control_app.py:67-89 of the reference, which
repeats it per app.
"""

import os.path as osp

from tpl_tpu import util
from tpl_tpu.util import (
    Bundle, get_subclasses_recursive, snapshot, to_snake_case)


def discover_components(base_cls, include_base=True):
    """Map snake-case names to every concrete subclass of ``base_cls``.

    Classes marked ``ABSTRACT = True`` are templates (e.g. the shared
    tracking-MPC base) and are skipped.  Insertion order is
    depth-first discovery order, with the base first — the first entry
    is the default active component.
    """

    classes = [base_cls] if include_base else []
    classes += [cls for cls in get_subclasses_recursive(base_cls)
                if not cls.__dict__.get("ABSTRACT", False)]
    return {to_snake_case(cls.__name__): cls for cls in classes}


class ComponentRegistry:
    """A named family of components living inside one shared store.

    Each component is constructed as ``cls(state_bundle, lock)`` where
    ``state_bundle`` is a store-resident bundle the component owns
    (params, debug output, warm-start state) — the store is the only
    channel to the GUI and to other processes.
    """

    def __init__(self, store, base_cls, kind, active_key, names_key,
                 include_base=True):
        self.store = store
        self.kind = kind          # "planning" | "control" → data dir
        self.active_key = active_key
        self.by_name = {}

        names = discover_components(base_cls, include_base)
        store.storage = "default"
        setattr(store, self.active_key, next(iter(names)))
        setattr(store, names_key, list(names))
        for name, cls in names.items():
            bundle = Bundle()
            # publish the component's debug-view hook with its data, so
            # any observer process can render the bundle without
            # per-component code (reference: planning_app.py:42 resolves
            # __renderer__ on the store value)
            renderer = getattr(cls, "RENDERER", None)
            if renderer:
                bundle["__renderer__"] = renderer
            setattr(store, name, bundle)
            self.by_name[name] = cls(getattr(store, name), store.lock)

    @property
    def names(self):
        return list(self.by_name)

    def active_name(self):
        """Read the active-component selector (caller holds the lock
        or tolerates a race — selection is a single attribute)."""
        with self.store.lock():
            return getattr(self.store, self.active_key)

    def get(self, name, default_name=None):
        comp = self.by_name.get(name)
        if comp is None and default_name is not None:
            comp = self.by_name.get(default_name)
        return comp

    # -- param sets ----------------------------------------------------

    def _param_dir(self, name):
        return util.resolve_data("params", osp.join(self.kind, name))

    def load_params(self, path=None):
        """Deep-merge a named param set into every component's live
        ``params`` bundle and restore the active-component selection."""
        if path is None:
            path = getattr(self.store, "storage", "default")
        if not path:
            return False
        data = util.load_state_dict(self._param_dir(path))
        if data is None:
            return False

        if self.active_key in data:
            setattr(self.store, self.active_key, data[self.active_key])
        for name, sub in data.items():
            target = getattr(self.store, name, None)
            if (isinstance(sub, dict) and "params" in sub
                    and target is not None
                    and hasattr(target, "params")):
                util.merge_into(target.params, sub["params"])
        self.store.storage = path
        return True

    def save_params(self):
        """Snapshot every component's params into the current named set."""
        out = Bundle()
        out[self.active_key] = getattr(self.store, self.active_key)
        for name in self.by_name:
            target = getattr(self.store, name, None)
            if target is not None and hasattr(target, "params"):
                out[name] = Bundle(params=snapshot(target.params))
        util.save_state_dict(
            out, osp.join(util.PATH_PARAMS, self.kind, self.store.storage))


def merge_param_set(store, kind, active_key, path):
    """Registry-free variant of :meth:`ComponentRegistry.load_params`
    for callers that only hold the store (sim scenario reload, GUI)."""
    if not path:
        return False
    data = util.load_state_dict(
        util.resolve_data("params", osp.join(kind, path)))
    if data is None:
        return False
    if active_key in data:
        setattr(store, active_key, data[active_key])
    for name, sub in data.items():
        target = getattr(store, name, None)
        if (isinstance(sub, dict) and "params" in sub
                and target is not None and hasattr(target, "params")):
            util.merge_into(target.params, sub["params"])
    store.storage = path
    return True


def save_param_set(store, kind, active_key, component_names):
    """Registry-free variant of :meth:`ComponentRegistry.save_params`."""
    out = Bundle()
    out[active_key] = getattr(store, active_key)
    for name in component_names:
        target = getattr(store, name, None)
        if target is not None and hasattr(target, "params"):
            out[name] = Bundle(params=snapshot(target.params))
    util.save_state_dict(
        out, osp.join(util.PATH_PARAMS, kind, store.storage))
