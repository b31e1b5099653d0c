"""
Interpolation primitives shared between host (numpy) and device (jax) code.

These reproduce the interpolation semantics of the reference's generated
solver runtime (reference: library/tpl/optim/templates/optim.c:332-480,
``lerp``/``lerp_angle``/``box_interp``/``blerp`` with clamped equally-spaced
indices) and the python helpers (library/tpl/util.py:70-108).

All functions are written against the array-namespace, so they work for both
``numpy`` arrays (host orchestration) and ``jax.numpy`` arrays (inside jit).
"""

import numpy as np
import jax.numpy as jnp


def _xp(*arrays):
    """Pick jnp if any argument is a jax array, else numpy."""
    for a in arrays:
        if isinstance(a, jnp.ndarray) and not isinstance(a, np.ndarray):
            return jnp
    return np


def normalize_angle(a):
    """Normalize angle(s) to (-pi, pi]. (reference: library/tpl/util.py:92-100)"""
    xp = _xp(a)
    a = xp.mod(xp.mod(a, 2 * np.pi) + 2 * np.pi, 2 * np.pi)
    return xp.where(a > np.pi, a - 2 * np.pi, a)


def short_angle_dist(a0, a1):
    """Shortest signed angular distance from a0 to a1.

    (reference: library/tpl/optim/templates/optim.c:332-338 shortAngleDist)
    """
    xp = _xp(a0, a1)
    m = 2 * np.pi
    da = xp.mod(a1 - a0, m)
    return xp.mod(2 * da, m) - da


def _interp_indices(x0, dx, x, size, xp):
    """Clamped equally-spaced interpolation indices.

    (reference: optim.c:346-355 initInterp: floor/ceil indices clamped to
    [0, size-1], alpha = clip(q - start, 0, 1))
    """
    q = (x - x0) / dx
    start = xp.clip(xp.floor(q), 0, size - 1).astype(int)
    end = xp.clip(xp.ceil(q), 0, size - 1).astype(int)
    a = xp.clip(q - start, 0.0, 1.0)
    return start, end, a


# Gathers are slow on TPU inside scans; for moderate table sizes an
# explicit hat-function / one-hot contraction maps to fused VPU ops
# instead. Semantics are identical to the clamped-index lookups.
_ONEHOT_MAX = 1024


def _onehot_take(arr, idx):
    """arr[idx] via one-hot contraction (jnp path)."""
    c = arr.shape[0]
    iota = jnp.arange(c)
    onehot = (idx[..., None] == iota).astype(arr.dtype)
    return jnp.sum(onehot * arr, axis=-1)


def lerp(x0, dx, x, arr):
    """Linear interpolation into equally spaced 1-D array `arr`.

    Matches optim.c ``lerp`` semantics: indices clamped at the boundaries,
    alpha clamped to [0, 1] (constant extrapolation).
    """
    xp = _xp(x, arr)
    arr = xp.asarray(arr)
    n = arr.shape[0]
    if xp is jnp and n <= _ONEHOT_MAX:
        # hat-function weights reproduce clamped linear interpolation
        q = jnp.clip((jnp.asarray(x) - x0) / dx, 0.0, n - 1.0)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(q[..., None] - jnp.arange(n)))
        return jnp.sum(w * arr, axis=-1)
    start, end, a = _interp_indices(x0, dx, x, n, xp)
    return (1.0 - a) * arr[start] + a * arr[end]


def lerp_angle(x0, dx, x, arr):
    """Like :func:`lerp` but interpolates along the short angular distance."""
    xp = _xp(x, arr)
    arr = xp.asarray(arr)
    n = arr.shape[0]
    start, end, a = _interp_indices(x0, dx, x, n, xp)
    if xp is jnp and n <= _ONEHOT_MAX:
        v0 = _onehot_take(arr, start)
        v1 = _onehot_take(arr, end)
        return v0 + short_angle_dist(v0, v1) * a
    return arr[start] + short_angle_dist(arr[start], arr[end]) * a


def box_interp(dx, x, arr):
    """Nearest-below (piecewise constant) lookup. (optim.c:357-369)"""
    xp = _xp(x, arr)
    arr = xp.asarray(arr)
    i = xp.clip(xp.floor(x / dx), 0, arr.shape[0] - 1).astype(int)
    if xp is jnp and arr.shape[0] <= _ONEHOT_MAX:
        return _onehot_take(arr, i)
    return arr[i]


def blerp(x0, y0, dx, dy, x, y, arr):
    """Bilinear interpolation into equally spaced 2-D array. (optim.c:452-480)"""
    xp = _xp(x, y, arr)
    arr = xp.asarray(arr)
    rows, cols = arr.shape
    xs, xe, xa = _interp_indices(x0, dx, x, cols, xp)
    ys, ye, ya = _interp_indices(y0, dy, y, rows, xp)
    p0 = (1.0 - ya) * arr[ys, xs] + ya * arr[ye, xs]
    p1 = (1.0 - ya) * arr[ys, xe] + ya * arr[ye, xe]
    return (1.0 - xa) * p0 + xa * p1


def lerp_xs(x, xs, ys, angle=False, clip_alpha=False):
    """Interpolation assuming equally spaced `xs`, vector-valued `ys`.

    (reference: library/tpl/environment/prediction_module.py:10-38)
    """
    xp = _xp(x, xs, ys)
    ys = xp.asarray(ys)
    l = ys.shape[0]
    if l == 1:
        return ys[0]
    dx = xs[1] - xs[0]
    q = (x - xs[0]) / dx
    start = xp.clip(xp.floor(q), 0, l - 2).astype(int)
    end = xp.clip(xp.ceil(q), 0, l - 1).astype(int)
    a = q - start
    if clip_alpha:
        a = xp.clip(a, 0.0, 1.0)
    if angle:
        return ys[start] + short_angle_dist(ys[start], ys[end]) * a
    if ys.ndim > 1:
        a = xp.expand_dims(a, -1) if xp.ndim(a) else a
    return ys[start] * (1.0 - a) + ys[end] * a
