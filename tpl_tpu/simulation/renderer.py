"""
Headless scene renderer: the framework's observability surface.

Replaces the reference's imviz/imdash GUI (reference: library/tpl/gui/,
library/tpl/simulation/renderer.py) with matplotlib renderings of the
shared debug bundles: map boundaries, ego vehicle, traffic, planned
trajectory, planner debug data (corridors, occupancy / distance grids).
"""

import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from tpl_tpu.simulation.state import SimCar, SimEgo


def render_scene(env, sim, planners=None, ax=None, window=120.0):
    """Render the current scene around the ego; returns an RGB array."""
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(figsize=(8, 8), dpi=80)
    else:
        fig = ax.figure

    with env.lock():
        local_map = env.local_map
        if local_map is not None and local_map.path is not None:
            ax.plot(local_map.path[:, 0], local_map.path[:, 1],
                    "--", color="0.6", lw=0.8, label="ref line")
            ax.plot(local_map.boundary_left[:, 0],
                    local_map.boundary_left[:, 1], "k-", lw=1.0)
            ax.plot(local_map.boundary_right[:, 0],
                    local_map.boundary_right[:, 1], "k-", lw=1.0)

    # traffic
    for sc in sim.cars:
        hull = SimCar.get_convex_hull(sc)
        ax.fill(hull[:, 0], hull[:, 1], color="tab:orange", alpha=0.7)

    # ego
    hull = SimEgo.get_convex_hull(sim.ego)
    ax.fill(hull[:, 0], hull[:, 1], color="tab:blue", alpha=0.9,
            label="ego")

    # planned trajectory
    if planners is not None:
        with planners.lock():
            traj = getattr(planners, "trajectory", None)
        if traj is not None and len(np.atleast_1d(traj.x)) > 1:
            ax.plot(traj.x, traj.y, "g-", lw=2.0, label="plan")

    ax.set_xlim(sim.ego.x - window / 2, sim.ego.x + window / 2)
    ax.set_ylim(sim.ego.y - window / 2, sim.ego.y + window / 2)
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title(f"t = {sim.t:.2f} s   v = {sim.ego.v:.1f} m/s")

    if own_fig:
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
        plt.close(fig)
        return buf
    return None


def render_occ_map(occ_map, path=None, t_slice=0):
    """Render one time slice of the (t, s, l) occupancy grid."""
    fig, ax = plt.subplots(figsize=(10, 3), dpi=80)
    ax.imshow(np.asarray(occ_map)[t_slice].T, origin="lower",
              aspect="auto", cmap="viridis", interpolation="nearest")
    ax.set_xlabel("s index")
    ax.set_ylabel("l index")
    ax.set_title(f"occupancy, t slice {t_slice}")
    if path is not None:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        return path
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
    plt.close(fig)
    return buf


def save_frames(frames, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, frame in enumerate(frames):
        p = os.path.join(out_dir, f"frame_{i:05d}.png")
        plt.imsave(p, frame)
        paths.append(p)
    return paths
