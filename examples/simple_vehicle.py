"""
Simple vehicle trajectory optimization example.

The solver-core analog of the reference's genopt demo (reference:
library/tpl/optim/examples/simple_vehicle/main.py): define a kinematic
bicycle problem as plain JAX functions, solve a receding-horizon tracking
task, print the result (plots saved when matplotlib is available).

Run: python examples/simple_vehicle.py          (headless solve)
     python examples/simple_vehicle.py --gui    (interactive browser view)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np
import jax.numpy as jnp

from tpl_tpu.optim.ilqr import Problem
from tpl_tpu.optim.solver import Solver
from tpl_tpu.optim.problems import ArraySpec
from tpl_tpu.ops.interp import lerp


def make_problem():
    # states: x, y, phi, v; actions: acc, steer
    def dynamics(x, u, t, dt, p):
        px, py, phi, v = x
        acc, steer = u
        return jnp.stack([
            v * jnp.cos(phi),
            v * jnp.sin(phi),
            v * jnp.tan(steer) / p["wheel_base"],
            acc,
        ])

    def cost(x, u, t, dt, p):
        s = t * dt * p["v_ref"]      # rough progress-based reference index
        x_ref = lerp(0.0, p["ref_step"], s, p["ref_x"])
        y_ref = lerp(0.0, p["ref_step"], s, p["ref_y"])
        c = p["w_pos"] * ((x[0] - x_ref) ** 2 + (x[1] - y_ref) ** 2)
        c += p["w_v"] * (x[3] - p["v_ref"]) ** 2
        c += p["w_u"] * (u[0] ** 2 + u[1] ** 2)
        return c

    prob = Problem("simple_vehicle", nx=4, nu=2, nc=0,
                   dynamics=dynamics, cost=cost)
    spec = dict(wheel_base=2.7, v_ref=8.0, w_pos=1.0, w_v=0.2, w_u=0.1,
                ref_x=ArraySpec(256), ref_y=ArraySpec(256), ref_step=0.5)
    return prob, spec


def make_solver():
    prob, spec = make_problem()
    opt = Solver(prob, spec, horizon_max=80)
    opt.horizon = 80
    opt.step = 0.1
    opt.max_iterations = 30
    opt.u_min[:, 0] = -3.0
    opt.u_max[:, 0] = 2.0
    opt.u_min[:, 1] = -0.5
    opt.u_max[:, 1] = 0.5

    ss = np.arange(256) * 0.5
    opt.params.ref_x = ss
    opt.params.ref_y = 4.0 * np.sin(ss * 0.08)
    opt.x[0] = [0.0, 2.0, 0.0, 5.0]
    return opt


def vehicle_scene(opt):
    """Reference line + optimized path + ego marker for the
    interactive view (``--gui``)."""
    ref = np.column_stack([np.asarray(opt.params.ref_x),
                           np.asarray(opt.params.ref_y)])
    return [
        {"kind": "line", "xy": ref[:120].tolist(), "color": "#888"},
        {"kind": "line",
         "xy": np.asarray(opt.x[:, :2]).tolist(), "color": "#ec5",
         "size": 2},
        {"kind": "points", "xy": [np.asarray(opt.x[0, :2]).tolist()],
         "color": "#6ac", "size": 5},
    ]


def serve_gui(port=8025):
    """Interactive browser view of the tracking problem — tweak
    weights / target speed live, toggle receding-horizon simulation
    (the imviz-example analog, see tpl_tpu/gui/optim_view.py)."""
    from tpl_tpu.gui.optim_view import OptimView
    OptimView(make_solver(), scene=vehicle_scene,
              title="simple_vehicle", port=port).serve_forever()


def main():
    opt = make_solver()
    opt.update()

    print(f"solved in {opt.runtime:.1f} ms, cost {opt.traj_costs:.2f}")
    print("final state:", np.round(opt.x[-1], 2))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.plot(ss, 4.0 * np.sin(ss * 0.08), "--", label="reference")
        ax.plot(opt.x[:, 0], opt.x[:, 1], "-", label="optimized")
        ax.legend()
        ax.set_aspect("equal")
        fig.savefig("/tmp/simple_vehicle.png", bbox_inches="tight")
        print("plot: /tmp/simple_vehicle.png")
    except Exception:
        pass


if __name__ == "__main__":
    if "--gui" in sys.argv:
        serve_gui()
    else:
        main()
