"""A/B: XLA whole-tensor backward vs hand-scheduled Pallas backward for
the lat/lon DP solve, on the current default backend.

The r2 rationale for deleting the Pallas path ("the XLA schedule is
tight") was never tested; this is the test (VERDICT r4 #3).  Both
solvers are the exact production program at the production grid; the
Pallas variant swaps only the backward action-min
(tpl_tpu/planning/dyn_prog/latlon_pallas.py).  Correctness is asserted
(same value tables / trajectory), then both are timed with the
pull-forced slope protocol.

Usage: python tools/pallas_latlon_ab.py
Writes PALLAS_AB_r05.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpl_tpu.planning.dyn_prog import lat_lon_kernel as llk
from tools.roofline import _env_build_compiled, _synth_ref_line


def slope(call, sel, k_small=3, k_big=9, reps=3):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = call()
        np.asarray(sel(out))
        return time.perf_counter() - t0
    run(1)
    return float(np.median([(run(k_big) - run(k_small))
                            / (k_big - k_small) for _ in range(reps)]))


def main():
    print("device:", jax.devices()[0], flush=True)
    pp = llk.LatLonParams()
    spec = dict(t_steps=pp.t_steps, s_steps=pp.s_steps,
                ds_steps=pp.ds_steps, l_steps=pp.l_steps)

    build, bargs = _env_build_compiled()
    _occ, dist = build(*bargs)
    jax.block_until_ready(dist)
    rl = _synth_ref_line()
    x0 = np.zeros(12, np.float32)
    x0[2] = 8.0
    args = (dist, jnp.asarray(rl), jnp.float32(0.5), pp.packed(),
            jnp.asarray(x0))

    solve_x, _ = llk.make_latlon_solver(spec)
    solve_p, _ = llk.make_latlon_solver(spec, backward="pallas")

    cx = solve_x.lower(*args).compile()
    nx, tx = cx(*args)
    jax.block_until_ready(tx)
    print("xla solve ready", flush=True)
    cp = solve_p.lower(*args).compile()
    npp, tp_ = cp(*args)
    jax.block_until_ready(tp_)
    print("pallas solve ready", flush=True)

    nx, npp, tx, tp_ = map(np.asarray, (nx, npp, tx, tp_))
    cost_close = bool(np.allclose(nx[1:, ..., 0], npp[1:, ..., 0],
                                  rtol=1e-4, atol=1e-2))
    constr_close = bool(np.allclose(nx[1:, ..., 1], npp[1:, ..., 1],
                                    rtol=1e-4, atol=1e-2))
    traj_close = bool(np.allclose(tx[:, 1:3], tp_[:, 1:3], atol=1e-2))
    print("cost/constr/traj close:", cost_close, constr_close,
          traj_close, flush=True)

    wall_x = slope(lambda: cx(*args), lambda o: o[1])
    print("xla wall ms:", round(wall_x * 1e3, 2), flush=True)
    wall_p = slope(lambda: cp(*args), lambda o: o[1])
    print("pallas wall ms:", round(wall_p * 1e3, 2), flush=True)

    out = dict(
        metric="latlon_backward_pallas_ab",
        device=str(jax.devices()[0]),
        grid=spec,
        xla_wall_ms=round(wall_x * 1e3, 2),
        pallas_wall_ms=round(wall_p * 1e3, 2),
        speedup_pallas_over_xla=round(wall_x / wall_p, 3),
        results_match=dict(cost=cost_close, constr=constr_close,
                           traj=traj_close),
    )
    line = json.dumps(out)
    print(line)
    with open("PALLAS_AB_r05.json", "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
