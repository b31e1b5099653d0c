"""Per-stage pull-forced slope timing of the fused poly_lat_dp_lon
chain on the current default backend (TPU over the tunnel, or CPU).

Usage: python tools/poly_chain_probe.py
Prints one line per stage; used to attribute the replan latency between
the env build, lateral stage, longitudinal stage and the tunnel RTT.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpl_tpu.planning.dyn_prog import dp_environment as dpe
from tpl_tpu.planning.dyn_prog.dp_environment import (
    DpEnvironment, DpEnvParams,
)
from tpl_tpu.planning.dyn_prog import lon_kernel as lk
from tpl_tpu.planning.dyn_prog import poly_chain_kernel as pck
from tpl_tpu.planning.dyn_prog.poly_lat_kernel import (
    PolyLatParams, pack_env_pp,
)


def log(*a):
    print(*a, flush=True)


def slope(call, sel, k_small=1, k_big=4, reps=3):
    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = call()
        np.asarray(sel(out))
        return time.perf_counter() - t0
    run(1)
    return float(np.median([(run(k_big) - run(k_small))
                            / (k_big - k_small)
                            for _ in range(reps)])) * 1e3


def main():
    log("device:", jax.devices()[0])
    env = DpEnvironment()
    p = DpEnvParams()
    env.reinit_buffers(p)
    rl = np.zeros((401, 9))
    rl[:, 0] = np.arange(401) * 0.5
    rl[:, 3] = rl[:, 0]
    rl[:, 5] = 10.0
    rl[:, 6] = 4.0
    rl[:, 7] = 4.0
    env.set_ref_line(rl, 0.5)
    quad = np.array([[58., -6.], [62., -6.], [62., 6.], [58., 6.]])
    env.insert_geometry([(quad, t) for t in np.arange(10.0)],
                        stationary=True)
    env.update()
    jax.block_until_ready(env.grid.occ_map)
    log("env ready")

    cpp_lat = PolyLatParams()
    cpp_lon = lk.LonParams()
    spec = dict(s_steps=cpp_lat.s_steps, l_dst_steps=cpp_lat.l_dst_steps,
                s_dst_steps=cpp_lat.s_dst_steps, t_steps_env=p.t_steps,
                s_steps_env=p.s_steps, l_steps_env=p.l_steps,
                t_steps=cpp_lon.t_steps, s_steps_lon=cpp_lon.s_steps,
                v_steps=cpp_lon.v_steps, a_steps=cpp_lon.a_steps,
                path_steps=cpp_lon.path_steps)
    lat_stage, lon_stage = pck.make_poly_chain(spec)

    start_vec = jnp.asarray([0., 0., 0., 0., 8.], jnp.float32)
    old_pts = jnp.zeros((pck.KEEP_CAP, 12), jnp.float32)
    env_scalars = jnp.asarray([p.s_min, p.s_step_size, p.l_min,
                               p.l_step_size], jnp.float32)
    x0 = np.zeros(7, np.float32)
    x0[lk.LC_V] = 8.0
    x0j = jnp.asarray(x0)
    prev = jnp.asarray([-100.0, 0.0], jnp.float32)

    occ = env.grid.occ_map
    rlg = env.grid.ref_line
    rstep = jnp.float32(env.ref_step)
    ppl = jnp.asarray(cpp_lat.packed())
    epp = jnp.asarray(pack_env_pp(p))
    ppn = jnp.asarray(cpp_lon.packed())

    einp = env.device_inputs()

    def envb():
        return dpe._build_grids(*einp, p.t_steps, p.s_steps, p.l_steps)

    log("env build per-dispatch ms:",
        round(slope(envb, lambda o: o[0][0, 0, 0]), 1))

    def lat():
        return lat_stage(occ, rlg, rstep, ppl, epp, ppn, start_vec,
                         old_pts, jnp.int32(0))

    log("lat stage per-dispatch ms:",
        round(slope(lat, lambda o: o[2][0, 0]), 1))
    path_d = lat()[2]
    jax.block_until_ready(path_d)

    def lon():
        return lon_stage(occ, path_d, env_scalars, ppn, x0j, prev)

    log("lon stage per-dispatch ms:",
        round(slope(lon, lambda o: o[0][0, 0]), 1))

    tiny = jnp.zeros(4)
    jax.block_until_ready(tiny)
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(tiny + 1.0)
    log("tiny dispatch+pull roundtrip ms:",
        round((time.perf_counter() - t0) / 10 * 1e3, 1))


if __name__ == "__main__":
    main()
