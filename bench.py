"""
Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measures (BASELINE.json metric: "MPC solves/s/chip + p99 replan latency
(RSTP, 100-step horizon)"; target >= 10k batched rollouts/s/chip):
  - batched closed-loop rollouts per second per chip (IDM sampling kernel:
    100-step Stanley+IDM rollouts with leader lookups and SAT collision
    evaluation against 12 predicted objects)
  - batched MPC tracking solves per second per chip (full AL-iLQR solves,
    vmap over scenarios)
  - single-instance RSTP replan latency p99 (lateral profile + velocity
    profile solves on a 100-step horizon, warm-started, like one
    receding-horizon tick)

vs_baseline: rollouts/s against the 10k rollouts/s/chip target.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def _probe_default_backend(timeout_s=180.0):
    """Run a trivial computation on the default jax backend in a child
    process.  Returns True if it completes; False if it crashes or hangs
    (e.g. the TPU tunnel is down), without poisoning this process's jax
    state — backend init is lazy, so the parent can still fall back to
    JAX_PLATFORMS=cpu afterwards."""
    code = ("import jax, jax.numpy as jnp;"
            "jnp.ones((2, 2)).sum().block_until_ready();"
            "print(jax.devices()[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def bench_batched_mpc(batch=2048, iters=10, horizon=60, max_iterations=8):
    """Full AL-iLQR tracking-MPC solves/s via the batch-in-lanes engine
    (tpl_tpu/optim/batched.py: batch in the TPU lane dimension — ~28%
    faster than vmap over the per-instance engine on v5e)."""
    import __graft_entry__ as ge
    from tpl_tpu.optim import batched, ilqr

    update, state, x0, params, cfg = ge._mpc_setup(
        horizon=horizon, max_iterations=max_iterations)
    prob, _spec = ge._mpc_problem()
    lupdate = batched.make_batched_update_fn(
        prob, horizon, batch, integrator=ilqr.HEUN)

    bstate = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), state)
    bx0 = (jnp.broadcast_to(x0, (batch,) + x0.shape)
           + 0.01 * jnp.arange(batch, dtype=x0.dtype)[:, None])
    xl = jnp.transpose(bstate.x, (1, 2, 0))
    ul = jnp.transpose(bstate.u, (1, 2, 0))
    laml = jnp.transpose(bstate.lam, (1, 2, 0))
    mus = jnp.zeros((batch,), jnp.int32)

    # warm up / compile
    out = lupdate(xl, ul, laml, mus, bx0.T, params, cfg)
    jax.block_until_ready(out[0])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = lupdate(xl, ul, laml, mus, bx0.T, params, cfg)
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_idm_rollouts(candidates=16384, iters=10):
    """Closed-loop rollout throughput (the BASELINE.json rollout target).

    16k candidates per dispatch: the kernel evaluates them in 1024-wide
    chunks (idm_kernel.py run()), so the 100-step sequential scan latency
    amortizes across chunks and throughput scales ~linearly with the
    candidate count up to HBM limits."""
    from tpl_tpu.planning.idm_sampling import idm_kernel
    from tpl_tpu.planning.idm_sampling.idm_kernel import IdmSamplingParams

    NR = 801
    spec = dict(steps_t=100, n_ref=NR, n_obj=12, n_pred=16, n_hull=16)
    kernel = idm_kernel.make_idm_kernel(spec)

    rl = np.zeros((NR, 7), np.float32)
    rl[:, 0] = np.arange(NR) * 0.5 - 200.0
    rl[:, 4] = 12.0
    rl[:, 5] = 4.0
    rl[:, 6] = 4.0

    objs = dict(
        pred_t=np.tile(np.arange(16, dtype=np.float32), (12, 1)),
        pred_xy=np.zeros((12, 16, 2), np.float32),
        pred_heading=np.zeros((12, 16), np.float32),
        pred_v=np.zeros((12, 16), np.float32),
        pred_dists=np.tile(np.arange(16, dtype=np.float32), (12, 1)),
        hull_preds=np.zeros((12, 16, 16, 2), np.float32),
        hull_projs=np.full((12, 16, 4), -1000.0, np.float32),
        radius_hull=np.ones(12, np.float32),
        valid=np.ones(12, bool),
        on_local_map=np.ones(12, bool))
    box = np.array([[-2, -1], [2, -1], [2, 1], [-2, 1]] * 4, np.float32)
    for i in range(12):
        objs["pred_xy"][i, :, 0] = 30.0 + 10 * i + np.arange(16) * 2.0
        objs["pred_xy"][i, :, 1] = (i % 3 - 1) * 2.5
        objs["hull_preds"][i] = objs["pred_xy"][i][:, None, :] + box[None]

    pp = IdmSamplingParams()
    pp.width_veh = 2.0
    pp.length_veh = 5.0
    pp.radius_veh = 2.7
    pp.dist_front_veh = 3.8
    pp.dist_back_veh = -1.1
    ppd = pp.dynamic_dict()

    init_ref = np.zeros(10, np.float32)
    init_ref[4] = 8.0
    init_con = np.zeros(9, np.float32)
    init_con[5] = 8.0

    C = candidates
    l_trgs = jnp.asarray(np.linspace(-3, 3, C), jnp.float32)
    d_stops = jnp.full(C, 1e6, jnp.float32)
    objs_dev = {k: jnp.asarray(v) for k, v in objs.items()}

    def call():
        return kernel(jnp.asarray(init_ref), jnp.asarray(init_con),
                      l_trgs, d_stops, jnp.float32(0.1), jnp.asarray(rl),
                      jnp.float32(0.5), objs_dev, ppd, jnp.float32(0.0))

    jax.block_until_ready(call()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call()
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    return C * iters / dt


def bench_poly_sampling(iters=200, warmup=20):
    """Per-tick latency of the poly-sampling planner's candidate
    evaluation (full Werling grid + SAT screen + argmin, one dispatch;
    poly_kernel.py), measured through the production per-tick path —
    which pins the dispatch to the host CPU backend like the other
    latency-bound solvers (poly_sampling_planner._eval_candidates_device).
    Returns (p99_ms, mean_ms)."""
    from tpl_tpu.planning.poly_sampling import poly_sampling_planner as psp

    N = 500
    path = np.zeros((N, 6))
    path[:, 0] = np.arange(N) * 0.5
    path[:, 3] = path[:, 0]
    path[:, 5] = 10.0
    start = dict(d=0.5, d_d=0.1, d_dd=0.0, s=0.0, s_d=8.0, s_dd=0.0)
    obstacles = [dict(hull=np.array(
        [[30. + 12 * i, -1.], [34. + 12 * i, -1.],
         [34. + 12 * i, 1.], [30. + 12 * i, 1.]])) for i in range(8)]
    pp = psp.PolySamplingParams()
    pp.lane_width = 3.0
    pp.v_samples = 2
    pp.rear_axis_to_rear = 1.0
    pp.rear_axis_to_front = 4.0
    pp.width_ego = 2.5

    for _ in range(warmup):
        psp._eval_candidates_device(start, path, obstacles, pp)
    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        psp._eval_candidates_device(start, path, obstacles, pp)
        lats.append(time.perf_counter() - t0)
    lats = np.array(lats) * 1e3
    return float(np.percentile(lats, 99)), float(np.mean(lats))


def bench_rstp_replan_subprocess(timeout_s=600.0):
    """Run the replan-latency bench in a fresh process, like the real
    deployment: the reference architecture runs planning as its own
    process (SURVEY §1), so the latency-critical planner never shares a
    heap with throughput workloads.  Measuring it in-process after the
    batched TPU benches inflates p99 ~2x from allocator/GC pressure that
    a deployed planner process never sees."""
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--replan-only"],
        capture_output=True, timeout=timeout_s, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            return d["p99_ms"], d["mean_ms"]
        except (json.JSONDecodeError, KeyError):
            continue
    raise RuntimeError("replan sub-bench failed:\n" + r.stderr[-2000:])


def bench_rstp_replan(iters=300, warmup=40):
    """One real receding-horizon RSTP replan tick, measured through the
    actual planner: corridor construction on host, then the fused
    single-dispatch device kernel (lateral iLQR solve -> bend/resample ->
    leader selection -> rampify -> velocity iLQR solve) with one device
    round trip per tick.  Scene: acc_2024/cv_3o (3 objects, one leader)."""
    import gc
    np.random.seed(0)
    from tpl_tpu.simulation import SimStandalone

    sim = SimStandalone(app_id="benchrstp", scenario_path="acc_2024/cv_3o")
    with sim.core.sh_state.lock():
        ss = sim.core.sh_state.sim
        ss.settings.running = True
        ss.settings.use_real_time = False

    planner = sim.planning_app.planners["path_vel_decomp_planner"]
    with planner.lock_shared():
        planner.shared.params.horizon = 100

    sh_env = sim.env_app.env
    for _ in range(warmup):
        sim.update()
    # Freeze startup objects out of generational GC scans (standard
    # practice for latency-sensitive services); GC itself stays enabled.
    gc.collect()
    gc.freeze()

    lats = []
    for _ in range(iters):
        sim.update()
        t0 = time.perf_counter()
        planner.update(sh_env)
        lats.append(time.perf_counter() - t0)
    lats = np.array(lats) * 1e3
    return float(np.percentile(lats, 99)), float(np.mean(lats))


def main():
    # latency numbers (RSTP p99) are host-dispatch sensitive; when
    # permitted, bias the bench above any background load (test sweeps,
    # builds) so recorded figures reflect the framework, not the box
    try:
        os.nice(-5)
    except (PermissionError, OSError):
        pass

    # contamination guard: latency figures are meaningless if the box is
    # busy (round-2 recorded a 4x-inflated p99 from a concurrent scenario
    # sweep) — record the pre-bench load so a dirty run is self-evident
    try:
        loadavg_1m = os.getloadavg()[0]
    except OSError:
        loadavg_1m = -1.0
    if loadavg_1m > 1.0:
        print(f"WARNING: loadavg {loadavg_1m:.2f} > 1 before bench start; "
              "latency figures will be contaminated", file=sys.stderr)

    if "--replan-only" in sys.argv:
        p99_ms, mean_ms = bench_rstp_replan()
        print(json.dumps({"p99_ms": p99_ms, "mean_ms": mean_ms}))
        return

    # If the default backend (the TPU tunnel) is dead or hung, fall back
    # to CPU so the bench still reports a result instead of hanging.
    tpu_unavailable = False
    if "JAX_PLATFORMS" not in os.environ and not _probe_default_backend():
        os.environ["JAX_PLATFORMS"] = "cpu"
        tpu_unavailable = True

    platform = jax.devices()[0].platform
    rollouts_per_s = bench_idm_rollouts()
    solves_per_s = bench_batched_mpc()
    poly_p99_ms, poly_mean_ms = bench_poly_sampling()
    try:
        p99_ms, mean_ms = bench_rstp_replan_subprocess()
    except (RuntimeError, subprocess.TimeoutExpired):
        p99_ms, mean_ms = bench_rstp_replan()

    result = {
        "metric": "batched_rollouts_per_s_per_chip",
        "value": round(rollouts_per_s, 1),
        "unit": "rollouts/s",
        # target from BASELINE.json: >=10k batched rollouts/s/chip
        "vs_baseline": round(rollouts_per_s / 10000.0, 3),
        "mpc_solves_per_s_per_chip": round(solves_per_s, 1),
        "rstp_replan_p99_ms": round(p99_ms, 2),
        "rstp_replan_mean_ms": round(mean_ms, 2),
        "poly_sampling_tick_p99_ms": round(poly_p99_ms, 2),
        "poly_sampling_tick_mean_ms": round(poly_mean_ms, 2),
        "replan_budget_ms": 20.0,
        "loadavg_1m_at_start": round(loadavg_1m, 2),
        "platform": platform,
        "device": str(jax.devices()[0]),
    }
    if loadavg_1m > 1.0:
        result["load_contaminated"] = True
    if tpu_unavailable:
        result["tpu_unavailable"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
