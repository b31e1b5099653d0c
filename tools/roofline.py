"""
Roofline accounting for the flagship kernels: are they at speed-of-light
on the chip, and if not, what binds them?

Methodology
-----------
For each kernel the tool compiles the exact production program (the same
factories the planners and the bench use), then

  * takes FLOPs and "bytes accessed" from XLA's own compiled-program
    cost model (``compiled.cost_analysis()``).  FLOPs are the compiler's
    count for the optimized HLO.  "bytes accessed" counts logical
    operand/result traffic of the optimized HLO: where fusion keeps
    intermediates in VMEM/registers the true HBM traffic is lower, so
    achieved-bandwidth figures derived from it are upper bounds on real
    HBM pressure (and can exceed the HBM peak for cache/VMEM-resident
    working sets — that in itself is a finding: the kernel cycles its
    working set from on-chip memory, not HBM).
  * measures steady-state wall time per dispatch: warmup (compile +
    first run), then K back-to-back async dispatches closed by one
    ``block_until_ready`` — the deployment dispatch pattern, so device
    execution overlaps enqueue and, over a tunneled chip, the RTT
    amortizes across the pipeline.
  * derives achieved FLOP/s and bytes/s, the roofline-attainable time
    ``max(flops / peak_flops, bytes / peak_bw)``, and the fraction of
    that speed-of-light bound actually achieved.

Peaks (TPU v5e / "v5 lite", public figures):
  * MXU  : 197 TFLOP/s bf16.  None of these kernels are matmul-shaped —
    planning math is elementwise/gather DP over grids — so the MXU peak
    is reported for context, not used as the bound.
  * VPU  : ~4 TFLOP/s f32 (8x128 lanes x ~4 ALUs x ~1 GHz).  This is an
    estimate; vendor docs do not publish a VPU figure.  All kernels here
    run f32 (planning needs metric accuracy, not bf16 throughput).
  * HBM  : 819 GB/s.
CPU fallback peaks (this box, 4 cores AVX-512): ~200 GFLOP/s f32, ~25
GB/s DDR — order-of-magnitude only, used when no TPU is reachable.

Usage:  python tools/roofline.py [--out ROOFLINE.json] [--md ROOFLINE.md]
Prints one JSON line; --md renders the markdown report cited by README.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

PEAKS = {
    "tpu": dict(flops=4.0e12, hbm=8.19e11, mxu_bf16=1.97e14,
                flops_unit="VPU f32 (estimate)"),
    "cpu": dict(flops=2.0e11, hbm=2.5e10, mxu_bf16=None,
                flops_unit="4-core AVX-512 f32 (estimate)"),
}


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _time_steady(call, out_select=lambda o: o, k_small=3, k_big=10,
                 reps=2):
    """Per-dispatch steady-state time via a pull-forced two-point slope.

    On this environment's tunneled TPU, ``jax.block_until_ready`` can
    resolve BEFORE the program executes (lazy execution: work is only
    forced when data is demanded), so block-based timings measure the
    enqueue rate, not the chip (measured r4: the IDM kernel "took"
    0.1 ms with block-only timing and 14 s when actually forced).  The
    only trustworthy protocol is: enqueue K dispatches, force
    completion by pulling a result to host, and take the slope between
    two K values — the slope cancels the fixed pull/round-trip cost and
    any constant laziness overhead."""
    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = call()
        np.asarray(out_select(out))           # force execution + pull
        return time.perf_counter() - t0
    run(1)                                    # warm: compile + first exec
    # sub-ms kernels need enough dispatches for the slope to clear
    # tunnel jitter; escalate K until the median slope is positive
    for scale in (1, 4, 16):
        ks, kb = k_small * scale, k_big * scale
        slopes = []
        for _ in range(reps):
            t_small = run(ks)
            t_big = run(kb)
            slopes.append((t_big - t_small) / (kb - ks))
        slope = float(np.median(slopes))
        if slope > 0:
            return slope
    raise RuntimeError(
        f"non-positive dispatch slope at K up to {kb}: wall noise "
        "exceeds the kernel's per-dispatch time; measure on a quieter "
        "link")


def kernel_mpc(batch=2048, horizon=60):
    """Lanes-batched AL-iLQR tracking MPC (tpl_tpu/optim/batched.py)."""
    import bench
    lupdate, args = bench._mpc_batched_setup(batch=batch, horizon=horizon)
    compiled = lupdate.lower(*args).compile()
    flops, bytes_ = _cost(compiled)
    # time the AOT-compiled executable itself: one compile per kernel
    # (a second jit compile while the first executable runs has been
    # observed to fault the tunneled TPU worker, lat_lon_kernel.py:756)
    wall = _time_steady(lambda: compiled(*args), lambda o: o[3],
                        k_small=2, k_big=6)
    return dict(name="mpc_batched_al_ilqr",
                work_items=batch, work_unit="solves",
                note="sequential lax.scan over horizon x AL iterations; "
                     "batch lives in the lane dim, so every tiny 7x2 "
                     "Riccati op is a 2048-wide VPU op",
                flops=flops, bytes=bytes_, wall_s=wall)


def kernel_idm(candidates=16384):
    """IDM sampling rollouts (tpl_tpu/planning/idm_sampling)."""
    import bench
    kernel, args = bench._idm_setup(candidates)
    compiled = kernel.lower(*args).compile()
    flops, bytes_ = _cost(compiled)
    wall = _time_steady(lambda: compiled(*args), lambda o: o[0],
                        k_small=1, k_big=3)
    return dict(name="idm_rollouts",
                work_items=candidates, work_unit="rollouts",
                note="100-step closed-loop scan; leader lookup gathers + "
                     "SAT collision tests, vmapped over candidates",
                flops=flops, bytes=bytes_, wall_s=wall)


def _synth_ref_line(n=401, step=0.5):
    rl = np.zeros((n, 8), np.float32)
    rl[:, 0] = np.arange(n) * step        # straight road along x
    rl[:, 4] = 12.0                       # v_max channel
    rl[:, 5] = rl[:, 6] = 4.0             # corridor half-widths
    return rl


def _env_build_compiled(quads=256):
    """Compile the DP env grid build on synthetic (but driver-shaped)
    inputs; returns (compiled, args)."""
    from tpl_tpu.planning.dyn_prog import dp_environment as dpe
    from tpl_tpu.planning.dyn_prog.lat_lon_kernel import LatLonParams
    pp = LatLonParams()
    rng = np.random.default_rng(0)
    rl = _synth_ref_line()
    centers = rng.uniform(0, 200, (quads, 1, 2)).astype(np.float32)
    box = np.array([[-2, -1], [2, -1], [2, 1], [-2, 1]], np.float32)
    q = jnp.asarray(centers + box[None])
    tbit = jnp.asarray(rng.integers(0, pp.t_steps, quads), jnp.int32)
    stat = jnp.asarray(np.zeros(quads, bool))
    valid = jnp.asarray(np.ones(quads, bool))
    args = (jnp.asarray(rl), jnp.float32(0.5), q, tbit, stat, valid,
            jnp.float32(1.7), jnp.float32(0.0), jnp.float32(1.0),
            jnp.float32(-5.0), jnp.float32(0.5))
    kw = dict(t_steps=pp.t_steps, s_steps=pp.s_steps, l_steps=pp.l_steps)
    return dpe._build_grids.lower(*args, **kw).compile(), args


def kernel_env_build(quads=256):
    """DP environment grid build: quad rasterization + distance scans
    (tpl_tpu/planning/dyn_prog/dp_environment.py)."""
    compiled, args = _env_build_compiled(quads)
    flops, bytes_ = _cost(compiled)
    wall = _time_steady(lambda: compiled(*args), lambda o: o[1],
                        k_small=5, k_big=15)
    return dict(name="dp_env_grid_build",
                work_items=quads, work_unit="quads",
                note="point-in-dilated-quad rasterization into (T,S,L) + "
                     "forward/backward distance scans",
                flops=flops, bytes=bytes_, wall_s=wall)


def kernel_latlon_solve():
    """Lat/lon DP backward+forward solve
    (tpl_tpu/planning/dyn_prog/lat_lon_kernel.py), fed with a distance
    grid actually produced by the env build — random garbage distance
    values have been observed to fault the tunneled TPU worker."""
    from tpl_tpu.planning.dyn_prog import lat_lon_kernel as llk
    pp = llk.LatLonParams()
    spec = dict(t_steps=pp.t_steps, s_steps=pp.s_steps,
                ds_steps=pp.ds_steps, l_steps=pp.l_steps)
    solve, _reeval = llk.make_latlon_solver(spec)

    build, bargs = _env_build_compiled()
    _occ, dist = build(*bargs)
    jax.block_until_ready(dist)

    rl = _synth_ref_line()
    x0 = np.zeros(12, np.float32)
    x0[2] = 8.0
    args = (dist, jnp.asarray(rl), jnp.float32(0.5), pp.packed(),
            jnp.asarray(x0))
    compiled = solve.lower(*args).compile()
    flops, bytes_ = _cost(compiled)
    wall = _time_steady(lambda: compiled(*args), lambda o: o[1],
                        k_small=5, k_big=15)
    return dict(name="latlon_dp_solve",
                work_items=1, work_unit="solves",
                note="(T,S,DS,L) value grid, 7x7 action samples per "
                     "node via structured shifted-row gathers; "
                     "gather-dominated, zero matmuls",
                flops=flops, bytes=bytes_, wall_s=wall)


def derive(entry, peaks):
    f, b, w = entry["flops"], entry["bytes"], entry["wall_s"]
    entry["wall_ms"] = round(w * 1e3, 3)
    entry["achieved_gflops"] = round(f / w / 1e9, 1)
    entry["achieved_gbps"] = round(b / w / 1e9, 1)
    entry["intensity_flops_per_byte"] = round(f / max(b, 1.0), 3)
    t_compute = f / peaks["flops"]
    t_memory = b / peaks["hbm"]
    entry["bound"] = "memory" if t_memory > t_compute else "compute"
    attainable = max(t_compute, t_memory)
    entry["attainable_ms"] = round(attainable * 1e3, 3)
    entry["pct_of_roofline"] = round(100.0 * attainable / w, 1)
    entry["pct_of_peak_flops"] = round(100.0 * f / w / peaks["flops"], 1)
    entry["pct_of_peak_hbm"] = round(100.0 * b / w / peaks["hbm"], 1)
    per_item = entry["work_items"] / w
    entry["items_per_s"] = round(per_item, 1)
    return entry


def render_md(data):
    lines = [
        "# Roofline: flagship kernels vs the chip",
        "",
        "*Generated by `tools/roofline.py`; machine-derived from XLA's "
        "compiled-program cost model (`compiled.cost_analysis()`) plus "
        "steady-state wall timings on "
        f"`{data['device']}`.  Artifact: `ROOFLINE.json`.*",
        "",
        "## Method",
        "",
        "FLOPs and bytes are the compiler's counts for the optimized "
        "HLO of the exact production programs (same factories the "
        "planners and `bench.py` call).  \"Bytes accessed\" counts "
        "logical operand traffic: fusion keeps intermediates in VMEM, "
        "so the derived bandwidth is an *upper bound* on true HBM "
        "traffic — a kernel \"exceeding\" HBM peak is cycling its "
        "working set on-chip.  Attainable time is the classic roofline "
        "bound `max(flops/peak_flops, bytes/peak_bw)`; `% of roofline` "
        "is attainable/achieved wall.",
        "",
        f"Peaks used ({data['platform']}): "
        f"{data['peaks']['flops'] / 1e12:.1f} TFLOP/s "
        f"[{data['peaks']['flops_unit']}], "
        f"{data['peaks']['hbm'] / 1e9:.0f} GB/s HBM"
        + (f", {data['peaks']['mxu_bf16'] / 1e12:.0f} TFLOP/s MXU bf16 "
           "(context only — planning kernels are elementwise/gather DP, "
           "not matmul-shaped, so the MXU is idle by design)"
           if data['peaks'].get('mxu_bf16') else "") + ".",
        "",
        "## Kernels",
        "",
        "| kernel | wall/dispatch | work | GFLOP/s | GB/s (bound) | "
        "intensity | bound by | % of roofline |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for e in data["kernels"]:
        lines.append(
            f"| {e['name']} | {e['wall_ms']} ms | "
            f"{e['work_items']} {e['work_unit']} | "
            f"{e['achieved_gflops']} | {e['achieved_gbps']} | "
            f"{e['intensity_flops_per_byte']} | {e['bound']} | "
            f"{e['pct_of_roofline']}% |")
    lines += ["", "## Reading"]
    for e in data["kernels"]:
        lines += ["", f"**{e['name']}** — {e['note']}.  "
                      f"{e['pct_of_peak_flops']}% of peak FLOP/s, "
                      f"{e['pct_of_peak_hbm']}% of peak HBM; roofline "
                      f"classifies it {e['bound']}-bound with "
                      f"attainable {e['attainable_ms']} ms vs achieved "
                      f"{e['wall_ms']} ms ({e['pct_of_roofline']}% of "
                      "speed-of-light)."]
    fl = data.get("floors") or {}
    if fl:
        lines += ["", "## Serialization floors & variance", ""]
        for key_ in ("idm_floor", "mpc_floor"):
            f = fl.get(key_)
            if not f:
                continue
            axis = "steps" if "steps" in f else "horizons"
            lines += [
                f"**{f['name']}** — wall vs {axis} {f[axis]}: "
                f"{f['wall_ms']} ms → per-step "
                f"{f['per_step_ms']} ms, intercept "
                f"{f['intercept_ms']} ms; wall vs batch {f['batch']}: "
                f"{f['batch_wall_ms']} ms.  Measured floor (smallest "
                f"batch at full steps): {f['floor_ms']} ms — a scan "
                "cannot beat its per-step serialization even at "
                "infinite bandwidth, so the floor-adjusted attainable "
                "in the kernel table uses it.", ""]
        f = fl.get("latlon_floor")
        if f:
            lines += [
                f"**{f['name']}** — wall vs t_steps {f['t_steps']}: "
                f"{f['wall_ms']} ms → per-slice "
                f"{f['per_slice_ms']} ms, intercept "
                f"{f['intercept_ms']} ms (forward pass + fixed "
                "overhead).  The backward pass is 10 sequential "
                "slices; the per-slice marginal cost is the structural "
                "unit to optimize.", ""]
        f = fl.get("gather_rate")
        if f:
            lines += [
                f"**gather-unit rate** — random take_along_axis of "
                f"{f['elements']} f32 elements: {f['wall_ms']} ms → "
                f"{f['elements_per_ms']:.0f} elements/ms.  {f['note']}.",
                ""]
        v = fl.get("idm_variance")
        if v:
            lines += [
                f"**idm dispatch variance** — {len(v['runs_ms'])} "
                f"independent measurements: {v['runs_ms']} ms "
                f"(median {v['median_ms']}, min {v['min_ms']}, max "
                f"{v['max_ms']}); median throughput "
                f"{v['rollouts_per_s_median']} rollouts/s (max "
                f"{v['rollouts_per_s_max']}).  This distribution is "
                "the reconciliation of earlier bench-vs-roofline "
                "rollouts/s spreads: the tunneled chip's dispatch "
                "time varies run to run, so the headline quotes the "
                "median with this spread attached.", ""]

    lines += [
        "",
        "## Honest caveats",
        "",
        "- The VPU f32 peak is an estimate (no published vendor "
        "figure); %-of-peak-FLOPs scales accordingly.",
        "- Wall times over THIS environment's shared tunneled chip "
        "vary up to ~2.5x run-to-run (the IDM kernel measured 256, "
        "596 and 644 ms/dispatch across three quiet-box runs; "
        "`bench.py`'s committed forced rate corresponds to 212 ms). "
        "Treat %-of-roofline as a lower bound and cross-read "
        "throughput against BENCH_r04.json.",
        "- Planning-scale tensors (MBs, not GBs) fit in VMEM/caches: "
        "logical bytes overstate HBM traffic, so %-of-roofline is "
        "conservative (true attainable time is often lower-bounded by "
        "the sequential scan structure, not memory).",
        "- The MPC and IDM kernels are sequential scans over the "
        "horizon: per-dispatch latency has an irreducible "
        "serialization floor of steps x per-step launch; throughput "
        "comes from the batch dimension, which is why the bench "
        "reports solves/s and rollouts/s at production batch sizes.",
        "",
    ]
    return "\n".join(lines)


KERNELS = {
    "idm": kernel_idm,
    "mpc": kernel_mpc,
    "latlon_solve": kernel_latlon_solve,
    "env_build": kernel_env_build,
}


# ---------------------------------------------------------------------
# Serialization floors: the scan kernels' per-dispatch latency is
# bounded below by (sequential steps) x (per-step time) — a structural
# floor the naive roofline bound ignores.  Measure wall vs step-count
# and wall vs batch to quantify it (VERDICT r4 #4): the marginal
# per-step slope b and intercept a of wall(steps) = a + b*steps give
# the floor; if wall barely moves with batch, the kernel is
# step-latency-bound and batching is (correctly) free throughput.
# ---------------------------------------------------------------------

def _fit_line(xs, ys):
    b, a = np.polyfit(np.asarray(xs, float), np.asarray(ys, float), 1)
    return float(a), float(b)


def floor_idm():
    """Wall vs steps_t and vs candidate count for the IDM rollout scan."""
    import bench
    from tpl_tpu.planning.idm_sampling import idm_kernel

    _kernel, args = bench._idm_setup(16384)
    steps = [25, 50, 100]
    walls = []
    for st in steps:
        spec = dict(steps_t=st, n_ref=801, n_obj=12, n_pred=16, n_hull=16)
        k = idm_kernel.make_idm_kernel(spec)
        compiled = k.lower(*args).compile()
        walls.append(_time_steady(lambda: compiled(*args),
                                  lambda o: o[2]["cost"],
                                  k_small=1, k_big=3))
    a, b = _fit_line(steps, walls)

    batches = [1024, 4096, 16384]
    bwalls = []
    for c in batches:
        k2, args2 = bench._idm_setup(c)
        compiled = k2.lower(*args2).compile()
        bwalls.append(_time_steady(lambda: compiled(*args2),
                                   lambda o: o[2]["cost"],
                                   k_small=1, k_big=3))
    return dict(
        name="idm_rollouts",
        steps=steps, wall_ms=[round(w * 1e3, 2) for w in walls],
        intercept_ms=round(a * 1e3, 2),
        per_step_ms=round(b * 1e3, 3),
        batch=batches, batch_wall_ms=[round(w * 1e3, 2) for w in bwalls],
        # the scan cannot finish faster than its smallest-batch wall at
        # the full step count: that wall is the measured serialization
        # floor, independent of how much lane-parallel work rides along
        floor_ms=round(bwalls[0] * 1e3, 2),
    )


def floor_mpc():
    """Wall vs horizon for the lanes-batched AL-iLQR scan."""
    import bench
    horizons = [15, 30, 60]
    walls = []
    for h in horizons:
        lupdate, args = bench._mpc_batched_setup(batch=2048, horizon=h)
        compiled = lupdate.lower(*args).compile()
        walls.append(_time_steady(lambda: compiled(*args), lambda o: o[3],
                                  k_small=2, k_big=6))
    a, b = _fit_line(horizons, walls)
    batches = [256, 2048]
    bwalls = []
    for c in batches:
        lupdate, args = bench._mpc_batched_setup(batch=c, horizon=60)
        compiled = lupdate.lower(*args).compile()
        bwalls.append(_time_steady(lambda: compiled(*args), lambda o: o[3],
                                   k_small=2, k_big=6))
    return dict(
        name="mpc_batched_al_ilqr",
        horizons=horizons, wall_ms=[round(w * 1e3, 2) for w in walls],
        intercept_ms=round(a * 1e3, 2),
        per_step_ms=round(b * 1e3, 3),
        batch=batches, batch_wall_ms=[round(w * 1e3, 2) for w in bwalls],
        floor_ms=round(bwalls[0] * 1e3, 2),
    )


def floor_latlon():
    """Wall vs t_steps for the lat/lon DP solve: the committed per-slice
    floor (VERDICT r4 #3 'prove the floor' leg)."""
    from tpl_tpu.planning.dyn_prog import lat_lon_kernel as llk
    pp = llk.LatLonParams()
    build, bargs = _env_build_compiled()
    _occ, dist = build(*bargs)
    jax.block_until_ready(dist)
    rl = _synth_ref_line()
    x0 = np.zeros(12, np.float32)
    x0[2] = 8.0

    t_counts = [4, 7, 10]
    walls = []
    for T in t_counts:
        spec = dict(t_steps=T, s_steps=pp.s_steps,
                    ds_steps=pp.ds_steps, l_steps=pp.l_steps)
        solve, _ = llk.make_latlon_solver(spec)
        ppT = llk.LatLonParams()
        ppT.t_steps = T
        args = (dist[:, :, :, :], jnp.asarray(rl), jnp.float32(0.5),
                ppT.packed(), jnp.asarray(x0))
        # dist has 10 slices; the solver only indexes t_idx <= T-1, and
        # its clip keeps smaller-T programs in range
        compiled = solve.lower(*args).compile()
        walls.append(_time_steady(lambda: compiled(*args), lambda o: o[1],
                                  k_small=3, k_big=9))
    a, b = _fit_line(t_counts, walls)
    return dict(
        name="latlon_dp_solve",
        t_steps=t_counts, wall_ms=[round(w * 1e3, 2) for w in walls],
        intercept_ms=round(a * 1e3, 2),
        per_slice_ms=round(b * 1e3, 3),
    )


def idm_variance(runs=5):
    """Dispatch-time distribution of the IDM kernel over independent
    measurements (VERDICT r4 #4: reconcile the bench-vs-roofline
    rollouts/s spread with a distribution, not a point)."""
    import bench
    kernel, args = bench._idm_setup(16384)
    compiled = kernel.lower(*args).compile()
    walls = []
    for _ in range(runs):
        walls.append(_time_steady(lambda: compiled(*args),
                                  lambda o: o[2]["cost"],
                                  k_small=1, k_big=3))
    ms = [round(w * 1e3, 2) for w in walls]
    return dict(runs_ms=ms, median_ms=round(float(np.median(ms)), 2),
                min_ms=min(ms), max_ms=max(ms),
                rollouts_per_s_median=round(16384 / np.median(walls), 1),
                rollouts_per_s_max=round(16384 / min(walls), 1))


def floor_gather():
    """Raw gather-unit throughput of the chip: elements/ms for a random
    take_along_axis at DP-kernel-like shapes.  Both DP kernels' backward
    passes are bound by this rate, not HBM bandwidth — three gather
    layout variants of the lon lookup (middle-axis take, row-contiguous
    take, MXU one-hot contraction) landed within noise of each other
    (lon_kernel.py:243), so the per-slice floor is structural."""
    rng = np.random.default_rng(0)
    rows, cols = 8192, 1024
    src = jnp.asarray(rng.uniform(size=(rows, cols)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, rows, (rows, cols)), jnp.int32)

    @jax.jit
    def g(src, idx):
        return jnp.take_along_axis(src, idx, axis=0)

    compiled = g.lower(src, idx).compile()
    wall = _time_steady(lambda: compiled(src, idx), lambda o: o[0, 0],
                        k_small=2, k_big=6)
    n = rows * cols
    return dict(elements=n, wall_ms=round(wall * 1e3, 2),
                elements_per_ms=round(n / (wall * 1e3), 0),
                note="fully-random take_along_axis over a (8192, 1024) "
                     "f32 array — the WORST-case gather rate (~0.34 "
                     "GB/s, ~2400x below HBM peak). The DP kernels' "
                     "structured takes (shared row indices, contiguous "
                     "moves) run orders of magnitude above this, which "
                     "is exactly why the backward passes were rewritten "
                     "as shifted-row/contraction lookups; their "
                     "residual per-slice cost is the structured-move "
                     "schedule, not this worst case")


FLOORS = {
    "idm_floor": floor_idm,
    "mpc_floor": floor_mpc,
    "latlon_floor": floor_latlon,
    "idm_variance": idm_variance,
    "gather_rate": floor_gather,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--md", default=None)
    ap.add_argument("--kernel", default=None, choices=sorted(KERNELS),
                    help="measure ONE kernel and print its raw JSON "
                         "(used by the orchestrating parent)")
    ap.add_argument("--floor", default=None, choices=sorted(FLOORS),
                    help="measure ONE floor/variance probe and print "
                         "its raw JSON (used by the orchestrating "
                         "parent)")
    ap.add_argument("--no-floors", action="store_true",
                    help="skip the serialization-floor/variance probes")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    key = "tpu" if platform == "tpu" else "cpu"
    peaks = PEAKS[key]

    if args.kernel:
        print(json.dumps(KERNELS[args.kernel]()))
        return
    if args.floor:
        print(json.dumps(FLOORS[args.floor]()))
        return

    # one subprocess per kernel: a faulted TPU worker (observed when
    # several large programs compile/execute in one process over the
    # tunnel, cf. lat_lon_kernel.py:756) then costs one kernel's row,
    # not the whole report
    import subprocess
    kernels = []
    for name in KERNELS:
        print(f"# {name} ...", file=sys.stderr, flush=True)
        r, row = None, None
        # two attempts: a faulted worker restarts between subprocesses,
        # and the fault is intermittent (tunnel-timing dependent)
        for attempt in range(2):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--kernel", name],
                    capture_output=True, text=True, timeout=1500)
                line = [ln for ln in r.stdout.strip().splitlines()
                        if ln.startswith("{")][-1]
                row = derive(json.loads(line), peaks)
                break
            except (subprocess.TimeoutExpired, IndexError,
                    json.JSONDecodeError) as e:
                print(f"# {name} attempt {attempt + 1} FAILED: {e!r}; "
                      "stderr:\n"
                      + (r.stderr[-1500:] if r is not None else ""),
                      file=sys.stderr, flush=True)
        if row is None:
            continue
        kernels.append(row)
        print(f"# {name} done: {kernels[-1]['wall_ms']} ms",
              file=sys.stderr, flush=True)

    floors = {}
    if not args.no_floors:
        for name in FLOORS:
            print(f"# {name} ...", file=sys.stderr, flush=True)
            r = None
            for attempt in range(2):
                try:
                    r = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--floor", name],
                        capture_output=True, text=True, timeout=1500)
                    line = [ln for ln in r.stdout.strip().splitlines()
                            if ln.startswith("{")][-1]
                    floors[name] = json.loads(line)
                    break
                except (subprocess.TimeoutExpired, IndexError,
                        json.JSONDecodeError) as e:
                    print(f"# {name} attempt {attempt + 1} FAILED: "
                          f"{e!r}; stderr:\n"
                          + (r.stderr[-1500:] if r is not None else ""),
                          file=sys.stderr, flush=True)

    # floor-adjusted attainable: a scan kernel cannot beat its measured
    # serialization floor even at infinite bandwidth
    for row in kernels:
        fl = floors.get({"idm_rollouts": "idm_floor",
                         "mpc_batched_al_ilqr": "mpc_floor"}.get(
                             row["name"], ""), None)
        if fl and "floor_ms" in fl:
            adj = max(row["attainable_ms"], fl["floor_ms"])
            row["floor_adjusted_attainable_ms"] = round(adj, 2)
            row["pct_of_floor_adjusted"] = round(
                100.0 * adj / row["wall_ms"], 1)

    data = dict(metric="roofline", platform=key,
                device=str(jax.devices()[0]), peaks=peaks,
                kernels=kernels, floors=floors)
    line = json.dumps(data)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    if args.md:
        with open(args.md, "w") as f:
            f.write(render_md(data))
        print(f"wrote {args.md}", file=sys.stderr)


if __name__ == "__main__":
    main()
