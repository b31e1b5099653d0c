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


def _time_steady(call, out_select=lambda o: o, warmup=3, k=20, reps=3):
    """Median over ``reps`` of (K async dispatches + one final block)."""
    for _ in range(warmup):
        jax.block_until_ready(out_select(call()))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = call()
        jax.block_until_ready(out_select(out))
        times.append((time.perf_counter() - t0) / k)
    return float(np.median(times))


def kernel_mpc(batch=2048, horizon=60):
    """Lanes-batched AL-iLQR tracking MPC (tpl_tpu/optim/batched.py)."""
    import bench
    lupdate, args = bench._mpc_batched_setup(batch=batch, horizon=horizon)
    compiled = lupdate.lower(*args).compile()
    flops, bytes_ = _cost(compiled)
    wall = _time_steady(lambda: lupdate(*args), lambda o: o[0], k=10)
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
    wall = _time_steady(lambda: kernel(*args), lambda o: o[0], k=10)
    return dict(name="idm_rollouts",
                work_items=candidates, work_unit="rollouts",
                note="100-step closed-loop scan; leader lookup gathers + "
                     "SAT collision tests, vmapped over candidates",
                flops=flops, bytes=bytes_, wall_s=wall)


def kernel_latlon_solve():
    """Lat/lon DP backward+forward solve
    (tpl_tpu/planning/dyn_prog/lat_lon_kernel.py)."""
    from tpl_tpu.planning.dyn_prog import lat_lon_kernel as llk
    pp = llk.LatLonParams()
    spec = dict(t_steps=pp.t_steps, s_steps=pp.s_steps,
                ds_steps=pp.ds_steps, l_steps=pp.l_steps)
    solve, _reeval = llk.make_latlon_solver(spec)
    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.uniform(
        0, 200, (pp.t_steps, pp.s_steps, pp.l_steps, 2)).astype(np.float32))
    rl = np.zeros((401, 8), np.float32)
    rl[:, 0] = np.arange(401) * 0.5
    rl[:, 4] = 12.0
    rl[:, 5] = rl[:, 6] = 4.0
    x0 = np.zeros(12, np.float32)
    x0[2] = 8.0
    args = (dist, jnp.asarray(rl), jnp.float32(0.5), pp.packed(),
            jnp.asarray(x0))
    compiled = solve.lower(*args).compile()
    flops, bytes_ = _cost(compiled)
    wall = _time_steady(lambda: solve(*args), lambda o: o[1], k=20)
    return dict(name="latlon_dp_solve",
                work_items=1, work_unit="solves",
                note="(T,S,DS,L) value grid, 7x7 action samples per "
                     "node via structured shifted-row gathers; "
                     "gather-dominated, zero matmuls",
                flops=flops, bytes=bytes_, wall_s=wall)


def kernel_env_build(quads=256):
    """DP environment grid build: quad rasterization + distance scans
    (tpl_tpu/planning/dyn_prog/dp_environment.py)."""
    from tpl_tpu.planning.dyn_prog import dp_environment as dpe
    from tpl_tpu.planning.dyn_prog.lat_lon_kernel import LatLonParams
    pp = LatLonParams()
    rng = np.random.default_rng(0)
    rl = np.zeros((401, 8), np.float32)
    rl[:, 0] = np.arange(401) * 0.5
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
    compiled = dpe._build_grids.lower(*args, **kw).compile()
    flops, bytes_ = _cost(compiled)
    wall = _time_steady(lambda: dpe._build_grids(*args, **kw),
                        lambda o: o[1], k=20)
    return dict(name="dp_env_grid_build",
                work_items=quads, work_unit="quads",
                note="point-in-dilated-quad rasterization into (T,S,L) + "
                     "forward/backward distance scans",
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
    lines += [
        "",
        "## Honest caveats",
        "",
        "- The VPU f32 peak is an estimate (no published vendor "
        "figure); %-of-peak-FLOPs scales accordingly.",
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--md", default=None)
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    key = "tpu" if platform == "tpu" else "cpu"
    peaks = PEAKS[key]

    kernels = [kernel_idm(), kernel_mpc(), kernel_latlon_solve(),
               kernel_env_build()]
    kernels = [derive(k, peaks) for k in kernels]

    data = dict(metric="roofline", platform=key,
                device=str(jax.devices()[0]), peaks=peaks,
                kernels=kernels)
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
