"""
Multi-seed analysis of the fas_2025/jungingen_right known-fail.

The scenario randomizes its 5 merge/crossing cars at load time
(manager.py: positions +-20 m in x AND y, target speeds 5-15 m/s, ego
start speed 5-10 m/s).  Under some seeds a merge-path car materializes
close behind the slowly accelerating ego with a closing speed its own
IDM brake cap (b = 3 m/s^2) cannot absorb — a kinematically unavoidable
rear-end that no planner output changes, and which the reference cannot
react to either: its prediction module drops tracks behind the ego
(reference: library/tpl/environment/prediction_module.py:137-169, ported
for parity).

This tool makes that claim reproducible: it runs seeds 0..N-1 to the
scenario's finish (t > 30 s) or first rule violation, and for every
collision reconstructs the kinematics — was the collider behind the ego,
what were gap and closing speed when it first came within reaction
range, and what deceleration would have been required vs the traffic
model's brake cap.  Output: one JSON artifact (JUNGINGEN_r<N>.json).

Usage: python tools/jungingen_analysis.py [--seeds 10] [--out FILE]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

SCENARIO = "fas_2025/jungingen_right"
SIGHT_GAP = 25.0          # "first sight" range for the reaction analysis
CAR_HALF = 2.0            # car length/2 (SimCar default length 4.0)
EGO_HALF = 2.5            # ego center-to-bumper approx


def run_seed(seed, planner=None, max_t=35.0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tpl_tpu.simulation import SimStandalone
    from tpl_tpu.util import snapshot

    np.random.seed(seed)
    sim = SimStandalone(app_id=f"jung{seed}", scenario_path=SCENARIO)
    with sim.core.sh_state.lock():
        ss = sim.core.sh_state.sim
        ss.settings.running = True
        ss.settings.use_real_time = False
        ss.settings.reload_if_finished = False
        ss.rule_checker.enable = True
    if planner and planner != "default":
        with sim.planning_app.sh_planners.lock():
            known = sim.planning_app.sh_planners.planner_names
            if planner not in known:
                raise SystemExit(
                    f"unknown planner {planner!r}; known: {known} "
                    "(use 'default' or omit --planner for the "
                    "scenario default)")
            sim.planning_app.sh_planners.active_planner = planner

    hist = []
    while True:
        sim.update()
        with sim.core.sh_state.lock():
            s = snapshot(sim.core.sh_state.sim)
        hist.append(dict(
            t=s.t, ego=(s.ego.x, s.ego.y, s.ego.yaw, s.ego.v),
            cars=[(c.uuid, c.x, c.y, c.yaw, c.v) for c in s.cars]))
        if s.rule_checker.violations or s.finished or s.t >= max_t:
            break

    out = dict(seed=seed, t_end=round(s.t, 2),
               finished=bool(s.finished),
               violations=len(s.rule_checker.violations))
    if not s.rule_checker.violations:
        out["outcome"] = "PASS"
        return out

    v0 = s.rule_checker.violations[0]
    out["outcome"] = "VIOLATION"
    out["kind"] = v0.KIND_NAMES[v0.kind]
    out["t_violation"] = round(v0.t, 2)
    out["msg"] = v0.msg
    if v0.kind != v0.COLLISION or "collides with" not in v0.msg:
        return out

    uuid = v0.msg.split("collides with ")[-1].strip()
    out.update(_collision_kinematics(hist, uuid))
    return out


def _collision_kinematics(hist, uuid):
    """Reconstruct the colliding car's approach: bumper gap and closing
    speed when it first entered SIGHT_GAP, the deceleration required
    from that point, and whether it approached from behind the ego."""
    last = hist[-1]
    ex, ey, eyaw, _ = last["ego"]
    car_last = next((c for c in last["cars"] if c[0] == uuid), None)
    if car_last is None:
        return {"analysis": "collider not found in sim cars"}
    rel = np.array([car_last[1] - ex, car_last[2] - ey])
    along = rel @ np.array([np.cos(eyaw), np.sin(eyaw)])
    from_behind = bool(along < 0.0)

    first_sight = None
    for frame in hist:
        car = next((c for c in frame["cars"] if c[0] == uuid), None)
        if car is None:
            continue
        gap = (np.hypot(car[1] - frame["ego"][0], car[2] - frame["ego"][1])
               - CAR_HALF - EGO_HALF)
        closing = car[4] - frame["ego"][3]
        if gap <= SIGHT_GAP and first_sight is None:
            first_sight = dict(
                t=round(frame["t"], 2), gap_m=round(float(gap), 2),
                v_car=round(float(car[4]), 2),
                v_ego=round(float(frame["ego"][3]), 2),
                closing_mps=round(float(closing), 2))
    res = dict(collider=uuid, from_behind=from_behind,
               idm_brake_cap=3.0)
    if first_sight:
        res["first_sight"] = first_sight
        gap, closing = first_sight["gap_m"], first_sight["closing_mps"]
        if gap > 0 and closing > 0:
            res["required_decel"] = round(closing ** 2 / (2.0 * gap), 2)
            res["avoidable_by_traffic"] = bool(
                res["required_decel"] <= res["idm_brake_cap"])
    return res


def run_planner(planner, seeds):
    results = []
    for seed in range(seeds):
        r = run_seed(seed, planner=planner)
        print(json.dumps(r), flush=True)
        results.append(r)

    passes = [r["seed"] for r in results if r["outcome"] == "PASS"]
    fails = [r for r in results if r["outcome"] != "PASS"]
    unavoidable = [r["seed"] for r in fails
                   if r.get("from_behind")
                   and not r.get("avoidable_by_traffic", True)]
    return dict(
        scenario=SCENARIO,
        planner=planner or "default",
        seeds=seeds,
        passed=passes,
        failed=[r["seed"] for r in fails],
        rear_end_unavoidable=unavoidable,
        note="rear_end_unavoidable = collider approached from behind the "
             "ego and needed more deceleration than its own IDM brake "
             "cap from first sight; the reference's prediction module "
             "drops rear tracks (prediction_module.py:137-169, ported "
             "for parity), so no planner in either framework sees these",
        results=results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--planner", action="append", default=None,
                    help="planner to analyze; repeat the flag to cover "
                         "several planner families in one artifact")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    summaries = [run_planner(p, args.seeds)
                 for p in (args.planner or [None])]
    # single-planner runs keep the round-3 artifact schema; multi-planner
    # runs wrap the per-planner summaries in a "runs" list
    out = summaries[0] if len(summaries) == 1 else dict(
        scenario=SCENARIO, seeds=args.seeds,
        planners=[s["planner"] for s in summaries], runs=summaries)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")
    else:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
