#!/bin/bash
# Sweep all reference scenarios closed-loop and record pass/fail +
# rule violations, like the reference's test harness runs scenarios to
# sim.finished (library/test/test_sim.py:134-145).
#
# Classification per scenario:
#   PASS [FULL ...]    ran to its manager-set finish, zero violations
#   PASS [WINDOW ...]  zero violations for the whole observed window:
#                      either the manager never sets finished (endless
#                      demo loops, capped at --max-t 120) or the wall
#                      timeout hit first (sim time reached is recorded)
#   VIOL               rule violations occurred
#   FAIL               crashed
#
# Usage: tools/scenario_sweep.sh [out.log] [wall_timeout_s]
out=${1:-/tmp/scenario_sweep.log}
wall=${2:-1500}
: > "$out"
cd "$(dirname "$0")/.."
scen_root=/root/reference/data/scenarios
for d in "$scen_root"/*/ "$scen_root"/*/*/; do
    [ -f "$d/state.json" ] || continue
    s=${d#"$scen_root"/}; s=${s%/}
    cap=""
    kind=FULL
    if ! grep -q "finished" "$d/manager.py" 2>/dev/null; then
        cap="--max-t 120"
        kind=WINDOW
    fi
    res=$(timeout "$wall" python3 -m tpl_tpu.simulation.tplsim run \
        --scenario "$s" --headless --cpu --no-reload $cap \
        --app-id "sweep-$(echo "$s" | tr / -)" 2>&1 | tail -20)
    viol=$(echo "$res" | grep -oP 'rule violations: \K\d+' | tail -1)
    if [ -n "$viol" ]; then
        # run completed (finished or max-t reached)
        fin=$(echo "$res" | grep -oP 'finished=\K\w+' | tail -1)
        simt=$(echo "$res" | grep -oP 'scenario .*: t=\K[0-9.]+' | tail -1)
        rt=$(echo "$res" | grep -oP 'mean=\K[0-9.]+' | tail -1)
        if [ "$viol" != "0" ]; then
            echo "VIOL  $s  violations=$viol  t=${simt}s finished=$fin" >> "$out"
            echo "$res" | grep SimRuleViolation | head -2 | sed 's/^/    /' >> "$out"
        else
            echo "PASS  $s  [$kind t=${simt}s finished=$fin] planner_mean_ms=$rt" >> "$out"
        fi
    else
        # wall timeout killed the run: classify from the last verbose line
        lt=$(echo "$res" | grep -oP '^t=\s*\K[0-9.]+' | tail -1)
        lv=$(echo "$res" | grep -oP 'violations=\K\d+' | tail -1)
        if [ "$lv" = "0" ] && [ -n "$lt" ]; then
            echo "PASS  $s  [WINDOW t=${lt}s wall-timeout]" >> "$out"
        elif [ -n "$lv" ]; then
            echo "VIOL  $s  violations=$lv  t=${lt}s (wall-timeout)" >> "$out"
        else
            echo "FAIL  $s  (crash)" >> "$out"
            echo "$res" | sed 's/^/    /' >> "$out"
        fi
    fi
done
echo "DONE" >> "$out"
