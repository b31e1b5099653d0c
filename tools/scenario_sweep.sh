#!/bin/bash
# Sweep all reference scenarios closed-loop (short window each) and record
# pass/fail + rule violations. Usage: tools/scenario_sweep.sh [out.log]
out=${1:-/tmp/scenario_sweep.log}
: > "$out"
cd "$(dirname "$0")/.."
scen_root=/root/reference/data/scenarios
for d in "$scen_root"/*/ "$scen_root"/*/*/; do
    [ -f "$d/state.json" ] || continue
    s=${d#"$scen_root"/}; s=${s%/}
    res=$(timeout 420 python3 -m tpl_tpu.simulation.tplsim run \
        --scenario "$s" --headless --max-t 12 --cpu --no-reload \
        --app-id "sweep-$(echo "$s" | tr / -)" 2>&1 | tail -4)
    viol=$(echo "$res" | grep -oP 'rule violations: \K\d+' | tail -1)
    if [ -z "$viol" ]; then
        echo "FAIL  $s  (crash/timeout)" >> "$out"
        echo "$res" | sed 's/^/    /' >> "$out"
    elif [ "$viol" != "0" ]; then
        echo "VIOL  $s  violations=$viol" >> "$out"
    else
        rt=$(echo "$res" | grep -oP 'mean=\K[0-9.]+' | tail -1)
        echo "PASS  $s  planner_mean_ms=$rt" >> "$out"
    fi
done
echo "DONE" >> "$out"
