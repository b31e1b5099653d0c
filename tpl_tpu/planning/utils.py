"""Planning helpers (rampify_profile re-export).
(reference: library/tpl/planning/utils.py)"""

from tpl_tpu.ops.profile import rampify_profile  # noqa: F401
