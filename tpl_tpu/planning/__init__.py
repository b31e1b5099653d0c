from tpl_tpu.planning.trajectory import Trajectory
from tpl_tpu.planning.base_planner import BasePlanner
from tpl_tpu.planning.path_vel_decomp import (
    PathSmoothing,
    PathOptim,
    VelocityOptim,
    PathVelDecompPlanner,
)
from tpl_tpu.planning.dyn_prog import (
    DpEnv,
    DpEnvironment,
    DpLatLonPlanner,
    PolyLatDpLonPlanner,
    DpPolyPlanner,
    LatticePlanner,
)
from tpl_tpu.planning.idm_sampling import IdmSamplingPlanner
from tpl_tpu.planning.poly_sampling import PolySamplingPlanner
