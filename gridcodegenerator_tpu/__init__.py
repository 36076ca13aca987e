"""gridcodegenerator_tpu: a TPU-native rigid-body dynamics + trajectory
optimization framework with the capabilities of A2R-Lab/GRiDCodeGenerator.

Where the reference generates per-robot CUDA (``grid.cuh``), this framework
specializes JAX/Pallas kernels per robot at trace time and adds the
trajectory-optimization and multi-chip layers the GRiD ecosystem targets.

Quick start::

    import gridcodegenerator_tpu as gct
    grid = gct.GRiD("iiwa")
    qdd = grid.fd(q, qd, u)
    df_du = grid.fd_du(q, qd, u)
"""

from .api import GRiD, init_robot
from .models.model import RobotModel, build_model
from .models.zoo import list_robots, load_robot, robot_urdf
from .topology.robot import RobotTopology
from .topology.urdf import parse_urdf

__version__ = "0.1.0"

__all__ = [
    "GRiD",
    "RobotModel",
    "RobotTopology",
    "build_model",
    "init_robot",
    "list_robots",
    "load_robot",
    "parse_urdf",
    "robot_urdf",
    "__version__",
]
