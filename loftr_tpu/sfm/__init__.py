from loftr_tpu.sfm.lie import exp_so3, exp_se3, log_so3
from loftr_tpu.sfm.bundle_adjustment import (BAProblem, bundle_adjust,
                                             reprojection_cost)
from loftr_tpu.sfm.ate import align_umeyama, absolute_trajectory_error

__all__ = ["exp_so3", "exp_se3", "log_so3", "BAProblem", "bundle_adjust",
           "reprojection_cost", "align_umeyama",
           "absolute_trajectory_error"]
