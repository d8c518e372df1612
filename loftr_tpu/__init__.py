"""loftr_tpu: a TPU-native detector-free feature-matching + SfM framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of zju3dv/LoFTR
(reference studied at /root/reference; see SURVEY.md).  Public API mirrors the
reference's minimal surface (README.md:84-97): build a matcher from a config,
load weights, call it on an image pair, read keypoints.
"""

from loftr_tpu.config import Config, get_config, default_config
from loftr_tpu.structs import (CoarseMatches, MatchInput, MatchResult,
                               Supervision)
from loftr_tpu.models.matcher import LoFTR
from loftr_tpu.api import (match_pair, load_matcher,
                           optimize_variables)

__all__ = [
    "Config", "get_config", "default_config",
    "LoFTR", "MatchInput", "MatchResult", "CoarseMatches", "Supervision",
    "match_pair", "load_matcher", "optimize_variables",
]

__version__ = "0.1.0"
