from loftr_tpu.data.scannet import ScanNetDataset
from loftr_tpu.data.megadepth import MegaDepthDataset
from loftr_tpu.data.sampler import SceneBalancedSampler
from loftr_tpu.data.loader import DataLoader, collate_matchinput
from loftr_tpu.data.sharding import get_local_split

__all__ = ["ScanNetDataset", "MegaDepthDataset", "SceneBalancedSampler",
           "DataLoader", "collate_matchinput", "get_local_split"]
