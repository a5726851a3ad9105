from .front_end import FrontEnd, FrontEndConfig
from .back_end import BackEnd, BackEndConfig, KeyFrame
from .loop_closing import LoopClosing, LoopClosingConfig, LoopPose
from .viewer import Viewer, ViewerConfig, write_pcd
from .matching import Matching, MatchingConfig

__all__ = [
    "FrontEnd",
    "FrontEndConfig",
    "BackEnd",
    "BackEndConfig",
    "KeyFrame",
    "LoopClosing",
    "LoopClosingConfig",
    "LoopPose",
    "Viewer",
    "ViewerConfig",
    "write_pcd",
    "Matching",
    "MatchingConfig",
]
