from .feature_extraction import FeatureExtractionConfig, extract_features, ScanFeatures
from .odometry import AloamOdometry, AloamOdometryConfig
from .mapping import AloamMapping, AloamMappingConfig
from .pipeline import AloamPipeline, AloamState, aloam_drive, aloam_step, init_aloam_state

__all__ = [
    "FeatureExtractionConfig",
    "extract_features",
    "ScanFeatures",
    "AloamOdometry",
    "AloamOdometryConfig",
    "AloamMapping",
    "AloamMappingConfig",
    "AloamPipeline",
    "AloamState",
    "aloam_drive",
    "aloam_step",
    "init_aloam_state",
]
