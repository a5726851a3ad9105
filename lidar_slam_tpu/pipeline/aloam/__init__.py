from .feature_extraction import FeatureExtractionConfig, extract_features, ScanFeatures
from .odometry import AloamOdometry, AloamOdometryConfig
from .mapping import AloamMapping, AloamMappingConfig

__all__ = [
    "FeatureExtractionConfig",
    "extract_features",
    "ScanFeatures",
    "AloamOdometry",
    "AloamOdometryConfig",
    "AloamMapping",
    "AloamMappingConfig",
]
