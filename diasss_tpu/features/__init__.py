"""Feature pipeline: pyramid, FAST detection, orientation, SIFT descriptors.

TPU-native reimplementation of the reference's vendored/modified ORB-SLAM2
extractor (/root/reference/thirdparty/ORBextractor.cpp): image pyramid ->
grid-cell FAST -> spatially-uniform keypoint selection -> intensity-centroid
orientation -> SIFT descriptors (the reference's ORB binary path is dead code,
ORBextractor.cpp:1097-1098).
"""

from .detector import DetectedFeatures, detect_features
from .geopatch import (
    attach_geo_patch_descriptors,
    attach_geo_patch_descriptors_batch,
    geo_patch_descriptors,
)

__all__ = [
    "DetectedFeatures",
    "detect_features",
    "attach_geo_patch_descriptors",
    "attach_geo_patch_descriptors_batch",
    "geo_patch_descriptors",
]
