from . import icp, preprocess, raycast, tsdf
