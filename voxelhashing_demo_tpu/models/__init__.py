from . import dense_slam
