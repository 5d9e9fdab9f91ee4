from . import camera, coords, se3
