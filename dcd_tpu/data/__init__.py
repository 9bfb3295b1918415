from . import kitti_geometry
