from . import (
    augmentations,
    gen_data,
    heatmap,
    kitti_dataset,
    kitti_geometry,
    multiscale,
    synthetic,
    target_encoder,
)
