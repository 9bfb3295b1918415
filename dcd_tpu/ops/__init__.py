from . import codec, dcn, dcn_pallas, geometry3d, losses, nms, psroi, sinkhorn
