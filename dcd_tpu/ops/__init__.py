from . import codec, losses, nms
