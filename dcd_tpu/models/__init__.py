from . import dla, detector, predictor
