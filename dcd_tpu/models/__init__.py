from . import blind_pnp, detector, dla, gmw, layers, predictor
