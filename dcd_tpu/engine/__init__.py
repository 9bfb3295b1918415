from . import gen, gmw_train, infer, loss, solver, train
