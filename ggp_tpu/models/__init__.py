from .sgpr import SparseGPR, sgpr_elbo, sgpr_optimal_qu, sgpr_predict
