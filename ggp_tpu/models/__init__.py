from .all_in_hmc import all_in_HMC
from .bayesian_sgpr_hmc import BayesianSparseGPR_HMC
from .gpr_hmc import GPR_HMC, gp_marginal_loglik, gp_predict
from .sgpmc import SGPMC, predict_sgpmc, train_sgp_hmc
from .sgpr import SparseGPR, sgpr_elbo, sgpr_optimal_qu, sgpr_predict
