from .all_in_hmc import all_in_HMC
from .bayesian_sgpr_hmc import BayesianSparseGPR_HMC
from .bayesian_svgp import BayesianStochasticVariationalGP
from .gpr_hmc import GPR_HMC, gp_marginal_loglik, gp_predict
from .sgpmc import SGPMC, predict_sgpmc, train_sgp_hmc
from .sgpr import SparseGPR, sgpr_elbo, sgpr_optimal_qu, sgpr_predict
from .svgp import StochasticVariationalGP, svgp_elbo, svgp_predict_f
