from . import datasets, experiment_tools, load_data, metrics, posterior_predictive
