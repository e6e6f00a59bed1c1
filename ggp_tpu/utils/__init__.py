from . import (
    checkpoint,
    datasets,
    experiment_tools,
    load_data,
    metrics,
    posterior_predictive,
    profiling,
)
