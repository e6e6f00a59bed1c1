from .diagnostics import (effective_sample_size, split_rhat, summary,
                          summary_to_csv, trace_to_named_dict)
from .hmc import (NUTSConfig, build_sampler, build_sampler_chunked,
                  hmc_kernel, nuts_kernel, run_nuts)
