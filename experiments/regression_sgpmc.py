"""Dedicated SGPMC (JointHMC) benchmark runner.

Mirror of the reference's gpflow runner (experiments/regression_sgmc_tf.py):
sweeps datasets x splits with tune=500, n=500 (:79) and the same JSON
logging contract (:112-120). Thin front-end over
``experiments.regression.single_run`` with model JointHMC.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from regression import DATASETS, single_run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--datasets", nargs="+", default=DATASETS)
    p.add_argument("--n_splits", type=int, default=10)
    p.add_argument("--M", type=int, default=100)
    p.add_argument("--tune", type=int, default=500)
    p.add_argument("--num_samples", type=int, default=500)
    p.add_argument("--num_chains", type=int, default=2)
    a = p.parse_args()
    for ds in a.datasets:
        for split in range(a.n_splits):
            single_run(ds, split, "JointHMC", M=a.M, tune=a.tune,
                       num_samples=a.num_samples, num_chains=a.num_chains)


if __name__ == "__main__":
    main()
