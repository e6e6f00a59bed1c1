"""Experiment naming and persistence helpers.

Re-implementation of the reference's canonical experiment-name builder
(utils/experiment_tools.py:11-116): every run gets a deterministic name
string from its (model, dataset, split, hyper-config) so that log files are
self-identifying and aggregation can group by name.
"""

from __future__ import annotations

import dataclasses
import json
import os
from datetime import date
from typing import Optional

from ..config import LOG_DIR
from . import datasets as _ds

__all__ = ["ExperimentName", "experiment_name", "get_dataset_class",
           "experiment_log_path", "dump_experiment_json"]


class ExperimentName:
    """Chained builder (reference: utils/experiment_tools.py:11-20)."""

    def __init__(self, base: str):
        self.parts = [str(base)]

    def add(self, key: str, value) -> "ExperimentName":
        self.parts.append(f"{key}-{value}")
        return self

    def get(self) -> str:
        return "_".join(self.parts)


def experiment_name(model_name: str, dataset_name: str, split_index: int = 0,
                    **fields) -> str:
    """Per-model field sets (reference: utils/experiment_tools.py:22-81):
    sparse models record M and train iterations; HMC models record
    tune/samples; SVGP records batch/epochs."""
    e = ExperimentName(dataset_name).add("model", model_name).add(
        "split", split_index)
    order = ["M", "max_iters", "num_epochs", "batch_size", "tune",
             "num_samples", "num_chains", "seed"]
    for k in order:
        if k in fields and fields[k] is not None:
            e.add(k, fields[k])
    for k in sorted(set(fields) - set(order)):
        if fields[k] is not None:
            e.add(k, fields[k])
    return e.get()


def experiment_name_allin(dataset_name: str, split_index: int = 0, **fields):
    """all_in_HMC variant (reference: utils/experiment_tools.py:83-100)."""
    return experiment_name("AllInHMC", dataset_name, split_index, **fields)


def experiment_name_tf(dataset_name: str, split_index: int = 0, **fields):
    """SGPMC/JointHMC variant (reference: utils/experiment_tools.py:103-116)."""
    return experiment_name("JointHMC", dataset_name, split_index, **fields)


def get_dataset_class(name: str):
    """Reference: getattr-based lookup (utils/experiment_tools.py:118-119)."""
    reg = {**_ds.regression_datasets, **_ds.classification_datasets}
    return reg[name.lower()]


def experiment_log_path(name: str, subdir: Optional[str] = None) -> str:
    """LOG_DIR/<date>/<name>.json (reference: experiments/regression.py:186-199)."""
    d = os.path.join(LOG_DIR, date.today().isoformat())
    if subdir:
        d = os.path.join(d, subdir)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{name}.json")


def dump_experiment_json(name: str, metrics: dict, subdir: Optional[str] = None) -> str:
    path = experiment_log_path(name, subdir)
    with open(path, "w") as f:
        json.dump(metrics, f, indent=2, default=float)
    return path
