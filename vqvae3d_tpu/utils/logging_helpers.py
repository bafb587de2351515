"""Metric-distribution logging helpers.

``sub_metric_log_dict`` expands a tensor metric into min/max/mean/median/std
scalars, mirroring /root/reference/utils/logging_helpers.py:4-15 (used for
every key training metric).
"""
from __future__ import annotations

import jax.numpy as jnp


def sub_metric_log_dict(metric_name: str, metric) -> dict:
    metric = jnp.asarray(metric)
    return {
        f"{metric_name}_{name}": fn(metric)
        for name, fn in (
            ("min", jnp.min),
            ("max", jnp.max),
            ("mean", jnp.mean),
            ("median", jnp.median),
            ("std", jnp.std),
        )
    }
