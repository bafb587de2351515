"""Shared CLI plumbing: metric logging and config↔argparse bridging.

The reference logs through Lightning's log_dict → TensorBoard
(SURVEY §5); here metrics stream to stdout + a JSONL file per run (easily
re-plotted; TensorBoard event-file writing is intentionally not a hard
dependency).
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for every CLI entry point.

    Full-config graphs compile in minutes-to-tens-of-minutes on TPU (the
    150-block 256-res train step: ~38 min cold); the persistent cache makes
    every re-launch (resume, eval, next pipeline stage with the same
    shapes) hit compiled binaries instead. Opt out with
    VQVAE3D_COMPILE_CACHE=0 or point VQVAE3D_COMPILE_CACHE at a directory.
    """
    import os

    loc = os.environ.get("VQVAE3D_COMPILE_CACHE", "")
    if loc == "0":
        return
    import jax

    path = loc or os.path.join(
        os.path.expanduser("~"), ".cache", "vqvae3d_tpu_xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # cache is best-effort; never block a run on it


def literal_fold_serving(config, spatial=None) -> bool:
    """Should this checkpoint serve through the folded (s2d×2) domain?

    True for literal-stem (stem_space_to_depth == 1) configs — i.e.
    converted reference checkpoints — on even-dimension volumes: the model
    then takes ``s2d(x, 2)`` and returns ``s2d(decoded, 2)``
    (``folded_io=True``), running the level-0 front/back-end as exact
    folded-domain weight embeddings. This is what makes 512×512×128
    serving fit one 16 GB chip (models/vqvae.py lit_fold; PERF.md).
    Opt out with VQVAE3D_LITERAL_FOLD=0.
    """
    import os

    if os.environ.get("VQVAE3D_LITERAL_FOLD", "1") == "0":
        return False
    if int(getattr(config, "stem_space_to_depth", 1) or 1) != 1:
        return False
    if getattr(config, "block_type", "pre-activation") != "pre-activation":
        return False
    if not getattr(config, "scan_stacks", True):
        return False
    if spatial is not None and any(int(s) % 2 for s in spatial):
        return False
    return True


class MetricLogger:
    def __init__(self, logdir: Optional[str] = None, name: str = "metrics"):
        self.path = None
        if logdir is not None:
            Path(logdir).mkdir(parents=True, exist_ok=True)
            self.path = Path(logdir) / f"{name}.jsonl"
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict, prefix: str = "") -> Dict[str, float]:
        flat = {
            (f"{prefix}_{k}" if prefix else k): float(np.asarray(v))
            for k, v in metrics.items()
        }
        rec = {"step": int(step), "time": round(time.time() - self._t0, 2), **flat}
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return flat

    def print(self, step: int, flat: Dict[str, float], every: int = 1):
        if step % every == 0:
            keys = sorted(flat)[:8]
            msg = " ".join(f"{k}={flat[k]:.5g}" for k in keys)
            print(f"[step {step}] {msg}", flush=True)


def add_dataclass_args(parser, cls, skip=("dtype",)):
    """Expose a config dataclass's fields as --kebab-case CLI args."""
    from vqvae3d_tpu.utils.argparse_helpers import booltype

    for f in dataclasses.fields(cls):
        if f.name in skip:
            continue
        arg = "--" + f.name.replace("_", "-")
        default = f.default
        if isinstance(default, bool):
            parser.add_argument(arg, type=booltype, default=default)
        elif isinstance(default, int):
            parser.add_argument(arg, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(arg, type=float, default=default)
        elif isinstance(default, tuple):
            parser.add_argument(
                arg, type=int, nargs="+", default=list(default)
            )
        elif isinstance(default, str):
            parser.add_argument(arg, type=str, default=default)
    return parser


def dataclass_from_args(cls, args, overrides=None, skip=("dtype",)):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name in skip:
            continue
        if hasattr(args, f.name):
            v = getattr(args, f.name)
            if isinstance(f.default, tuple) and isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
    if overrides:
        kwargs.update(overrides)
    return cls(**kwargs)
