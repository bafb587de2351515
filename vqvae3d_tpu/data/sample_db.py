"""Sample database for ancestral sampling (uuid-linked, concurrency-safe).

Mirrors /root/reference/pixel_model/sample_embeddings.py:50-101: a per-level
dict of {uuid: {'data': code grid, 'condition': uuid-of-coarser-sample}},
guarded by a FileLock with merge-on-save so concurrent sampler jobs don't
clobber each other. Serialization is pickle of numpy arrays (the reference
uses torch.save, an equally eager whole-file format).
"""
from __future__ import annotations

import pickle
import random
from itertools import chain
from math import ceil
from pathlib import Path
from typing import Dict, List, Optional
from uuid import uuid4

import numpy as np
from filelock import FileLock


def _get_db_lock(db_path) -> FileLock:
    return FileLock(str(db_path) + ".lock")


def create_or_load_db(db_path: Path, level: int) -> Dict:
    db_path = Path(db_path)
    with _get_db_lock(db_path):
        if not db_path.exists():
            db_path.parent.mkdir(parents=True, exist_ok=True)
            db_path.write_bytes(pickle.dumps({}))
        db = pickle.loads(db_path.read_bytes())
    if level not in db:
        db[level] = {}
    return db


def save_db(db: Dict, db_path: Path, level: int) -> None:
    """Merge-on-save: re-read under the lock and union the level dict."""
    db_path = Path(db_path)
    with _get_db_lock(db_path):
        if db_path.exists():
            other = pickle.loads(db_path.read_bytes())
            if level in other:
                db[level].update(other[level])
        db_path.write_bytes(pickle.dumps(db))


def get_condition_uuids(db: Dict, level: int, num_conditions: int) -> List:
    """Sample condition uuids from the next-coarser level, repeating the
    pool when it is smaller than the request (reference :90-96)."""
    assert level + 1 in db
    options = list(db[level + 1].keys())
    if len(options) < num_conditions:
        options = list(
            chain.from_iterable(
                options for _ in range(ceil(num_conditions / len(options)))
            )
        )
    return random.sample(options, k=num_conditions)


def get_conditions(db: Dict, level: int, uuids) -> np.ndarray:
    assert level + 1 in db
    return np.stack([np.asarray(db[level + 1][u]["data"]) for u in uuids])


def add_samples(
    db: Dict, level: int, samples: np.ndarray, condition_uuids: Optional[List]
) -> List:
    """Store a batch of sampled grids; returns the new uuids."""
    if condition_uuids is None:
        condition_uuids = [None] * len(samples)
    new = []
    for grid, cond in zip(samples, condition_uuids):
        u = uuid4()
        db[level][u] = {"data": np.asarray(grid), "condition": cond}
        new.append(u)
    return new
