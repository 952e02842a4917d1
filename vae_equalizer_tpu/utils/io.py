"""Results IO: incremental JSONL records, .mat export, pytree checkpoints.

Improves on the reference's all-or-nothing persistence (results only saved
after the entire sweep grid finishes, Eval_run_DP.py:99-114 — a crash loses
everything): every grid point appends a JSONL record as soon as it finishes,
and the .mat export (same dict layout as the reference's savemat) is
re-derivable from the JSONL at any time. Checkpoints are plain .npz pytrees.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time

import numpy as np


def _to_jsonable(x):
    if isinstance(x, (np.ndarray, np.generic)):
        return np.asarray(x).tolist()
    if dataclasses.is_dataclass(x) and not isinstance(x, type):
        return dataclasses.asdict(x)
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if hasattr(x, "tolist"):
        return x.tolist()
    return x


def append_jsonl(path: str | pathlib.Path, record: dict) -> None:
    """Append one result record (atomic enough for single-writer sweeps)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    record = {"ts": time.time(), **_to_jsonable(record)}
    with path.open("a") as f:
        f.write(json.dumps(record) + "\n")


def read_jsonl(path: str | pathlib.Path) -> list[dict]:
    with pathlib.Path(path).open() as f:
        return [json.loads(line) for line in f if line.strip()]


def save_mat(path: str | pathlib.Path, save_dict: dict) -> None:
    """scipy .mat export with the reference's {'dict': {...}} layout."""
    import scipy.io as sio

    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    sio.savemat(str(path), {"dict": _matify(save_dict)})


def _matify(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        v = np.asarray(v) if not isinstance(v, np.ndarray) else v
        out[k] = v
    return out


def save_checkpoint(path: str | pathlib.Path, tree: dict) -> None:
    """Flatten a (nested-dict) pytree of arrays into one .npz."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}{k}/", v)
        else:
            flat[prefix.rstrip("/")] = np.asarray(node)

    walk("", tree)
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_checkpoint(path: str | pathlib.Path) -> dict:
    """Inverse of save_checkpoint: nested dict of numpy arrays."""
    flat = dict(np.load(pathlib.Path(path)))
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
