"""Generic frame/epoch experiment harness.

Every online training loop in this package has the same transport shape: a
jitted ``frame_step(carry, key, *per_frame) -> (carry, packed_metrics)`` is
driven over frames either from a Python loop (one device call + ONE packed
D2H metric transfer per frame) or as a single whole-experiment ``lax.scan``
(``compiled=True``, one D2H at the end).  Independent repeats (the
reference's ``iter`` axis) are vmapped into the same XLA program and sharded
over a device mesh by the caller (train/batching.py).

Metric transport: every per-frame scalar/vector is packed into ONE float32
vector on device (``pack_metrics``) and unpacked on host — on the axon TPU
transport each host fetch costs ~10-25 ms of tunnel latency, so fetching the
~13 metric leaves individually dominated the frame time (measured 250 ms vs
14 ms of device compute per 10000-symbol frame).

This replaces the per-loop copies of the scan/loop/unpack scaffolding that
the reference repeats in every func_*_shaping.py processing() body.
"""

from __future__ import annotations

import os
import pathlib
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Progress", "init_carry", "pack_metrics", "unpack_metrics", "run_frame_loop"]

Fields = Sequence[tuple[str, int]]
Progress = Callable[[int, dict], None] | None


def init_carry(params, opt, runs, mesh):
    """(params, opt_state), broadcast over runs and mesh-sharded if asked."""
    from .batching import broadcast_runs, shard_runs

    if runs is None:
        return params, opt.init(params)
    params = shard_runs(broadcast_runs(params, runs), mesh)
    return params, jax.vmap(opt.init)(params)


def pack_metrics(m: dict, fields: Fields) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.atleast_1d(m[k]).astype(jnp.float32).reshape(-1) for k, _ in fields]
    )


def unpack_metrics(v: np.ndarray, fields: Fields) -> dict:
    out, i = {}, 0
    for k, n in fields:
        out[k] = v[..., i] if n == 1 else v[..., i : i + n]
        i += n
    return out


def _save_state(path: pathlib.Path, frame: int, carry, hist: dict) -> None:
    """Atomically persist (next frame index, carry pytree, metric histories).

    Carry leaves are stored positionally (the treedef is re-derivable from
    the runner's freshly-built carry on resume), so any optax state —
    nested namedtuples included — round-trips without pickling.
    """
    flat = {f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(jax.tree.leaves(carry))}
    flat.update({f"hist_{k}": v for k, v in hist.items()})
    flat["frame"] = np.int64(frame)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def _load_state(path: pathlib.Path, carry, hist: dict):
    d = np.load(path)
    leaves, treedef = jax.tree.flatten(carry)
    saved = [k for k in d.files if k.startswith("leaf_")]
    if len(saved) != len(leaves) or any(
        d[f"leaf_{i:04d}"].shape != tuple(l.shape) for i, l in enumerate(leaves)
    ):
        raise ValueError(
            f"checkpoint {path} holds {len(saved)} training-state leaves that "
            f"do not match this runner's carry ({len(leaves)} leaves) — it was "
            "written by a different runner mode (e.g. use_pallas toggled) or "
            "configuration; delete it or rerun with the original settings"
        )
    carry = jax.tree.unflatten(
        treedef,
        [jnp.asarray(d[f"leaf_{i:04d}"], l.dtype) for i, l in enumerate(leaves)],
    )
    for k in hist:
        saved = d[f"hist_{k}"]
        hist[k][...] = saved
    return int(d["frame"]), carry


def run_frame_loop(
    frame_step: Callable,
    carry,
    per_frame: tuple,
    fields: Fields,
    *,
    runs: int | None = None,
    vmap_runs: bool = True,
    progress: Callable[[int, dict], None] | None = None,
    compiled: bool = False,
    chunk_frames: int = 1,
    checkpoint: str | os.PathLike | None = None,
    checkpoint_every: int = 0,
    timings: dict | None = None,
):
    """Drive ``frame_step`` over an experiment's frames.

    frame_step(carry, key, *rest) -> (carry, packed) with ``packed`` laid out
    by ``fields``;  per_frame = (frame_keys, *rest_arrays), each indexed by
    frame.  With ``runs`` set and ``vmap_runs`` (the default), frame_step is
    vmapped over a leading runs axis of ``carry`` with one key per run and
    the remaining per-frame inputs broadcast; ``vmap_runs=False`` means the
    step already handles the runs axis itself (e.g. a shard_mapped step) and
    receives the unsplit key.

    Returns ``(carry, hist)`` where hist maps field name -> np.float32 array
    of shape ``(*runs_prefix, [n,] num_frames)``.

    ``compiled=True`` wraps the whole experiment in one lax.scan inside a
    single jitted call (no per-frame host round trips; ``progress`` is then
    unavailable).

    ``chunk_frames=k`` (loop mode): run k frames per device call as one
    lax.scan — the middle ground between per-frame dispatch and the fully
    compiled experiment. On the axon TPU transport each call pays ~10-25 ms
    of tunnel latency, so k frames per call cut that tax k-fold while
    keeping ``progress`` (reported per frame, k at a time) and
    checkpoint/resume (at chunk boundaries).

    ``checkpoint``/``checkpoint_every``: in loop mode, persist (frame index,
    carry, histories) to ``checkpoint`` every ``checkpoint_every`` frames
    (rounded up to chunk boundaries) and resume from it if it exists — a
    killed 170-frame experiment restarts at the last saved frame instead of
    frame 0 (mid-experiment counterpart of the sweep engine's per-grid-point
    JSONL resume). Per-frame inputs are precomputed from the experiment key,
    so a resumed run is bit-identical to an uninterrupted one. Ignored in
    compiled mode (one XLA program has no frame boundary to checkpoint at).
    """
    frame_keys, *rest = per_frame
    num_frames = len(frame_keys)
    if runs is not None and vmap_runs:
        step1 = jax.vmap(frame_step, in_axes=(0, 0) + (None,) * len(rest))
        splitk = lambda k: jax.random.split(k, runs)
    else:
        step1 = frame_step
        splitk = lambda k: k

    if compiled:

        def scan_body(c, inp):
            k, *r = inp
            return step1(c, splitk(k), *r)

        @jax.jit
        def run_all(c):
            return jax.lax.scan(scan_body, c, (frame_keys, *rest))

        if timings is None:
            carry, packed = run_all(carry)
        else:
            # profiling hook: AOT-compile, then time pure execution (bench.py
            # reports the device-compute ceiling separately from compile)
            import time

            t0 = time.perf_counter()
            run_all_c = run_all.lower(carry).compile()
            timings["compile_s"] = time.perf_counter() - t0
            # best-of-3: per-dispatch tunnel/queue latency fluctuates 3x+
            # day to day; the min is the honest device-compute time
            best, out = None, None
            for _ in range(3):
                t0 = time.perf_counter()
                out = jax.block_until_ready(run_all_c(carry))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings["run_s"] = best
            carry, packed = out
        hist = unpack_metrics(np.asarray(packed), fields)  # one D2H transfer
        # stacked (frames, ..., n) -> (..., n, frames)
        return carry, {k: np.moveaxis(v, 0, -1) for k, v in hist.items()}

    prefix = () if runs is None else (runs,)
    hist = {
        k: np.zeros(prefix + ((n,) if n > 1 else ()) + (num_frames,), np.float32)
        for k, n in fields
    }
    start = 0
    ckpt = pathlib.Path(checkpoint) if checkpoint else None
    if ckpt and ckpt.exists():
        start, carry = _load_state(ckpt, carry, hist)

    if chunk_frames <= 1:
        step1 = jax.jit(step1)
        for frame in range(start, num_frames):
            carry, packed = step1(carry, splitk(frame_keys[frame]), *(r[frame] for r in rest))
            m = unpack_metrics(np.asarray(packed), fields)  # one D2H transfer
            for k, _ in fields:
                hist[k][..., frame] = m[k]
            if ckpt and checkpoint_every and (frame + 1) % checkpoint_every == 0 and frame + 1 < num_frames:
                _save_state(ckpt, frame + 1, carry, hist)
            if progress:
                progress(frame, m)
        return carry, hist

    @jax.jit  # one compile per distinct chunk length (the tail may differ)
    def chunk_step(c, keys, *rests):
        def body(c2, inp):
            k, *r = inp
            return step1(c2, splitk(k), *r)

        return jax.lax.scan(body, c, (keys, *rests))

    frame = start
    since_save = 0
    while frame < num_frames:
        c = min(chunk_frames, num_frames - frame)
        sl = slice(frame, frame + c)
        carry, packed = chunk_step(carry, frame_keys[sl], *(r[sl] for r in rest))
        m = unpack_metrics(np.asarray(packed), fields)  # ONE D2H for c frames
        for k, n in fields:
            # packed rows are frame-major: (c, ..., n) -> hist (..., n, frames)
            hist[k][..., frame : frame + c] = np.moveaxis(m[k], 0, -1)
        if progress:
            for i in range(c):
                progress(frame + i, {k: v[i] for k, v in m.items()})
        frame += c
        since_save += c
        if ckpt and checkpoint_every and since_save >= checkpoint_every and frame < num_frames:
            _save_state(ckpt, frame, carry, hist)
            since_save = 0
    return carry, hist
