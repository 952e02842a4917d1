"""Hyperparameter-grid sweep engine.

The reference drives sweeps with up to 10 nested Python for-loops and saves
one .mat at the very end (Eval_run_DP.py:67-114). Here:

  * the grid is an explicit cartesian product of config-field axes,
  * the independent ``iter`` repeats of each grid point run as one vmapped
    SPMD program sharded over the TPU mesh (train/batching.py),
  * every grid point appends a JSONL record the moment it finishes
    (crash-safe, resumable via ``skip_done``),
  * the final .mat reproduces the reference's tensor layout
    (axes x iter x frames) for drop-in analysis-script compatibility.
"""

from __future__ import annotations

import dataclasses
import itertools
import pathlib
import time

import jax
import numpy as np

from ..train import (
    run_cma_awgn,
    run_cma_dp,
    train_vae_dp,
    train_vae_flex_dp,
    train_vae_le_awgn,
    train_vae_nn_awgn,
)
from ..utils import io
from .seqpar import train_vae_dp_sharded, train_vae_flex_dp_sharded

RUNNERS = {
    "VAE-LE-AWGN": train_vae_le_awgn,
    "VAE-NN-AWGN": train_vae_nn_awgn,
    "CMA-AWGN": run_cma_awgn,
    "VAE": train_vae_dp,
    "VAE-SP": train_vae_dp_sharded,  # dp x sp sequence-parallel VAE
    "VAEflex-SP": train_vae_flex_dp_sharded,  # dp x sp VAEflex windows
    "VAEflex": train_vae_flex_dp,
    "CMA": run_cma_dp,
    "CMAbatch": run_cma_dp,
    "CMAflex": run_cma_dp,
}


def expand_grid(base_cfg, **axes):
    """Cartesian product of config-field value lists.

    Returns (configs, coords, axes) where coords[i] are the per-axis indices
    of configs[i] in the grid (used to scatter results into the .mat tensor).
    """
    names = list(axes)
    values = [list(axes[n]) for n in names]
    configs, coords = [], []
    for combo in itertools.product(*[range(len(v)) for v in values]):
        override = {n: values[i][combo[i]] for i, n in enumerate(names)}
        configs.append(dataclasses.replace(base_cfg, **override))
        coords.append(combo)
    return configs, coords, dict(zip(names, values))


def run_sweep(
    runner_name: str,
    base_cfg,
    axes: dict,
    iters: int,
    key: jax.Array,
    mesh=None,
    out_dir: str | pathlib.Path = "results",
    tag: str = "",
    progress=None,
    skip_done: bool = False,
    save_params: bool = False,
    compiled: bool = False,
    runner_kwargs: dict | None = None,
    checkpoint_every: int = 0,
    batch_lr_axis: bool = False,
    batch_snr_axis: bool = False,
    batch_nu_axis: bool = False,
):
    """Run a full grid; returns list of per-point results.

    Each result record: {"coords", "config", "ser", ...}. ``ser`` has shape
    (iters, ...) — the runner's history with a leading repeat axis.

    Resume: with ``skip_done`` the newest existing ``sweep_{tag}_*.jsonl`` is
    reused and its finished grid points are skipped — a record only counts
    as done if its stored config matches the current grid point, so a
    resumed sweep with changed axes/values re-runs (never silently reuses)
    mismatching points. Per-point keys are derived by fold_in, so the
    remaining points get the same keys an uninterrupted sweep would. With
    ``checkpoint_every`` > 0 each point also persists its training state
    every k frames, so a kill mid-point resumes mid-experiment, not just
    mid-grid; the state file carries a config hash, is removed once the
    point's record is written, and stale files are cleared (not resumed)
    when ``skip_done`` is off.

    ``batch_lr_axis`` / ``batch_snr_axis``: grid points that differ ONLY
    along the ``lr`` (and/or ``snr_db``) axes run as ONE runner call with
    those values batched into the runs axis (runner ``lr_vec``/``snr_vec``
    support — the DP frame-kernel paths fold per-run lr and demapper
    variance into the runs-batched kernel and draw per-run noise in the
    generator, so an n_points x iters group costs one experiment's wall
    time instead of n_points). Each point still gets its own JSONL record;
    the batched call derives its key from the group's FIRST point, so
    results are statistically (not bitwise) equal to the unbatched sweep —
    the same relationship the reference's unseeded RNG bears to any rerun.
    Groups with partially-finished resume records fall back to per-point
    execution; incompatible with ``checkpoint_every``.
    """
    import hashlib
    import inspect
    import json

    runner = RUNNERS[runner_name]
    runner_params = inspect.signature(runner).parameters
    configs, coords, axes_values = expand_grid(base_cfg, **axes)
    out_dir = pathlib.Path(out_dir)
    stamp = time.strftime("%y%m%d%H%M%S")
    tag = tag or runner_name
    jsonl = out_dir / f"sweep_{tag}_{stamp}.jsonl"

    def cfg_json(cfg):
        return io._to_jsonable(dataclasses.asdict(cfg))

    done = {}
    results = []
    if skip_done:
        prior = sorted(out_dir.glob(f"sweep_{tag}_*.jsonl"))
        if prior:
            jsonl = prior[-1]
            expected = {tuple(c): cfg_json(cf) for c, cf in zip(coords, configs)}
            # runner_kwargs are part of a record's identity (like the
            # state-file hash): a point finished with use_pallas="frame"
            # must not satisfy a resume of the plain path, and vice versa
            rk_now = io._to_jsonable(runner_kwargs or {})
            for r in io.read_jsonl(jsonl):
                c = tuple(r["coords"])
                if expected.get(c) == r.get("config") and r.get("runner_kwargs", {}) == rk_now:
                    done[c] = r
                    results.append(r)  # finished points feed the .mat
                else:
                    print(f"# resume: record at {c} has a different config or "
                          "runner mode; re-running", flush=True)
    def write_record(cfg, coord, res_point, wall):
        record = {
            "coords": list(coord),
            "config": dataclasses.asdict(cfg),
            "runner_kwargs": io._to_jsonable(runner_kwargs or {}),
            "wall_s": wall,
            **{m: res_point[m] for m in ("ser", "mi", "var_est", "var")
               if m in res_point},
        }
        io.append_jsonl(jsonl, record)
        if save_params:
            state = res_point.get("params", res_point.get("taps"))
            if state is not None:
                if not isinstance(state, dict):
                    state = {"taps": state}
                ckpt = out_dir / f"ckpt_{tag}_{stamp}_{'_'.join(map(str, coord))}.npz"
                io.save_checkpoint(ckpt, state)
                record["checkpoint"] = str(ckpt)
        results.append(record)
        return record

    batch_fields = []  # (axis index in coords, cfg field, runner kwarg)
    point_groups: dict = {}
    want = ([("lr", "lr_vec")] if batch_lr_axis else []) + (
        [("snr_db", "snr_vec")] if batch_snr_axis else []
    ) + ([("nu", "nu_vec")] if batch_nu_axis else [])
    if want:
        if checkpoint_every:
            raise ValueError(
                "batch_lr_axis/batch_snr_axis are incompatible with "
                "checkpoint_every"
            )
        has_kw = lambda kw: kw in runner_params or any(
            p.kind is inspect.Parameter.VAR_KEYWORD
            for p in runner_params.values()
        )
        names = list(axes)
        for field, kw in want:
            if field in names and len(axes_values[field]) > 1:
                if not has_kw(kw):
                    raise ValueError(
                        f"runner {runner_name!r} has no {kw} support"
                    )
                batch_fields.append((names.index(field), field, kw))
        if batch_fields:
            drop = {ax for ax, _, _ in batch_fields}
            gkey = lambda c: tuple(v for a, v in enumerate(c) if a not in drop)
            for j, c in enumerate(coords):
                point_groups.setdefault(gkey(c), []).append(j)

    handled: set = set()
    for i, (cfg, coord) in enumerate(zip(configs, coords)):
        if tuple(coord) in done or tuple(coord) in handled:
            continue
        if batch_fields:
            idxs = point_groups[gkey(tuple(coord))]
            if len(idxs) > 1 and not any(tuple(coords[j]) in done for j in idxs):
                n_pt = len(idxs)
                vec_kw = {
                    kw: np.repeat(
                        np.asarray(
                            [getattr(configs[j], field) for j in idxs],
                            np.float32,
                        ),
                        iters,
                    )
                    for _, field, kw in batch_fields
                }
                t0 = time.time()
                kwargs = dict(
                    runs=iters * n_pt, mesh=mesh, progress=progress,
                    **vec_kw, **(runner_kwargs or {}),
                )
                if (kwargs.get("use_pallas") == "frame"
                        and "runs_batch" not in kwargs):
                    # one kernel group if it fits: the runner's default cap
                    # of 8 split a 15-run lr-batched flagship grid into 3
                    # serialized groups — measured 10.3 s vs 6.6 s wall with
                    # rb=15 (kernel VMEM headroom is ~16 runs/group)
                    n_runs = kwargs["runs"]
                    kwargs["runs_batch"] = max(
                        d for d in range(1, min(16, n_runs) + 1)
                        if n_runs % d == 0
                    )
                if compiled and "compiled" in runner_params:
                    kwargs["compiled"] = True
                    kwargs.pop("progress")
                res = runner(cfg, jax.random.fold_in(key, i), **kwargs)
                wall = time.time() - t0
                for bj, j in enumerate(idxs):
                    blk = slice(bj * iters, (bj + 1) * iters)
                    res_j = {
                        m: np.asarray(res[m])[blk]
                        for m in ("ser", "mi", "var_est") if m in res
                    }
                    if "var_runs" in res:  # per-run var (snr-axis batching)
                        res_j["var"] = np.asarray(res["var_runs"])[bj * iters]
                    elif "var" in res:  # per-point constant (no runs axis)
                        res_j["var"] = res["var"]
                    state = res.get("params", res.get("taps"))
                    if state is not None:
                        res_j["params"] = jax.tree.map(
                            lambda a: np.asarray(a)[blk], state
                        ) if isinstance(state, dict) else np.asarray(state)[blk]
                    write_record(configs[j], coords[j], res_j, wall / n_pt)
                    handled.add(tuple(coords[j]))
                continue
        k = jax.random.fold_in(key, i)  # per-point, independent of skips
        t0 = time.time()
        kwargs = dict(runs=iters, mesh=mesh, progress=progress, **(runner_kwargs or {}))
        state_file = None
        if checkpoint_every and "checkpoint" in runner_params:
            # config hash in the name: a state file can only ever be resumed
            # by the identical grid point of the identical experiment.
            # runner_kwargs are part of the identity: use_pallas="frame"
            # changes the carry pytree, so resuming across a mode toggle
            # would positionally load incompatible leaves.
            # with no runner_kwargs, hash (cfg, iters) exactly as before the
            # runner_kwargs-identity change, so state files written by older
            # versions still resume for the (default-mode) sweeps they came from
            ident = (cfg_json(cfg), iters) if not runner_kwargs else (
                cfg_json(cfg), iters, runner_kwargs)
            h = hashlib.sha1(
                json.dumps(ident, sort_keys=True, default=str).encode()
            ).hexdigest()[:10]
            state_file = out_dir / f"state_{tag}_{'_'.join(map(str, coord))}_{h}.npz"
            if not skip_done and state_file.exists():
                state_file.unlink()  # fresh sweep: never resume stale state
            kwargs.update(checkpoint=state_file, checkpoint_every=checkpoint_every)
        if compiled:
            if "compiled" in runner_params:
                kwargs["compiled"] = True
                kwargs.pop("progress")
        res = runner(cfg, k, **kwargs)
        wall = time.time() - t0
        write_record(cfg, coord, res, wall)
        if state_file is not None and state_file.exists():
            state_file.unlink()  # the point finished; drop its resume state
    return results, axes_values, jsonl


def assemble_mat(results, axes_values, iters: int, lead_shape: tuple[int, ...],
                 key: str = "ser"):
    """Scatter per-point metric histories into the reference's tensor layout.

    lead_shape: leading dims of one run's history (e.g. (4,) rows for DP SER,
    (2,) for Var_est, () for AWGN). Returns ndarray of shape
    lead_shape + grid_dims + (iters, history_len). A per-point constant (a
    record value with no iters/history axes, e.g. the true noise variance
    ``var`` -> the reference's ``var_real`` with history length 1,
    Eval_run_DP.py:54) is broadcast over the iters axis. Returns None when no
    record carries ``key`` (e.g. resuming a JSONL written before the key
    existed).
    """
    grid_dims = tuple(len(v) for v in axes_values.values())
    first = next((np.asarray(r[key]) for r in results if key in r), None)
    if first is None:
        return None
    per_point_const = first.ndim == len(lead_shape)
    hist_len = 1 if per_point_const else first.shape[-1]
    out = np.full(lead_shape + grid_dims + (iters, hist_len), np.nan, np.float32)
    for rec in results:
        if key not in rec:
            continue
        arr = np.asarray(rec[key])  # (iters, *lead_shape, hist)
        if per_point_const:
            arr = arr.reshape(lead_shape + (1, 1))  # broadcasts over iters
        else:
            arr = np.moveaxis(arr, 0, -2) if arr.ndim > 2 else arr  # lead axes first
        idx = (slice(None),) * len(lead_shape) + tuple(rec["coords"])
        out[idx] = arr
    return out
