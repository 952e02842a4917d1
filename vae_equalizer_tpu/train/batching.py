"""Run-batching: vmap independent runs and shard them across the TPU mesh.

The reference's only exploitable parallelism is the embarrassingly parallel
hyperparameter grid / independent-repeat axis (SURVEY.md section 2,
Eval_run_DP.py:67-95 runs grid x iter sequentially). Here the repeat axis is
a real batch axis: per-run state is stacked, the jitted epoch/frame step is
vmapped, and (optionally) the batch axis is sharded over a 1-D device mesh —
N independent experiments run as one SPMD program over ICI with no cross-run
collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["broadcast_runs", "shard_runs", "run_mesh"]


def run_mesh(n_devices: int | None = None, axis: str = "runs") -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))


def broadcast_runs(tree, runs: int):
    """Stack identical initial state along a new leading runs axis."""
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (runs,) + x.shape), tree)


def shard_runs(tree, mesh: Mesh | None, axis: str = "runs"):
    """Place a runs-leading pytree with the batch axis sharded over the mesh.

    If the run count doesn't divide the mesh, falls back to the largest
    divisor submesh (runs must be evenly shardable for SPMD).
    """
    if mesh is None:
        return tree
    runs = next(
        x.shape[0] for x in jax.tree.leaves(tree) if jnp.ndim(x) > 0
    )
    n = mesh.devices.size
    if runs % n != 0:
        import math

        n = math.gcd(runs, n)
        mesh = Mesh(mesh.devices.reshape(-1)[:n], (axis,))
    sharding = NamedSharding(mesh, P(axis))
    # rank-0 leaves (e.g. the frame path's global step counter) have no
    # runs axis — replicate them instead of sharding
    repl = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding if jnp.ndim(x) > 0 else repl),
        tree,
    )

