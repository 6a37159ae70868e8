"""Codebook-sharded (model-parallel) nearest-neighbor search.

The 32768x3584 codebook normally lives replicated in HBM (~470 MB fp32 — it
fits trivially).  This flagged alternative shards it over a ``model`` mesh
axis: each device holds K/n codes, computes partial distances and a local
(min, argmin), and the global argmin is combined with one tiny all-gather of
(min, argmin) pairs — O(2n) scalars per token over ICI (BASELINE north star's
"distance-sharded with an allreduce-argmin" option; SURVEY §5.8).

Useful when K*D grows (multi-codebook teachers, larger vocabularies) or to
split the distance FLOPs across chips for latency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def nearest_code_tp(
    x: jnp.ndarray, embed: jnp.ndarray, mesh: Mesh, axis: str = "model"
) -> jnp.ndarray:
    """Trace-time TP search: usable inside an outer jitted program (no
    self-jit).  Semantics identical to :func:`sharded_nearest_code`."""
    n_shards = mesh.shape[axis]
    K = embed.shape[0]
    assert K % n_shards == 0, (K, n_shards)
    k_local = K // n_shards

    def shard_fn(x_rep, e_local):
        # x_rep: (N, D) replicated; e_local: (k_local, D) this shard's codes
        e_local = e_local.astype(jnp.float32)
        xr = x_rep.astype(jnp.float32)
        e2 = jnp.sum(jnp.square(e_local), axis=-1)
        xy = jnp.matmul(xr, e_local.T, precision=jax.lax.Precision.HIGH)
        d = e2[None, :] - 2.0 * xy
        local_min = jnp.min(d, axis=-1)
        local_arg = jnp.argmin(d, axis=-1).astype(jnp.int32)
        shard = jax.lax.axis_index(axis)
        local_arg = local_arg + shard * k_local
        # gather all shards' candidates and pick the global winner
        mins = jax.lax.all_gather(local_min, axis)  # (n, N)
        args = jax.lax.all_gather(local_arg, axis)  # (n, N)
        winner = jnp.argmin(mins, axis=0)  # first (lowest shard) wins ties
        return jnp.take_along_axis(args, winner[None, :], axis=0)[0]

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        # result is replicated by construction (post-all_gather argmin);
        # the static varying-axes check can't infer that through the
        # gather/select chain
        check_vma=False,
    )(x, embed)


def sharded_nearest_code(
    x: jnp.ndarray, embed: jnp.ndarray, mesh: Mesh, axis: str = "model"
) -> jnp.ndarray:
    """argmin_k ||x - e_k||^2 with ``embed`` sharded along ``axis``.

    x: (N, D) replicated; embed: (K, D) sharded on dim 0.  Returns (N,) int32
    global code ids.  Tie-breaking: lowest global index wins (matching the
    unsharded argmin), enforced by lexicographic (min, shard-offset) compare.
    """
    from functools import partial

    return jax.jit(partial(nearest_code_tp, mesh=mesh, axis=axis))(x, embed)


# --------------------------------------------------------------------------
# Process-wide activation: quantization.vq.nearest_code consults this at
# trace time so the TP search is reachable from the full DistilCodec facade
# (SURVEY §2.2 TP row) — set via DistilCodec.use_codebook_sharding(mesh).
_ACTIVE: tuple[Mesh, str] | None = None


def set_codebook_sharding(mesh: Mesh | None, axis: str = "model") -> None:
    """Activate (or, with ``mesh=None``, deactivate) codebook tensor
    parallelism for every subsequently traced VQ nearest-neighbor search."""
    global _ACTIVE
    _ACTIVE = None if mesh is None else (mesh, axis)


def active_codebook_sharding() -> tuple[Mesh, str] | None:
    return _ACTIVE


def shard_codebook(embed: jnp.ndarray, mesh: Mesh, axis: str = "model"):
    """Place a codebook array sharded along the model axis."""
    return jax.device_put(embed, NamedSharding(mesh, P(axis)))
