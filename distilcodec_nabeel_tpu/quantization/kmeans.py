"""K-means codebook initialization.

The reference supports kmeans-init of the EMA codebook on the first training
batch (vector_quantize_pytorch.py:201-241, :348-370; off by default).  Here it
is an explicit utility run eagerly before training, producing a codebook state
pytree — no hidden first-forward mutation under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vq import nearest_code_xla


def kmeans(
    samples: jnp.ndarray,
    num_clusters: int,
    num_iters: int = 10,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd iterations with uniform-sample init (reference semantics:
    empty clusters keep their previous mean).  samples: (N, D) ->
    (means (K, D), bins (K,))."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = samples.shape[0]
    if n >= num_clusters:
        idx = jax.random.permutation(rng, n)[:num_clusters]
    else:
        idx = jax.random.randint(rng, (num_clusters,), 0, n)
    means = samples[idx]

    def body(_, means):
        buckets = nearest_code_xla(samples, means)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=jnp.float32)
        bins = jnp.sum(onehot, axis=0)
        sums = jnp.matmul(onehot.T, samples, precision=jax.lax.Precision.HIGH)
        new_means = sums / jnp.maximum(bins[:, None], 1.0)
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    buckets = nearest_code_xla(samples, means)
    bins = jnp.sum(jax.nn.one_hot(buckets, num_clusters, dtype=jnp.float32), axis=0)
    return means, bins


def kmeans_init_codebook_state(
    samples: jnp.ndarray, codebook_size: int, num_iters: int = 10, rng=None
) -> dict:
    """Build a VectorQuantize 'codebook' collection entry from data: embed =
    kmeans means, embed_avg = means*counts, cluster_size = counts, initted=1
    (mirrors init_embed_, vector_quantize_pytorch.py:348-370)."""
    means, bins = kmeans(samples, codebook_size, num_iters, rng)
    return {
        "embed": means,
        "embed_avg": means * bins[:, None],
        "cluster_size": bins,
        "initted": jnp.float32(1.0),
    }
