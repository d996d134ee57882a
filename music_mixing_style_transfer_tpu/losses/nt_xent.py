"""NT-Xent contrastive loss with mesh-wide negatives.

TPU-native re-design of the reference NT_Xent (``modules/loss.py:24-71``,
SimCLR formulation) and its NCCL gather (``modules/training_utils.py:130-172``):
instead of a custom autograd all-gather, negatives are shared across the data
axis with ``jax.lax.all_gather(..., axis_name)`` inside shard_map/pjit —
gradients flow through JAX collectives natively.

Semantics match the reference exactly for world_size=1 and reproduce the
DDP behaviour for world_size>1 (embeddings from all replicas form the
negative set; the positive pair is (i, i + N_total/2)).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _cosine_sim_matrix(z: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Pairwise cosine similarity, torch.nn.CosineSimilarity semantics:
    denominator ``max(||a||*||b||, eps)``."""
    norms = jnp.linalg.norm(z, axis=-1)
    dots = z @ z.T
    denom = jnp.maximum(norms[:, None] * norms[None, :], eps)
    return dots / denom


def nt_xent_loss(
    z_i: jnp.ndarray,
    z_j: jnp.ndarray,
    temperature: float,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """NT-Xent loss over a (possibly sharded) batch of positive pairs.

    Args:
        z_i, z_j: ``[B_local, D]`` embeddings of the two augmented views.
        temperature: softmax temperature.
        axis_name: mesh axis to gather negatives over (None = single device).

    Returns:
        scalar loss (sum CE over 2N rows / 2N) — reference reduction.
    """
    z = jnp.concatenate([z_i, z_j], axis=0)  # [2*B_local, D]
    if axis_name is not None:
        # [W, 2*B_local, D] -> ordered as reference DDP gather: all replicas'
        # (i then j) stacked; reorder to (all i, all j) for the diagonal trick
        zg = jax.lax.all_gather(z, axis_name)  # [W, 2B, D]
        W = zg.shape[0]
        B = z_i.shape[0]
        zi_all = zg[:, :B, :].reshape(W * B, -1)
        zj_all = zg[:, B:, :].reshape(W * B, -1)
        z = jnp.concatenate([zi_all, zj_all], axis=0)
        N_half = W * B
    else:
        N_half = z_i.shape[0]

    N = 2 * N_half
    sim = _cosine_sim_matrix(z) / temperature

    # positives: sim[i, i+N_half] and sim[i+N_half, i]
    pos = jnp.concatenate(
        [jnp.diagonal(sim, offset=N_half), jnp.diagonal(sim, offset=-N_half)], axis=0
    )  # [N]

    # mask out self-similarity and the positive pair from the negatives
    eye = jnp.eye(N, dtype=bool)
    pos_mask = (
        eye
        | jnp.eye(N, k=N_half, dtype=bool)
        | jnp.eye(N, k=-N_half, dtype=bool)
    )
    neg = jnp.where(pos_mask, -jnp.inf, sim)

    # cross entropy with the positive as class 0:
    # loss_row = -pos + logsumexp([pos, negatives])
    logits_max = jnp.maximum(pos, jnp.max(neg, axis=1))
    lse = logits_max + jnp.log(
        jnp.exp(pos - logits_max)
        + jnp.sum(jnp.where(pos_mask, 0.0, jnp.exp(sim - logits_max[:, None])), axis=1)
    )
    loss = jnp.sum(lse - pos) / N
    if axis_name is not None:
        # the gathered loss is identical on every shard; pmean marks it
        # replicated for shard_map's varying-axes inference
        loss = jax.lax.pmean(loss, axis_name)
    return loss
