"""SeFa-style latent editing of FiLM conditioning.

Re-design of the FiLM ``sefa`` branch (reference ``network_utils.py:163-178``):
eigen-decomposition of a FiLM layer's (column-normalized) weight Gram matrix
gives semantic edit directions in the 2048-D condition space; adding
``alpha * eigvec`` to the condition embedding steers that block's modulation.

The MixFXcloner accepts a per-block list of conditions
(``models/tcn.py``), so edits can target individual blocks exactly like the
reference's per-block ``cond`` list (``architectures.py:139-140``).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def film_edit_directions(film_params: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray]:
    """Eigen-directions of a FiLM layer.

    Args:
        film_params: the flax FiLM param dict (``weight [2F, cond_dim]``).

    Returns:
        (eigenvalues [cond_dim] descending, eigenvectors [cond_dim, cond_dim]
        — rows are directions, matching the reference's row-indexed use).
    """
    w = np.asarray(film_params["weight"]).T  # [cond_dim, 2F]
    w = w / (np.linalg.norm(w + 1e-7, axis=0, keepdims=True))
    gram = w @ w.T  # [cond_dim, cond_dim]
    eigvals, eigvecs = np.linalg.eigh(gram)
    order = np.argsort(eigvals)[::-1]
    return eigvals[order], eigvecs[:, order].T


def sefa_edit_condition(
    cond: np.ndarray,
    film_params: Dict[str, Any],
    eig_idx: int,
    strength: float,
) -> np.ndarray:
    """Shift a condition embedding along one FiLM eigen-direction
    (reference: ``condition += eigval[idx] * strength * eigvec[idx]``)."""
    eigvals, eigvecs = film_edit_directions(film_params)
    alpha = eigvals[eig_idx] * strength
    return cond + alpha * eigvecs[eig_idx]


def sefa_per_block_conditions(
    cond: np.ndarray,
    converter_params: Dict[str, Any],
    edits: Dict[int, Tuple[int, float]],
    n_blocks: int = 14,
) -> List[np.ndarray]:
    """Build the per-block condition list for MixFXcloner with selected
    blocks edited. ``edits: block_idx -> (eig_idx, strength)``."""
    conds = []
    for n in range(n_blocks):
        c = cond
        if n in edits:
            eig_idx, strength = edits[n]
            c = sefa_edit_condition(cond, converter_params[f"block{n}"]["film"], eig_idx, strength)
        conds.append(c)
    return conds
