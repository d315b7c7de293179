"""Degree-respecting projection and position folding (fri/src/folding/mod.rs)."""

from __future__ import annotations

from typing import List

import numpy as np

from ..math import ntt, vecmath as vm
from ..math.fields import Field


def transpose_evaluations(evals: np.ndarray, n_folding: int) -> np.ndarray:
    """(n, d) -> (rows, N, d) where row i = [e[i], e[i+rows], e[i+2·rows], ...]
    (utils/core/src/lib.rs:166 transpose_slice)."""
    n = evals.shape[0]
    rows = n // n_folding
    assert rows * n_folding == n
    return np.stack([evals[j * rows : (j + 1) * rows] for j in range(n_folding)], axis=1)


def apply_drp(field: Field, transposed: np.ndarray, domain_offset: int,
              alpha: tuple) -> np.ndarray:
    """Fold: per row, N-point iFFT over the row's coset, scale coefficients by
    the per-row inverse offset powers, Horner-evaluate at α
    (folding/mod.rs:86-118). `transposed`: (rows, N, d); returns (rows, d)."""
    base = field.base
    p = base.p
    rows, n_fold, d = transposed.shape

    # N-point iNTT across the folding axis (vectorized over rows)
    stacked = np.ascontiguousarray(np.swapaxes(transposed, 0, 1))  # (N, rows, d)
    coeffs = ntt.interpolate_poly(base, stacked)  # (N, rows, d)

    # per-row inverse offsets: (offset · g^i)^-1 over the SOURCE domain
    # (folding/mod.rs:181-189)
    n_source = rows * n_fold
    g = ntt.get_root(base, n_source)
    inv_g = pow(g, p - 2, p)
    inv_offset = pow(domain_offset % p, p - 2, p)
    inv_offsets = vm.power_series(base, inv_g, rows, offset=inv_offset)  # (rows,)

    # scale coeff k by inv_offset^k, then Horner at alpha
    result = vm.zeros((rows, d))
    pow_acc = np.ones(rows, dtype=object)
    scaled = np.empty_like(coeffs)
    for k in range(n_fold):
        scaled[k] = coeffs[k] * pow_acc[:, None] % p
        pow_acc = pow_acc * inv_offsets % p
    for k in range(n_fold - 1, -1, -1):
        result = vm.eadd(field, vm.emul_scalar(field, result, alpha), scaled[k])
    return result


def fold_positions(positions: List[int], source_domain_size: int,
                   folding_factor: int) -> List[int]:
    """pos % folded_size, first-occurrence order preserved
    (folding/mod.rs:159-176)."""
    target = source_domain_size // folding_factor
    result: List[int] = []
    for pos in positions:
        pos %= target
        if pos not in result:
            result.append(pos)
    return result
