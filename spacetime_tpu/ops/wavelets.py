"""Three-point piecewise-linear wavelet transform in time (Stevenson style).

Implements the wavelet-in-time synthesis ``W`` and its transpose ``W'`` of the
minimal-residual solver (SURVEY.md Appendix A): level-0 basis = the two hats
on the coarsest grid {0, T}; a node created at level j by bisecting the
interval (pl, pr) carries the wavelet

    psi_{j,k} = s_k * ( wl_k * sigma_pl + sigma_k + wr_k * sigma_pr )

in level-j hats, where the weights satisfy one vanishing moment via the
symmetric split  wl = -I_k / (2 I_pl),  wr = -I_k / (2 I_pr)  (I_* = hat
integrals on the level-j grid). On uniform interior nodes this reduces to the
classical (-1/2, 1, -1/2) stencil and at the boundary to the adapted
(-1, 1, -1/2) stencil automatically — including on locally refined dyadic
grids. Every basis function is exactly L2(0,T)-normalized (scale s_k).

The transform is applied levelwise in O(N_t) as a composition of elementary
maps E_j acting on nodal values: interpolate the level-(j-1) field to the
level-j grid, then add the level-j details. Both the NumPy (oracle) and JAX
(device) applications share the same host-precomputed index/weight arrays;
the JAX version is a short unrolled loop of static gathers/scatter-adds over
axis 0 (J ≈ log2 N_t stages), jit-friendly and shardable.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..fem.timegrid import TimeGrid


@dataclasses.dataclass(frozen=True)
class _Level:
    idx: np.ndarray  # nodes created at this level
    pl: np.ndarray  # creation parents (left)
    pr: np.ndarray  # creation parents (right)
    wl: np.ndarray  # wavelet weight on sigma_pl
    wr: np.ndarray  # wavelet weight on sigma_pr
    s: np.ndarray  # L2 normalization scale


@dataclasses.dataclass(frozen=True)
class WaveletTransform:
    """Host-precomputed structure of the wavelet transform on a TimeGrid."""

    grid: TimeGrid
    levels: tuple[_Level, ...]  # levels 1..J
    root_idx: np.ndarray  # the two level-0 nodes
    root_s: np.ndarray  # their L2 normalization
    node_level: np.ndarray  # (N+1,) level of each node
    node_omega: np.ndarray  # (N+1,) |psi'|_L2 of the normalized basis function
    level_shift: np.ndarray  # (J+1,) representative omega per level
    perm_by_level: np.ndarray  # stable permutation sorting nodes by level
    level_counts: np.ndarray  # (J+1,) nodes per level

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    # ------------------------------------------------------------------ numpy

    def forward_np(self, c: np.ndarray) -> np.ndarray:
        """Synthesis W: wavelet coefficients -> nodal (hat) values, axis 0."""
        v = np.zeros_like(c)
        v[self.root_idx] = _bcast(self.root_s, c.ndim) * c[self.root_idx]
        for lev in self.levels:
            interp = 0.5 * (v[lev.pl] + v[lev.pr])
            t = _bcast(lev.s, c.ndim) * c[lev.idx]
            np.add.at(v, lev.pl, _bcast(lev.wl, c.ndim) * t)
            np.add.at(v, lev.pr, _bcast(lev.wr, c.ndim) * t)
            v[lev.idx] = t + interp
        return v

    def adjoint_np(self, v: np.ndarray) -> np.ndarray:
        """Transpose W': nodal-value layout -> wavelet-coefficient layout."""
        y = np.array(v, copy=True)
        for lev in reversed(self.levels):
            t = y[lev.idx].copy()
            pv_l = y[lev.pl].copy()
            pv_r = y[lev.pr].copy()
            np.add.at(y, lev.pl, 0.5 * t)
            np.add.at(y, lev.pr, 0.5 * t)
            y[lev.idx] = _bcast(lev.s, v.ndim) * (
                t + _bcast(lev.wl, v.ndim) * pv_l + _bcast(lev.wr, v.ndim) * pv_r
            )
        y[self.root_idx] = _bcast(self.root_s, v.ndim) * y[self.root_idx]
        return y

    def dense(self) -> np.ndarray:
        """Dense (N+1)x(N+1) synthesis matrix (tests / small problems only)."""
        n = self.grid.num_nodes
        return self.forward_np(np.eye(n))

    # -------------------------------------------------------------------- jax

    def forward(self, c):
        """JAX synthesis W along axis 0 of ``c`` ((N+1,) or (N+1, m))."""
        import jax.numpy as jnp

        v = jnp.zeros_like(c)
        v = v.at[self.root_idx].set(_bcast(self.root_s, c.ndim) * c[self.root_idx])
        for lev in self.levels:
            interp = 0.5 * (v[lev.pl] + v[lev.pr])
            t = _bcast(lev.s, c.ndim) * c[lev.idx]
            v = v.at[lev.pl].add(_bcast(lev.wl, c.ndim) * t)
            v = v.at[lev.pr].add(_bcast(lev.wr, c.ndim) * t)
            v = v.at[lev.idx].set(t + interp)
        return v

    def adjoint(self, x):
        """JAX transpose W' along axis 0."""
        import jax.numpy as jnp

        y = jnp.asarray(x)
        for lev in reversed(self.levels):
            t = y[lev.idx]
            pv_l = y[lev.pl]
            pv_r = y[lev.pr]
            y = y.at[lev.pl].add(0.5 * t)
            y = y.at[lev.pr].add(0.5 * t)
            y = y.at[lev.idx].set(
                _bcast(lev.s, y.ndim)
                * (t + _bcast(lev.wl, y.ndim) * pv_l + _bcast(lev.wr, y.ndim) * pv_r)
            )
        y = y.at[self.root_idx].multiply(_bcast(self.root_s, y.ndim))
        return y


def _bcast(a: np.ndarray, ndim: int):
    return a.reshape(a.shape + (1,) * (ndim - 1))


def _hat_integrals(t_sorted: np.ndarray) -> np.ndarray:
    """∫ sigma_i for hats on the sorted grid: (d_left + d_right) / 2."""
    d = np.diff(t_sorted)
    out = np.zeros_like(t_sorted)
    out[:-1] += d / 2.0
    out[1:] += d / 2.0
    return out


def _pw_linear_norms(t_loc: np.ndarray, v_loc: np.ndarray) -> tuple[float, float]:
    """(L2 norm^2, H1 seminorm^2) of the pw-linear function with nodal values
    ``v_loc`` at sorted nodes ``t_loc`` (zero outside)."""
    d = np.diff(t_loc)
    a, b = v_loc[:-1], v_loc[1:]
    l2 = np.sum(d / 3.0 * (a * a + a * b + b * b))
    h1 = np.sum((b - a) ** 2 / d)
    return float(l2), float(h1)


def build_wavelet_transform(grid: TimeGrid) -> WaveletTransform:
    """Precompute the transform structure for a (possibly locally refined)
    dyadic time grid."""
    t = grid.t
    nlev = grid.max_level
    N1 = grid.num_nodes
    node_scale = np.zeros(N1)
    node_omega = np.zeros(N1)

    # Level 0: the two hats on the coarsest grid {0, T}.
    root_idx = np.flatnonzero(grid.level == 0).astype(np.int32)
    assert root_idx.size == 2
    T = t[-1] - t[0]
    l2_root = T / 3.0
    root_s = np.full(2, 1.0 / np.sqrt(l2_root))
    node_scale[root_idx] = root_s
    node_omega[root_idx] = root_s * np.sqrt(1.0 / T)

    levels = []
    for j in range(1, nlev + 1):
        present = np.flatnonzero(grid.level <= j)  # already time-sorted
        pos = {int(k): i for i, k in enumerate(present)}
        idx = np.flatnonzero(grid.level == j).astype(np.int32)
        pl = grid.parent_left[idx].astype(np.int32)
        pr = grid.parent_right[idx].astype(np.int32)
        t_present = t[present]
        integ = _hat_integrals(t_present)

        wl = np.empty(idx.size)
        wr = np.empty(idx.size)
        s = np.empty(idx.size)
        for a, (k, l, r) in enumerate(zip(idx, pl, pr)):
            p_k, p_l, p_r = pos[int(k)], pos[int(l)], pos[int(r)]
            assert p_l == p_k - 1 and p_r == p_k + 1, "parents must be grid neighbors"
            wl[a] = -integ[p_k] / (2.0 * integ[p_l])
            wr[a] = -integ[p_k] / (2.0 * integ[p_r])
            # Local support of psi on the level-j grid: [pl-1, pl, k, pr, pr+1].
            lo = max(p_l - 1, 0)
            hi = min(p_r + 1, present.size - 1)
            t_loc = t_present[lo : hi + 1]
            v_loc = np.zeros(t_loc.size)
            v_loc[p_l - lo] = wl[a]
            v_loc[p_k - lo] = 1.0
            v_loc[p_r - lo] = wr[a]
            l2, h1 = _pw_linear_norms(t_loc, v_loc)
            s[a] = 1.0 / np.sqrt(l2)
            node_scale[k] = s[a]
            node_omega[k] = np.sqrt(h1 / l2)
        levels.append(_Level(idx, pl, pr, wl, wr, s))

    level_shift = np.zeros(nlev + 1)
    for j in range(nlev + 1):
        omj = node_omega[grid.level == j]
        level_shift[j] = float(np.median(omj)) if omj.size else 0.0

    perm = np.argsort(grid.level, kind="stable").astype(np.int32)
    counts = np.bincount(grid.level, minlength=nlev + 1).astype(np.int32)
    return WaveletTransform(
        grid=grid,
        levels=tuple(levels),
        root_idx=root_idx,
        root_s=root_s,
        node_level=grid.level.copy(),
        node_omega=node_omega,
        level_shift=level_shift,
        perm_by_level=perm,
        level_counts=counts,
    )
