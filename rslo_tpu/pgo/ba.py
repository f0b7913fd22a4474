"""Windowed bundle adjustment with Schur-complement landmark elimination.

The north-star BA layer (BASELINE.json): poses AND landmarks (voxel-map
points) optimized jointly inside a keyframe window.  The normal system

    [ Hpp  Hpl ] [dp]   [ -gp ]
    [ Hpl' Hll ] [dl] = [ -gl ]

has a block-diagonal landmark block (each landmark's 3x3), so landmarks
are eliminated analytically:

    S  = Hpp - Hpl Hll^-1 Hpl'          (reduced camera system)
    dp = solve(S, -gp + Hpl Hll^-1 gl)
    dl = Hll^-1 (-gl - Hpl' dp)

Everything is static-shape and jitted: observations are (O,) padded
triples (pose idx, landmark idx, measured point in the pose frame,
weight), per-observation Jacobians come from vmapped jacfwd, and the
block assembly is segment-sum scatter-adds.

**Distributed structure**: S and the reduced gradient are SUMS over
landmarks, so the observation/landmark set shards over the mesh "data"
axis — each device assembles its partial (S, g) from its landmark shard,
one psum builds the global reduced system, every device solves the
(small, replicated) pose system, and back-substitution is local.  See
:func:`solve_ba_sharded`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import qexp, qmult, qnormalize, rotate_vec_by_q, \
    invert_pose

HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """poses: (W, 7) initial world-from-frame poses [t, q].
    landmarks: (K, 3) initial world positions.
    obs_pose: (O,) int32; obs_lm: (O,) int32.
    obs_xyz: (O, 3) measured landmark position in the pose's frame.
    obs_w: (O,) scalar weights (0 disables an observation) OR
      (O, 3, 3) square-root information blocks W = chol(Sigma^-1)' —
      the full 3D error model (rslo/core/losses.py:422-437 semantics):
      residuals/Jacobians are whitened r' = W r so r''r' = r' Sigma^-1 r.
    anchor: (W,) bool poses held fixed (gauge)."""
    poses: jax.Array
    landmarks: jax.Array
    obs_pose: jax.Array
    obs_lm: jax.Array
    obs_xyz: jax.Array
    obs_w: jax.Array
    anchor: jax.Array


def _retract_pose(pose, d6):
    t = pose[:3] + d6[:3]
    q = qnormalize(qmult(pose[3:], qexp(0.5 * d6[3:])))
    return jnp.concatenate([t, q])


def _obs_residual(pose, lm, meas):
    """Landmark in the pose frame minus measurement: T^-1 l - z."""
    inv = invert_pose(pose[None])[0]
    pred = rotate_vec_by_q((lm - pose[:3])[None],
                           jnp.concatenate([pose[3:4], -pose[4:]])[None]
                           )[0]
    return pred - meas


def _linearize(problem: BAProblem):
    """Per-observation residuals + Jacobians at zero local coords.

    Returns r (O, 3), Jp (O, 3, 6), Jl (O, 3, 3), weighted."""
    poses = problem.poses[problem.obs_pose]        # (O, 7)
    lms = problem.landmarks[problem.obs_lm]        # (O, 3)

    def res_fn(dp, dl, pose, lm, meas):
        return _obs_residual(_retract_pose(pose, dp), lm + dl, meas)

    z6 = jnp.zeros((6,))
    z3 = jnp.zeros((3,))

    def one(pose, lm, meas):
        r = res_fn(z6, z3, pose, lm, meas)
        Jp = jax.jacfwd(res_fn, argnums=0)(z6, z3, pose, lm, meas)
        Jl = jax.jacfwd(res_fn, argnums=1)(z6, z3, pose, lm, meas)
        return r, Jp, Jl

    r, Jp, Jl = jax.vmap(one)(poses, lms, problem.obs_xyz)
    if problem.obs_w.ndim == 3:
        # full-covariance whitening: (O,3,3) sqrt-information blocks
        Wm = problem.obs_w
        r = jnp.einsum('oab,ob->oa', Wm, r, precision=HI)
        Jp = jnp.einsum('oab,obj->oaj', Wm, Jp, precision=HI)
        Jl = jnp.einsum('oab,obj->oaj', Wm, Jl, precision=HI)
        return r, Jp, Jl
    w = problem.obs_w[:, None]
    return r * w, Jp * w[..., None], Jl * w[..., None]


def _assemble(problem: BAProblem, r, Jp, Jl):
    """Blocks of the normal equations via segment scatter-adds."""
    W = problem.poses.shape[0]
    K = problem.landmarks.shape[0]
    # Hpp blocks (per pose) and gp
    HppO = jnp.einsum('oai,oaj->oij', Jp, Jp, precision=HI)   # (O,6,6)
    gpO = jnp.einsum('oai,oa->oi', Jp, r, precision=HI)       # (O,6)
    Hpp = jnp.zeros((W, 6, 6)).at[problem.obs_pose].add(HppO)
    gp = jnp.zeros((W, 6)).at[problem.obs_pose].add(gpO)
    # Hll blocks (per landmark) and gl
    HllO = jnp.einsum('oai,oaj->oij', Jl, Jl, precision=HI)   # (O,3,3)
    glO = jnp.einsum('oai,oa->oi', Jl, r, precision=HI)
    Hll = jnp.zeros((K, 3, 3)).at[problem.obs_lm].add(HllO)
    gl = jnp.zeros((K, 3)).at[problem.obs_lm].add(glO)
    return Hpp, gp, Hll, gl


def _reduced_system(problem: BAProblem, r, Jp, Jl, damping):
    """Schur complement pieces. Returns (S (6W,6W), rhs (6W,), Hll_inv,
    gl, obs->blocks needed for back-substitution)."""
    W = problem.poses.shape[0]
    K = problem.landmarks.shape[0]
    Hpp, gp, Hll, gl = _assemble(problem, r, Jp, Jl)
    Hll = Hll + damping * jnp.eye(3)
    from ..losses.consistency import inv3x3
    Hll_inv, _ = inv3x3(Hll, eps=1e-9)

    # Hpl exists per observation: contribution (pose i, lm j):
    # S -= (Jp' Jl)_o  Hll_inv_j  (Jl' Jp)_o'  aggregated per (i, i')
    # pairs sharing landmark j.  We aggregate per landmark: for lm j,
    # B_j(i) = sum_{o: lm=j, pose=i} Jp_o' Jl_o  (6x3); then
    # S -= B_j Hll_inv_j B_j'.  Assemble B as (K, W, 6, 3) is too big
    # for large K*W; instead accumulate per-landmark in a scan over a
    # segment layout: here W is small (<=64) so (K, W6, 3) is fine for
    # K up to ~8k per shard.
    HplO = jnp.einsum('oai,oaj->oij', Jp, Jl, precision=HI)   # (O,6,3)
    B = jnp.zeros((K, W, 6, 3)).at[problem.obs_lm,
                                   problem.obs_pose].add(HplO)
    B = B.reshape(K, W * 6, 3)
    # S_full = blockdiag(Hpp) - sum_j B_j Hll_inv_j B_j'
    S = jnp.zeros((W * 6, W * 6))
    ii = jnp.arange(W)
    S = S.reshape(W, 6, W, 6).at[ii, :, ii, :].add(Hpp).reshape(W * 6,
                                                                W * 6)
    corr = jnp.einsum('kab,kbc,kdc->ad', B, Hll_inv, B, precision=HI)
    S = S - corr
    rhs = -gp.reshape(W * 6) + jnp.einsum(
        'kab,kbc,kc->a', B, Hll_inv, gl, precision=HI)
    return S, rhs, Hll_inv, gl, B


def ba_step(problem: BAProblem, damping: float = 1e-4):
    """One Gauss-Newton step with Schur elimination.  Returns updated
    problem + cost before the step."""
    r, Jp, Jl = _linearize(problem)
    cost = jnp.sum(r * r)
    W = problem.poses.shape[0]
    S, rhs, Hll_inv, gl, B = _reduced_system(problem, r, Jp, Jl, damping)
    anchor6 = jnp.repeat(problem.anchor, 6)
    free = ~anchor6
    S = jnp.where(free[:, None] & free[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free, damping, 1.0))
    rhs = jnp.where(free, rhs, 0.0)
    L = jax.scipy.linalg.cho_factor(S + 1e-9 * jnp.eye(W * 6))
    dp = jax.scipy.linalg.cho_solve(L, rhs)                   # (6W,)
    # back-substitute landmarks: dl_j = Hll_inv_j (-gl_j - B_j' dp)
    dl = jnp.einsum('kbc,kc->kb', Hll_inv,
                    -gl - jnp.einsum('kab,a->kb', B, dp, precision=HI),
                    precision=HI)
    new_poses = jax.vmap(_retract_pose)(problem.poses,
                                        dp.reshape(W, 6))
    new_lms = problem.landmarks + dl
    return problem._replace(poses=new_poses, landmarks=new_lms), cost


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_ba(problem: BAProblem, iters: int = 5, damping: float = 1e-4):
    def body(_, carry):
        p, _ = carry
        return ba_step(p, damping)
    p, cost = jax.lax.fori_loop(0, iters, body,
                                (problem, jnp.float32(0.0)))
    r, _, _ = _linearize(p)
    return p, jnp.sum(r * r)


def solve_ba_sharded(problem: BAProblem, mesh, iters: int = 5,
                     damping: float = 1e-4):
    """Distributed variant: landmarks + observations sharded over the
    mesh "data" axis; the reduced camera system is psum-assembled and
    solved replicated; landmark back-substitution is shard-local.

    The landmark/observation arrays must be pre-sharded so each device's
    observations reference only its landmark shard (obs_lm indices are
    LOCAL to the shard).  Poses and anchors are replicated.
    """
    from jax.sharding import PartitionSpec as P

    W = problem.poses.shape[0]

    def device_solve(poses, anchor, landmarks, obs_pose, obs_lm,
                     obs_xyz, obs_w):
        # poses/anchor arrive replicated with a leading device axis;
        # landmark/observation arrays arrive as the LOCAL shard.
        local = BAProblem(poses[0], landmarks, obs_pose, obs_lm,
                          obs_xyz, obs_w, anchor[0])

        def body(_, carry):
            prob, _c = carry
            r, Jp, Jl = _linearize(prob)
            cost = jax.lax.psum(jnp.sum(r * r), "data")
            S, rhs, Hll_inv, gl, B = _reduced_system(prob, r, Jp, Jl,
                                                     damping)
            S = jax.lax.psum(S, "data")
            rhs = jax.lax.psum(rhs, "data")
            anchor6 = jnp.repeat(prob.anchor, 6)
            free = ~anchor6
            S = jnp.where(free[:, None] & free[None, :], S, 0.0)
            S = S + jnp.diag(jnp.where(free, damping, 1.0))
            rhs = jnp.where(free, rhs, 0.0)
            L = jax.scipy.linalg.cho_factor(S + 1e-9 * jnp.eye(W * 6))
            dp = jax.scipy.linalg.cho_solve(L, rhs)
            dl = jnp.einsum(
                'kbc,kc->kb', Hll_inv,
                -gl - jnp.einsum('kab,a->kb', B, dp, precision=HI),
                precision=HI)
            new_poses = jax.vmap(_retract_pose)(prob.poses,
                                                dp.reshape(W, 6))
            return (prob._replace(poses=new_poses,
                                  landmarks=prob.landmarks + dl), cost)

        prob, cost = jax.lax.fori_loop(0, iters, body,
                                       (local, jnp.float32(0.0)))
        return (prob.poses[None], prob.landmarks, cost[None])

    fn = jax.shard_map(
        device_solve, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                  P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False)
    D = mesh.devices.size
    poses_r = jnp.broadcast_to(problem.poses[None],
                               (D,) + problem.poses.shape)
    anchor_r = jnp.broadcast_to(problem.anchor[None],
                                (D,) + problem.anchor.shape)
    out_poses, out_lms, cost = jax.jit(fn)(
        poses_r, anchor_r, problem.landmarks, problem.obs_pose,
        problem.obs_lm, problem.obs_xyz, problem.obs_w)
    return out_poses[0], out_lms.reshape(-1, 3), cost[0]
