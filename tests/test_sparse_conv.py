"""Sparse conv engine vs dense numpy oracles on tiny grids."""
import numpy as np
import pytest
import jax.numpy as jnp

from rslo_tpu.ops import sparse_conv as sc

SHAPE = (5, 6, 7)  # (nz, ny, nx)


def random_level(rng, n_active=30, cap=48, shape=SHAPE):
    nz, ny, nx = shape
    all_ids = rng.choice(nz * ny * nx, size=n_active, replace=False)
    coords = np.stack([all_ids // (ny * nx), (all_ids // nx) % ny,
                       all_ids % nx], -1).astype(np.int32)
    pad = np.zeros((cap - n_active, 3), np.int32)
    mask = np.zeros(cap, bool)
    mask[:n_active] = True
    level = sc.level_from_coords(jnp.asarray(np.concatenate([coords, pad])),
                                 jnp.asarray(mask), shape)
    feats = rng.normal(size=(cap, 4)).astype(np.float32)
    feats[~np.asarray(level.mask)] = 0
    return level, jnp.asarray(feats)


def dense_of(level, feats):
    d = np.zeros(level.shape + (feats.shape[-1],), np.float32)
    c = np.asarray(level.coords)
    m = np.asarray(level.mask)
    f = np.asarray(feats)
    d[c[m, 0], c[m, 1], c[m, 2]] = f[m]
    return d


def dense_conv(dense, w, stride=(1, 1, 1), pad=(1, 1, 1), active=None):
    """Plain dense 3D conv oracle; `active` is a bool mask of input sites
    (submanifold convs only read/write active sites)."""
    K = w.shape[0]
    k = round(K ** (1 / 3))
    kz = ky = kx = k
    nz, ny, nx = dense.shape[:3]
    oz = (nz + 2 * pad[0] - kz) // stride[0] + 1
    oy = (ny + 2 * pad[1] - ky) // stride[1] + 1
    ox = (nx + 2 * pad[2] - kx) // stride[2] + 1
    out = np.zeros((oz, oy, ox, w.shape[-1]), np.float32)
    for z in range(oz):
        for y in range(oy):
            for x in range(ox):
                for d, (dz, dy, dx) in enumerate(
                        np.ndindex(kz, ky, kx)):
                    iz = z * stride[0] + dz - pad[0]
                    iy = y * stride[1] + dy - pad[1]
                    ix = x * stride[2] + dx - pad[2]
                    if 0 <= iz < nz and 0 <= iy < ny and 0 <= ix < nx:
                        if active is not None and not active[iz, iy, ix]:
                            continue
                        out[z, y, x] += dense[iz, iy, ix] @ w[d]
    return out


def test_submanifold_conv_matches_dense(rng):
    level, feats = random_level(rng)
    w = rng.normal(size=(27, 4, 5)).astype(np.float32)
    rb = sc.build_submanifold_index(level)
    out = np.asarray(sc.sparse_conv_apply(feats, rb, jnp.asarray(w),
                                          out_mask=level.mask))
    dense = dense_of(level, feats)
    active = dense_of(level, jnp.ones((level.capacity, 1)))[..., 0] > 0
    want = dense_conv(dense, w, active=active)
    c = np.asarray(level.coords)
    m = np.asarray(level.mask)
    np.testing.assert_allclose(out[m], want[c[m, 0], c[m, 1], c[m, 2]],
                               atol=1e-4)
    # padded rows must stay zero
    assert np.all(out[~m] == 0)


def test_downsample_sites_match_dense(rng):
    level, feats = random_level(rng)
    out_level = sc.downsample_level(level, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                    out_capacity=64)
    dense = dense_of(level, jnp.ones((level.capacity, 1)))
    occupancy = dense_conv(dense, np.ones((27, 1, 1), np.float32),
                           stride=(2, 2, 2))[..., 0]
    want_active = np.argwhere(occupancy > 0)
    got = np.asarray(out_level.coords)[np.asarray(out_level.mask)]
    got_set = {tuple(r) for r in got}
    want_set = {tuple(r) for r in want_active}
    assert got_set == want_set


def test_strided_conv_matches_dense(rng):
    level, feats = random_level(rng)
    w = rng.normal(size=(27, 4, 5)).astype(np.float32)
    out_level = sc.downsample_level(level, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                    out_capacity=64)
    rb = sc.build_conv_index(level, out_level, (3, 3, 3), (2, 2, 2),
                             (1, 1, 1))
    out = np.asarray(sc.sparse_conv_apply(feats, rb, jnp.asarray(w),
                                          out_mask=out_level.mask))
    dense = dense_of(level, feats)
    want = dense_conv(dense, w, stride=(2, 2, 2))
    c = np.asarray(out_level.coords)
    m = np.asarray(out_level.mask)
    np.testing.assert_allclose(out[m], want[c[m, 0], c[m, 1], c[m, 2]],
                               atol=1e-4)


def test_anisotropic_strided_conv(rng):
    """The z-collapse conv: kernel (3,1,1), stride (2,1,1), pad 0."""
    level, feats = random_level(rng)
    w = rng.normal(size=(3, 4, 5)).astype(np.float32)
    out_level = sc.downsample_level(level, (3, 1, 1), (2, 1, 1), (0, 0, 0),
                                    out_capacity=64)
    rb = sc.build_conv_index(level, out_level, (3, 1, 1), (2, 1, 1),
                             (0, 0, 0))
    out = np.asarray(sc.sparse_conv_apply(feats, rb, jnp.asarray(w),
                                          out_mask=out_level.mask))
    dense = dense_of(level, feats)
    # oracle with explicit anisotropic loop
    nz, ny, nx = SHAPE
    oz = (nz - 3) // 2 + 1
    want = np.zeros((oz, ny, nx, 5), np.float32)
    for z in range(oz):
        for dz in range(3):
            want[z] += dense[z * 2 + dz] @ w[dz]
    c = np.asarray(out_level.coords)
    m = np.asarray(out_level.mask)
    np.testing.assert_allclose(out[m], want[c[m, 0], c[m, 1], c[m, 2]],
                               atol=1e-4)


def test_inverse_conv_roundtrip_sites(rng):
    """Inverse conv must produce features at exactly the fine sites, fed
    from the coarse level like a transposed conv."""
    fine, _ = random_level(rng)
    coarse = sc.downsample_level(fine, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                 out_capacity=64)
    cf = rng.normal(size=(64, 4)).astype(np.float32)
    cf[~np.asarray(coarse.mask)] = 0
    w = rng.normal(size=(27, 4, 3)).astype(np.float32)
    rb = sc.build_inverse_index(coarse, fine, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    out = np.asarray(sc.sparse_conv_apply(jnp.asarray(cf), rb, jnp.asarray(w),
                                          out_mask=fine.mask))
    # oracle: for each fine site f and tap d, c=(f+p-d)/s
    cd = dense_of(coarse, jnp.asarray(cf))
    fc = np.asarray(fine.coords)
    fm = np.asarray(fine.mask)
    for row in np.argwhere(fm)[:10]:
        f = fc[row[0]]
        acc = np.zeros(3, np.float32)
        for d, (dz, dy, dx) in enumerate(np.ndindex(3, 3, 3)):
            num = f + np.array([1, 1, 1]) - np.array([dz, dy, dx])
            if np.any(num % 2):
                continue
            c = num // 2
            if np.all(c >= 0) and np.all(c < coarse.shape):
                acc += cd[c[0], c[1], c[2]] @ w[d]
        np.testing.assert_allclose(out[row[0]], acc, atol=1e-4)


def test_to_dense_scatter(rng):
    level, feats = random_level(rng)
    d = np.asarray(sc.to_dense(feats, level))
    np.testing.assert_allclose(d, dense_of(level, feats), atol=1e-6)


def test_ranked_lookup_matches_slot_map(rng):
    """_lookup_ranked (windowed compare-reduce ranks) is bit-equal to
    the slot-map lookup across subm/down/inverse rulebooks — including
    when a tiny window forces the stray-fallback binary search."""
    level, _ = random_level(rng, n_active=40, cap=64)
    level_sm = sc.with_slot_map(level)
    for kind in ("subm", "down", "inv"):
        if kind == "subm":
            a = sc.build_submanifold_index(level_sm)
            b = sc.build_submanifold_index(level, lookup="ranked")
        elif kind == "down":
            out = sc.downsample_level(level, (3, 3, 3), (2, 2, 2),
                                      (1, 1, 1), out_capacity=48)
            a = sc.build_conv_index(level_sm, out, (3, 3, 3), (2, 2, 2),
                                    (1, 1, 1))
            b = sc.build_conv_index(level, out, (3, 3, 3), (2, 2, 2),
                                    (1, 1, 1), lookup="ranked")
        else:
            coarse = sc.with_slot_map(sc.downsample_level(
                level, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_capacity=48))
            a = sc.build_inverse_index(coarse, level_sm, (3, 3, 3),
                                       (2, 2, 2), (1, 1, 1))
            b = sc.build_inverse_index(
                coarse.replace(slot_map=None), level_sm, (3, 3, 3),
                (2, 2, 2), (1, 1, 1), lookup="ranked")
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid), err_msg=kind)
        # idx only meaningful where valid
        va = np.asarray(a.valid)
        np.testing.assert_array_equal(np.asarray(a.idx)[va],
                                      np.asarray(b.idx)[va], err_msg=kind)


def test_ranked_lookup_stray_fallback(rng):
    """Force strays (window smaller than the id spread) and check the
    compact binary-search fallback keeps the result exact."""
    level, _ = random_level(rng, n_active=40, cap=64)
    q = sc.linearize(level.coords[:, None, :] +
                     jnp.asarray([[0, 0, 0], [1, 1, 1], [-1, 0, 1],
                                  [2, -2, 0]], jnp.int32)[None],
                     level.shape)
    inb = (q >= 0) & (q < level.sentinel) & level.mask[:, None]
    ia, fa = sc._lookup(sc.with_slot_map(level), q, inb)
    ib, fb = sc._lookup_ranked(level, q, inb, block=8, win=16)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    m = np.asarray(fa)
    np.testing.assert_array_equal(np.asarray(ia)[m], np.asarray(ib)[m])


@pytest.mark.slow
def test_geometry_ranked_matches_slot_map(rng):
    """Full build_geometry with lookup='ranked' reproduces every
    rulebook of the slot-map build bit-exactly."""
    from rslo_tpu.models.middle import build_geometry
    shape = (25, 16, 16)  # z >= 25: the 4-stage downsample needs L3 z>=3
    level, _ = random_level(rng, n_active=160, cap=192, shape=shape)
    caps = (192, 128, 96, 64)
    ga = build_geometry(level.coords, level.mask, shape, caps)
    gb = build_geometry(level.coords, level.mask, shape, caps,
                        lookup="ranked")
    for name in ("sub_rb", "down_rb", "inv_rb"):
        for i, (a, b) in enumerate(zip(getattr(ga, name),
                                       getattr(gb, name))):
            np.testing.assert_array_equal(
                np.asarray(a.valid), np.asarray(b.valid),
                err_msg=f"{name}[{i}]")
            m = np.asarray(a.valid)
            np.testing.assert_array_equal(
                np.asarray(a.idx)[m], np.asarray(b.idx)[m],
                err_msg=f"{name}[{i}]")


def test_downsample_scatter_matches_sort():
    """Sort-free dense-occupancy downsample must produce the identical
    sorted level as the sort-based one (ids, coords, mask), for both
    stride patterns used by the middle net."""
    rng = np.random.default_rng(7)
    for shape, k, s, p in (((9, 24, 24), (3, 3, 3), (2, 2, 2), (1, 1, 1)),
                           ((9, 24, 24), (3, 3, 3), (2, 2, 2), (0, 1, 1)),
                           ((9, 12, 12), (3, 1, 1), (2, 1, 1), (0, 0, 0))):
        n = 300
        ids = np.sort(rng.choice(np.prod(shape), size=n, replace=False))
        z = ids // (shape[1] * shape[2])
        y = (ids // shape[2]) % shape[1]
        x = ids % shape[2]
        coords = np.concatenate([np.stack([z, y, x], -1),
                                 np.full((50, 3), -1)]).astype(np.int32)
        mask = np.concatenate([np.ones(n, bool), np.zeros(50, bool)])
        lvl = sc.level_from_coords(jnp.asarray(coords),
                                   jnp.asarray(mask), shape)
        a = sc.downsample_level(lvl, k, s, p, out_capacity=512)
        b = sc.downsample_level_scatter(lvl, k, s, p, out_capacity=512)
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_array_equal(np.asarray(a.coords),
                                      np.asarray(b.coords))
        np.testing.assert_array_equal(np.asarray(a.mask),
                                      np.asarray(b.mask))
        assert a.shape == b.shape


def test_ranked_lookup_stray_drop_no_collision(rng):
    """ADVICE r3 medium: when rows % block == 0 (npad == n) and the
    FINAL (row, tap) query is a live stray, dead fallback entries used
    to clamp onto index npad-1 and race the live write (duplicate-index
    scatter order is undefined).  The mode='drop' scatter must keep the
    last stray resolved exactly."""
    level, _ = random_level(rng, n_active=32, cap=32)  # mask all-valid
    rows = 8
    # one tap per row, K=1: query the 8 LARGEST ids from the last rows,
    # so with a tiny window the final query is guaranteed a stray
    q = level.ids[-rows:][:, None].astype(jnp.int32)
    # decode back to coords-free direct id queries (already linearized)
    valid = jnp.ones((rows, 1), bool)
    ia, fa = sc._lookup(sc.with_slot_map(level), q, valid)
    ib, fb = sc._lookup_ranked(level, q, valid, block=rows, win=4)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    assert bool(np.asarray(fb)[-1, 0]), "final stray lost (collision)"
    m = np.asarray(fa)
    np.testing.assert_array_equal(np.asarray(ia)[m], np.asarray(ib)[m])


def test_ranked_lookup_stray_guard_and_validation(rng, monkeypatch):
    """Env-gated stray-saturation raise (global cap, ADVICE r3) and
    plan_lookup method validation."""
    import pytest
    level, _ = random_level(rng, n_active=32, cap=32)
    q = level.ids[-16:][:, None].astype(jnp.int32)
    valid = jnp.ones((16, 1), bool)
    monkeypatch.setenv("RSLO_BAND_CHECK", "1")
    with pytest.raises(Exception, match="stray overflow"):
        i, f = sc._lookup_ranked(level, q, valid, block=16, win=4,
                                 stray_capacity=2)
        np.asarray(f)
    # within capacity: guard passes, result exact
    i, f = sc._lookup_ranked(level, q, valid, block=16, win=4,
                             stray_capacity=64)
    assert np.asarray(f).all()
    with pytest.raises(ValueError, match="plan_lookup"):
        sc._dispatch_lookup(level, q, valid, "rankd")


def test_planes_builders_match_generic(rng):
    """Plane-derived rulebooks (one rank lookup per (dz,dy) plane,
    x-taps from id adjacency) are bit-equal to the generic builders
    for both rank methods, on random levels."""
    for trial in range(3):
        level, _ = random_level(rng, n_active=40, cap=64)
        level_sm = sc.with_slot_map(level)
        a = sc.build_submanifold_index(level_sm)
        out = sc.downsample_level(level, (3, 3, 3), (2, 2, 2),
                                  (1, 1, 1), out_capacity=48)
        ad = sc.build_conv_index(level_sm, out, (3, 3, 3), (2, 2, 2),
                                 (1, 1, 1))
        for rm in ("ranked", "sorted", "slot"):
            if rm == "slot":
                b = sc.build_submanifold_index_slot_planes(level_sm)
            else:
                b = sc.build_submanifold_index_planes(level,
                                                      rank_method=rm)
            np.testing.assert_array_equal(np.asarray(a.valid),
                                          np.asarray(b.valid),
                                          err_msg=f"subm/{rm}")
            va = np.asarray(a.valid)
            np.testing.assert_array_equal(np.asarray(a.idx)[va],
                                          np.asarray(b.idx)[va],
                                          err_msg=f"subm/{rm}")
            if rm == "slot":
                bd = sc.build_conv_index_slot_planes(
                    level_sm, out, (3, 3, 3), (2, 2, 2), (1, 1, 1))
            else:
                bd = sc.build_conv_index_planes(level, out, (3, 3, 3),
                                                (2, 2, 2), (1, 1, 1),
                                                rank_method=rm)
            np.testing.assert_array_equal(np.asarray(ad.valid),
                                          np.asarray(bd.valid),
                                          err_msg=f"down/{rm}")
            vd = np.asarray(ad.valid)
            np.testing.assert_array_equal(np.asarray(ad.idx)[vd],
                                          np.asarray(bd.idx)[vd],
                                          err_msg=f"down/{rm}")


def test_planes_row_wrap_no_false_positive():
    """The x-adjacency derivation must NOT match across row boundaries:
    ids (z, y, nx-1) and (z, y+1, 0) are consecutive in linearized space
    but are not x-neighbors — the x-bound masks reject them."""
    shape = (3, 4, 5)
    nz, ny, nx = shape
    coords = np.array([[1, 1, nx - 1],   # row end
                       [1, 2, 0],        # next row start: id = prev + 1
                       [1, 3, nx - 1],
                       [2, 0, 0]],       # plane wrap: also id-adjacent
                      np.int32)
    cap = 8
    pad = np.zeros((cap - len(coords), 3), np.int32)
    mask = np.zeros(cap, bool)
    mask[:len(coords)] = True
    level = sc.level_from_coords(
        jnp.asarray(np.concatenate([coords, pad])), jnp.asarray(mask),
        shape)
    a = sc.build_submanifold_index(sc.with_slot_map(level))
    for rm in ("ranked", "sorted", "slot"):
        if rm == "slot":
            b = sc.build_submanifold_index_slot_planes(
                sc.with_slot_map(level))
        else:
            b = sc.build_submanifold_index_planes(level, rank_method=rm)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid), err_msg=rm)
        va = np.asarray(a.valid)
        np.testing.assert_array_equal(np.asarray(a.idx)[va],
                                      np.asarray(b.idx)[va], err_msg=rm)


@pytest.mark.slow
def test_geometry_planes_matches_slot_map(rng):
    """Full build_geometry with the plane-derived lookups reproduces the
    slot-map build bit-exactly (all rulebooks, all levels)."""
    from rslo_tpu.models.middle import build_geometry
    shape = (25, 16, 16)
    level, _ = random_level(rng, n_active=160, cap=192, shape=shape)
    caps = (192, 128, 96, 64)
    ga = build_geometry(level.coords, level.mask, shape, caps)
    for lk in ("ranked_planes", "sorted_planes", "slot_planes"):
        gb = build_geometry(level.coords, level.mask, shape, caps,
                            lookup=lk)
        for name in ("sub_rb", "down_rb", "inv_rb"):
            for i, (a, b) in enumerate(zip(getattr(ga, name),
                                           getattr(gb, name))):
                np.testing.assert_array_equal(
                    np.asarray(a.valid), np.asarray(b.valid),
                    err_msg=f"{lk}/{name}[{i}]")
                m = np.asarray(a.valid)
                np.testing.assert_array_equal(
                    np.asarray(a.idx)[m], np.asarray(b.idx)[m],
                    err_msg=f"{lk}/{name}[{i}]")


def test_plane_apply_matches_row_apply(rng):
    """sparse_conv_apply_planes must be bit-equal to sparse_conv_apply
    on every kx==3 rulebook kind (subm, strided down, inverse) — the
    plane window property (valid x-taps within 4 sorted rows) holds by
    construction; this also exercises the clipped edges."""
    level, feats = random_level(rng, n_active=40, cap=64)
    level = sc.with_slot_map(level)
    w27 = jnp.asarray(rng.normal(size=(27, 4, 5)).astype(np.float32))
    coarse = sc.downsample_level(level, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                 out_capacity=32)
    coarse = sc.with_slot_map(coarse)
    cfeats = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    cfeats = jnp.where(coarse.mask[:, None], cfeats, 0)
    books = [
        (sc.build_submanifold_index(level), feats, level.mask),
        (sc.build_conv_index(level, coarse, (3, 3, 3), (2, 2, 2),
                             (1, 1, 1)), feats, coarse.mask),
        (sc.build_inverse_index(coarse, level, (3, 3, 3), (2, 2, 2),
                                (1, 1, 1)), cfeats, level.mask),
    ]
    for rb, f, om in books:
        for cdt in (jnp.float32, jnp.bfloat16):
            a = np.asarray(sc.sparse_conv_apply(
                f, rb, w27, out_mask=om, compute_dtype=cdt))
            b = np.asarray(sc.sparse_conv_apply_planes(
                f, rb, w27, out_mask=om, compute_dtype=cdt))
            np.testing.assert_array_equal(a, b)


def test_plane_apply_middle_forward_equal(rng):
    """SparseMiddleCov forward with plane_apply on == off (the z-collapse
    3-tap conv stays on the row path either way)."""
    import dataclasses
    import jax
    from rslo_tpu.config.schema import PipelineCfg
    from rslo_tpu.models.middle import SparseMiddleCov, build_geometry

    cfg = PipelineCfg().middle
    cfg = dataclasses.replace(
        cfg, name="SparseMiddleCov", engine="rulebook",
        level_capacities=(256, 256, 128, 64), channels=(4, 4, 4, 4),
        conv_dtype="f32")
    shape = (25, 16, 16)
    level, _ = random_level(rng, n_active=160, cap=256, shape=shape)
    geo = build_geometry(level.coords, level.mask, shape,
                         cfg.level_capacities)
    feats = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32))
    feats = jnp.where(geo.levels[0].mask[:, None], feats, 0)
    outs = []
    for pa in (False, True):
        mid = SparseMiddleCov(dataclasses.replace(cfg, plane_apply=pa))
        var = mid.init(jax.random.PRNGKey(0), feats, geo, False)
        outs.append(mid.apply(var, feats, geo, False))
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
    np.testing.assert_array_equal(np.asarray(outs[0][1]),
                                  np.asarray(outs[1][1]))
