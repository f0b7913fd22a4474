"""Data layer: HDF5 store roundtrip, window dataset, loader, augment."""
import numpy as np
import pytest

from rslo_tpu.config.schema import DataCfg
from rslo_tpu.data.augment import flip_odometry, random_flip_y
from rslo_tpu.data.loader import DataLoader, TrainSampler, collate, pad_points
from rslo_tpu import geometry as G


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    """Synthesize a minimal KITTI tree (2 sequences x 8 frames) and build
    the HDF5 store from it."""
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(0)
    for seq in (0, 1):
        seq_dir = root / "sequences" / f"{seq:02d}"
        (seq_dir / "velodyne").mkdir(parents=True)
        (root / "poses").mkdir(exist_ok=True)
        with open(seq_dir / "calib.txt", "w") as f:
            P = "7.1e+02 0 6.0e+02 0 0 7.1e+02 1.8e+02 0 0 0 1 0"
            for k in ("P0", "P1", "P2", "P3"):
                f.write(f"{k}: {P}\n")
            f.write("Tr: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
        poses = []
        for i in range(8):
            pts = rng.uniform(-10, 10, size=(512, 4)).astype(np.float32)
            pts[:, 3] = rng.uniform(0, 1, 512)
            pts.tofile(seq_dir / "velodyne" / f"{i:06d}.bin")
            T = np.eye(4)[:3]
            T[0, 3] = 0.1 * i  # camera x translation
            poses.append(T.reshape(-1))
        np.savetxt(root / "poses" / f"{seq:02d}.txt", np.stack(poses))
    out = root / "all.h5"
    from rslo_tpu.data.hdf5_store import create_hdf5
    create_hdf5(str(root), str(out), sequences=(0, 1), progress=False)
    return str(out)


def test_hdf5_roundtrip(mini_kitti):
    from rslo_tpu.data.hdf5_store import SequenceReader
    r = SequenceReader(mini_kitti, 0)
    assert r.n_frames == 8
    fr = r.frame(3)
    assert fr["points"].shape[1] == 7
    # normals unit-length
    nn = np.linalg.norm(fr["points"][:, 4:7], axis=1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-4)
    assert "hier_lidar_points_normals_0.1" in fr


def test_window_dataset(mini_kitti):
    cfg = DataCfg(root=mini_kitti, seq_length=3, skip=1,
                  train_sequences=(0, 1), val_sequences=(0,))
    from rslo_tpu.data.dataset import KittiWindowDataset
    ds = KittiWindowDataset(cfg, "train")
    assert len(ds) == 2 * (8 - 2)
    s = ds[0]
    assert len(s["points"]) == 3
    assert s["odometry"].shape == (3, 7)
    # camera x translation maps to lidar frame via Tr: cam x = -lidar y
    vo01 = s["odometry"][0]
    np.testing.assert_allclose(np.abs(vo01[:3]).max(), 0.1, atol=1e-5)
    # quaternions hemisphere-normalized identity
    np.testing.assert_allclose(vo01[3], 1.0, atol=1e-5)


def test_flip_odometry_involution(rng):
    odom = np.concatenate([rng.normal(size=3),
                           np.asarray(G.qnormalize(
                               np.float32(rng.normal(size=4))))]).astype(
                                   np.float32)
    odom[3:] *= np.sign(odom[3])
    twice = flip_odometry(flip_odometry(odom))
    np.testing.assert_allclose(twice, odom, atol=1e-5)


def test_random_flip_consistency(rng):
    """Flipped points + flipped odometry must remain geometrically
    consistent: transform(flip(p)) == flip(transform(p))."""
    pts = rng.normal(size=(64, 7)).astype(np.float32)
    pose = np.concatenate([rng.normal(size=3) * 0.1,
                           np.asarray(G.qexp(np.float32(
                               rng.normal(size=3) * 0.1)))]).astype(
                                   np.float32)
    sample = {"points": [pts.copy(), pts.copy()],
              "odometry": np.stack([pose])}

    class AlwaysFlip:
        def random(self):
            return 1.0
    flipped = random_flip_y({"points": [p.copy() for p in sample["points"]],
                             "odometry": sample["odometry"].copy()},
                            AlwaysFlip())
    F = np.diag([1., -1., 1.])
    xyz = pts[:, :3]
    want = (F @ np.asarray(G.transform_points(
        pose, xyz)).T).T
    got = np.asarray(G.transform_points(flipped["odometry"][0],
                                        (F @ xyz.T).T))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pad_points_and_collate(rng):
    cfg = DataCfg(max_points=128)
    p, m = pad_points(rng.normal(size=(100, 7)).astype(np.float32), 128)
    assert m.sum() == 100 and p.shape == (128, 7)
    p2, m2 = pad_points(rng.normal(size=(300, 7)).astype(np.float32), 128)
    assert m2.all()
    samples = [{"points": [rng.normal(size=(50, 7)).astype(np.float32)
                           for _ in range(2)],
                "odometry": np.zeros((1, 7), np.float32),
                "seq": 0, "frames": (0, 1)} for _ in range(3)]
    batch = collate(samples, cfg)
    assert batch["points"].shape == (3, 2, 128, 7)
    assert batch["point_mask"].sum() == 3 * 2 * 50


def test_train_sampler_resumes():
    s1 = iter(TrainSampler(10, 100, 2, seed=5))
    first = [next(s1) for _ in range(8)]
    s2 = iter(TrainSampler(10, 100, 2, seed=5, last_iter=1))
    resumed = [next(s2) for _ in range(4)]
    assert first[4:8] == resumed


def test_dataloader_stream(mini_kitti):
    cfg = DataCfg(root=mini_kitti, seq_length=2, max_points=1024,
                  train_sequences=(0,), val_sequences=(1,))
    from rslo_tpu.data.dataset import KittiWindowDataset
    ds = KittiWindowDataset(cfg, "train")
    dl = DataLoader(ds, cfg, device_batch=2, total_steps=3, train=True)
    batches = []
    for i, b in enumerate(dl):
        batches.append(b)
        if i == 2:
            break
    dl.close()
    assert batches[0]["points"].shape[0] == 2
    assert batches[0]["odometry"].shape == (2, 1, 7)
