"""End-to-end KITTI-shaped smoke: synthesize a raw KITTI odometry tree
(real structure: ground+walls, chained poses, camera-frame pose files,
Tr calib), then drive the full CLI: create_hdf5 -> train -> evaluate.

Validates the exact path a real-KITTI user takes (driver configs #1/#2)
without mounted data.  Runs on the virtual CPU mesh in ~5 min.
"""
import sys, os; sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import jax; jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import rslo_tpu.utils.jax_cache
import numpy as np, shutil
from pathlib import Path

root = Path("/tmp/mini_kitti"); shutil.rmtree(root, ignore_errors=True)
rng = np.random.default_rng(0)
# build synthetic KITTI tree with REAL structure (walls+ground via synth_cloud)
from rslo_tpu.utils.synthetic import synth_cloud, transform_cloud
from rslo_tpu.geometry import tq_to_RT, np_compose_pose
for seq in (0, 1):
    seq_dir = root / "sequences" / f"{seq:02d}"
    (seq_dir / "velodyne").mkdir(parents=True)
    (root / "poses").mkdir(exist_ok=True)
    with open(seq_dir / "calib.txt", "w") as f:
        P = "7.1e+02 0 6.0e+02 0 0 7.1e+02 1.8e+02 0 0 0 1 0"
        for k in ("P0", "P1", "P2", "P3"):
            f.write(f"{k}: {P}\n")
        f.write("Tr: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
    cloud = synth_cloud(rng, 20000)
    step = np.array([0.8, 0.02, 0.0, 0.99995, 0, 0, 0.01], np.float32)
    step[3:] /= np.linalg.norm(step[3:])
    # lidar poses chained; camera pose = Tr @ T_lidar @ Tr^-1
    Tr = np.array([[0,-1,0,0],[0,0,-1,0],[1,0,0,0],[0,0,0,1]], float)
    lidar_pose = np.array([0,0,0,1,0,0,0], np.float32)
    poses = []
    cur = cloud
    for i in range(10):
        pts4 = np.concatenate([cur[:, :3], cur[:, 3:4]], axis=1).astype(np.float32)
        pts4.tofile(seq_dir / "velodyne" / f"{i:06d}.bin")
        T_l = np.eye(4); T_l[:3] = tq_to_RT(lidar_pose)
        T_c = Tr @ T_l @ np.linalg.inv(Tr)
        poses.append(T_c[:3].reshape(-1))
        lidar_pose = np_compose_pose(lidar_pose[None], step[None])[0]
        cur = transform_cloud(cur, step)
    np.savetxt(root / "poses" / f"{seq:02d}.txt", np.stack(poses))
print("tree built", flush=True)

from rslo_tpu.cli import main
main(["create_hdf5", "--kitti_root", str(root), "--out", "/tmp/mini_kitti.h5",
      "--sequences", "0,1"])
print("HDF5 OK", flush=True)

import dataclasses
from rslo_tpu.config.schema import PipelineCfg, DataCfg, MiddleCfg, OdomCfg, LossCfg, TrainCfg, VoxelizerCfg
cfg = PipelineCfg(
    voxelizer=VoxelizerCfg(point_cloud_range=(-51.2,-25.6,-3.0,51.2,25.6,5.0),
                           voxel_size=(0.2,0.2,0.2), max_points_per_voxel=5, max_voxels=8192),
    middle=MiddleCfg(name="PillarMiddleCov", level_capacities=(8192,8192,4096,2048),
                     channels=(8,16,32,32), remat=False),
    odom=OdomCfg(num_input_features=64, layer_nums=(1,1,1), num_filters=(32,32,64),
                 num_upsample_filters=(32,32,32), bn_type="sync_bn"),
    loss=LossCfg(max_loss_points=8192, warmup_steps=1000),
    data=DataCfg(root="/tmp/mini_kitti.h5", seq_length=2, max_points=20480,
                 train_sequences=(0,), val_sequences=(1,)),
    train=TrainCfg(steps=3, display_step=1, steps_per_eval=1000),
)
open("/tmp/mini_kitti_cfg.json","w").write(cfg.to_json())
main(["train", "--config", "/tmp/mini_kitti_cfg.json", "--model_dir", "/tmp/mini_kitti_run", "--steps", "3"])
print("TRAIN ON KITTI-SHAPED DATA OK", flush=True)
main(["evaluate", "--config", "/tmp/mini_kitti_cfg.json", "--model_dir", "/tmp/mini_kitti_run", "--max_windows", "9"])
print("EVAL ON KITTI-SHAPED DATA OK", flush=True)
