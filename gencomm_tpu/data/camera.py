"""Real camera data loading for OPV2V-style datasets.

Parity targets (behavior, not code):
  - opencood/data_utils/datasets/basedataset/opv2v_basedataset.py:360-378
    (imgs.hdf5 fast path with camera{i}/depth{i} datasets, png fallback)
  - opencood/utils/camera_utils.py:33-59 sample_augmentation (train: random
    resize/crop/flip/rotate; eval: deterministic min-resize center crop)
  - opencood/utils/camera_utils.py:62-98 img_transform (PIL resize ->
    crop -> flip -> rotate; accumulate the 2x2/2 post-homography)
  - opencood/data_utils/datasets/basedataset/opv2v_basedataset.py:616-628
    get_ext_int (camera world pose -> camera->lidar extrinsic with the
    UE4->OpenCV axis permutation; intrinsic straight from the yaml)

The outputs plug into the model's padded camera batch keys
(imgs_{m}, rots_{m}, trans_{m}, intrins_{m}, post_rots_{m}, post_trans_{m},
 depths_{m}) consumed by models/encoders/lss.py:LSSEncoder.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from gencomm_tpu.utils.transformation_utils import x1_to_x2

# ImageNet statistics — the reference normalizes camera RGB with these
# (camera_utils.py:120-124); kept so checkpoints and goldens share scale.
IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)

# UE4 camera axes -> OpenCV camera axes (x right, y down, z forward)
UE4_TO_OPENCV = np.array(
    [[0, 0, 1, 0], [1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]], np.float32
)


def get_ext_int(params: dict, camera_id: int):
    """Camera extrinsic (camera->lidar, OpenCV axes) + 3x3 intrinsic.

    ``params`` is one CAV's timestamp yaml with ``camera{i}: {cords,
    intrinsic}`` entries and a ``lidar_pose`` (the reference keys off
    ``lidar_pose_clean``; callers pass the clean pose dict).
    """
    cam = params[f"camera{camera_id}"]
    cam_pose = [float(v) for v in cam["cords"]]
    lidar_pose = [float(v) for v in params.get("lidar_pose_clean",
                                               params["lidar_pose"])]
    camera_to_lidar = x1_to_x2(cam_pose, lidar_pose).astype(np.float32)
    camera_to_lidar = camera_to_lidar @ UE4_TO_OPENCV
    intrinsic = np.asarray(cam["intrinsic"], np.float32)
    return camera_to_lidar, intrinsic


def decode_depth(img) -> np.ndarray:
    """PIL depth image -> metric depth map (meters), float32.

    Conventions supported:
      - 8-bit grayscale: pixel value == depth in meters (the OPV2V-H depth
        dumps consumed as ``img_to_tensor(depth)*255`` in the reference,
        intermediate_heter_fusion_dataset.py:549)
      - 16-bit ('I'/'I;16'): value/256 meters (centimeter-ish precision)
      - RGB: CARLA encoded, (R + 256 G + 65536 B) / (2^24 - 1) * 1000 m
    """
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr.astype(np.float64)
        d = (arr[..., 0] + 256.0 * arr[..., 1] + 65536.0 * arr[..., 2])
        return (d / 16777215.0 * 1000.0).astype(np.float32)
    if arr.dtype == np.uint8:
        return arr.astype(np.float32)
    return (arr.astype(np.float32) / 256.0)


def load_camera_images(cav_path: str, timestamp: str, ncam: int = 4,
                       load_depth: bool = False, use_hdf5: bool = True):
    """Load one CAV's camera ring.

    Returns (imgs, depths): lists of PIL Images (RGB) and depth Images (or
    None). Prefers ``{timestamp}_imgs.hdf5`` (datasets camera0..3 /
    depth0..3 as uint8/uint16 arrays), falling back to
    ``{timestamp}_camera{i}.png`` / ``{timestamp}_depth{i}.png``.
    """
    from PIL import Image

    h5path = os.path.join(cav_path, f"{timestamp}_imgs.hdf5")
    imgs: List = []
    depths: Optional[List] = [] if load_depth else None
    if use_hdf5 and os.path.exists(h5path):
        import h5py

        with h5py.File(h5path, "r") as f:
            for i in range(ncam):
                imgs.append(Image.fromarray(f[f"camera{i}"][()]))
                if load_depth:
                    depths.append(Image.fromarray(f[f"depth{i}"][()]))
        return imgs, depths
    for i in range(ncam):
        imgs.append(Image.open(
            os.path.join(cav_path, f"{timestamp}_camera{i}.png")).copy())
        if load_depth:
            dpath = os.path.join(cav_path, f"{timestamp}_depth{i}.png")
            depths.append(Image.open(dpath).copy())
    return imgs, depths


def sample_augmentation(data_aug_conf: dict, train: bool,
                        rng: np.random.RandomState):
    """Draw one augmentation tuple (resize, resize_dims, crop, flip, rot).

    Matches camera_utils.sample_augmentation:33-59: train draws a random
    scale in resize_lim, a random bottom-anchored vertical crop inside
    bot_pct_lim, a random horizontal crop, optional flip and a rotation in
    rot_lim; eval uses the deterministic min-cover resize and centered crop.
    """
    H, W = data_aug_conf["H"], data_aug_conf["W"]
    fH, fW = data_aug_conf["final_dim"]
    if train:
        resize = rng.uniform(*data_aug_conf["resize_lim"])
        resize_dims = (int(W * resize), int(H * resize))
        newW, newH = resize_dims
        crop_h = int(
            (1 - rng.uniform(*data_aug_conf["bot_pct_lim"])) * newH) - fH
        crop_w = int(rng.uniform(0, max(0, newW - fW)))
        crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
        flip = bool(data_aug_conf.get("rand_flip", False)
                    and rng.choice([0, 1]))
        rotate = rng.uniform(*data_aug_conf["rot_lim"])
    else:
        resize = max(fH / H, fW / W)
        resize_dims = (int(W * resize), int(H * resize))
        newW, newH = resize_dims
        crop_h = int(
            (1 - np.mean(data_aug_conf["bot_pct_lim"])) * newH) - fH
        crop_w = int(max(0, newW - fW) / 2)
        crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
        flip = False
        rotate = 0.0
    return resize, resize_dims, crop, flip, rotate


def _rot2(deg: float) -> np.ndarray:
    h = np.radians(deg)
    return np.array(
        [[np.cos(h), np.sin(h)], [-np.sin(h), np.cos(h)]], np.float32
    )


def img_transform(img, depth, resize, resize_dims, crop, flip, rotate):
    """Apply the LSS augmentation chain to one image (+ optional depth map)
    and return (img, depth, post_rot(2x2), post_tran(2,)).

    The post-homography maps ORIGINAL pixel coords -> augmented pixel
    coords, accumulated exactly like camera_utils.img_transform:62-92 so
    the frustum unprojection can undo it.
    """
    from PIL import Image

    img = img.resize(resize_dims)
    img = img.crop(crop)
    if flip:
        img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
    img = img.rotate(rotate)

    if depth is not None:
        depth = depth.resize(resize_dims, resample=Image.NEAREST)
        depth = depth.crop(crop)
        if flip:
            depth = depth.transpose(method=Image.FLIP_LEFT_RIGHT)
        depth = depth.rotate(rotate, resample=Image.NEAREST)

    post_rot = np.eye(2, dtype=np.float32) * float(resize)
    post_tran = -np.asarray(crop[:2], np.float32)
    if flip:
        A = np.array([[-1, 0], [0, 1]], np.float32)
        b = np.array([crop[2] - crop[0], 0], np.float32)
        post_rot = A @ post_rot
        post_tran = A @ post_tran + b
    A = _rot2(rotate)
    b = np.array([crop[2] - crop[0], crop[3] - crop[1]], np.float32) / 2
    b = A @ (-b) + b
    post_rot = A @ post_rot
    post_tran = A @ post_tran + b
    return img, depth, post_rot, post_tran


def normalize_rgb(img) -> np.ndarray:
    """PIL RGB -> float32 (H, W, 3), ImageNet-normalized."""
    arr = np.asarray(img, np.float32)[..., :3] / 255.0
    return (arr - IMG_MEAN) / IMG_STD


def load_cav_cameras(cav_path: str, timestamp: str, params: dict,
                     data_aug_conf: dict, train: bool,
                     rng: np.random.RandomState,
                     load_depth: bool = True,
                     use_hdf5: bool = True):
    """Full per-CAV camera pipeline: read -> augment -> tensors.

    Returns a dict of numpy arrays:
      imgs       (N, fH, fW, 3) normalized RGB
      rots       (N, 3, 3)  camera->lidar rotation
      trans      (N, 3)     camera->lidar translation
      intrins    (N, 3, 3)
      extrinsics (N, 4, 4)  full camera->lidar
      post_rots  (N, 3, 3)  augmentation homography (3x3-padded)
      post_trans (N, 3)
      depths     (N, fH, fW) metric depth, only when load_depth and files
                 exist (missing depth -> key absent, depth loss gated off)
    """
    ncam = int(data_aug_conf.get("Ncams", 4))
    fH, fW = data_aug_conf["final_dim"]
    try:
        imgs_pil, depths_pil = load_camera_images(
            cav_path, timestamp, ncam, load_depth, use_hdf5)
    except FileNotFoundError:
        if not load_depth:
            raise
        imgs_pil, depths_pil = load_camera_images(
            cav_path, timestamp, ncam, False, use_hdf5)
    out = {
        "imgs": np.zeros((ncam, fH, fW, 3), np.float32),
        "rots": np.zeros((ncam, 3, 3), np.float32),
        "trans": np.zeros((ncam, 3), np.float32),
        "intrins": np.zeros((ncam, 3, 3), np.float32),
        "extrinsics": np.tile(np.eye(4, dtype=np.float32), (ncam, 1, 1)),
        "post_rots": np.tile(np.eye(3, dtype=np.float32), (ncam, 1, 1)),
        "post_trans": np.zeros((ncam, 3), np.float32),
    }
    if depths_pil is not None:
        out["depths"] = np.zeros((ncam, fH, fW), np.float32)
    for i in range(ncam):
        cam_to_lidar, intrin = get_ext_int(params, i)
        aug = sample_augmentation(data_aug_conf, train, rng)
        dep = depths_pil[i] if depths_pil is not None else None
        img, dep, post_rot2, post_tran2 = img_transform(imgs_pil[i], dep, *aug)
        out["imgs"][i] = normalize_rgb(img)
        out["rots"][i] = cam_to_lidar[:3, :3]
        out["trans"][i] = cam_to_lidar[:3, 3]
        out["intrins"][i] = intrin
        out["extrinsics"][i] = cam_to_lidar
        out["post_rots"][i, :2, :2] = post_rot2
        out["post_trans"][i, :2] = post_tran2
        if dep is not None:
            out["depths"][i] = decode_depth(dep)
    return out
