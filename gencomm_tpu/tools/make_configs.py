"""Generate the experiment-config matrix under configs/.

The reference ships 253 hand-written hypes YAMLs
(opencood/hypes_yaml/{opv2v,dairv2x,v2xset,v2xsim2,v2xreal}/**); this tool
emits the equivalent matrix programmatically from one canonical template per
detector so every (dataset x method) combination stays consistent. Every
emitted file loads through gencomm_tpu.config.load_yaml and builds a model +
loss (enforced by tests/test_config_pack.py).

Usage: python -m gencomm_tpu.tools.make_configs [--out configs]
"""

from __future__ import annotations

import argparse
import copy
import os

import yaml


LIDAR_RANGE = [-102.4, -51.2, -3, 102.4, 51.2, 1]
# camera-ego configs use a SQUARE range matched to the camera depth reach
# (reference GenComm_yamls/gencomm/stage1/m2_att.yaml:25 / CameraOnly/*:
# [-51.2, -51.2, -3, 51.2, 51.2, 1]); DAIR camera configs keep the wide
# asymmetric range (dairv2x/CameraOnly/camera_attfuse.yaml:18)
CAMERA_RANGE = [-51.2, -51.2, -3, 51.2, 51.2, 1]
DAIR_RANGE = [-100.8, -40, -3.5, 100.8, 40, 1.5]


def range_for(tag, dataset, lidar_range):
    if tag in ("m2", "m4") and dataset in ("opv2v", "v2xset", "v2xsim"):
        return CAMERA_RANGE
    return lidar_range
VOXEL = [0.4, 0.4, 4]
DIR_ARGS = {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]}

DATASET_DIRS = {
    "opv2v": ("dataset/OPV2V/train", "dataset/OPV2V/validate",
              "dataset/OPV2V/test"),
    "v2xset": ("dataset/V2XSET/train", "dataset/V2XSET/validate",
               "dataset/V2XSET/test"),
    "dairv2x": ("dataset/DAIR-V2X/cooperative-vehicle-infrastructure",) * 3,
    "v2xsim": ("dataset/V2XSIM/train", "dataset/V2XSIM/validate",
               "dataset/V2XSIM/test"),
    "v2xreal": ("dataset/V2XREAL/train", "dataset/V2XREAL/validate",
                "dataset/V2XREAL/test"),
}


def pillar_modality(lidar_range):
    return {
        "sensor_type": "lidar",
        "core_method": "point_pillar",
        "preprocess": {
            "core_method": "SpVoxelPreprocessor",
            "args": {"voxel_size": list(VOXEL), "max_points_per_voxel": 32,
                     "max_voxel_train": 32000, "max_voxel_test": 70000},
            "cav_lidar_range": list(lidar_range),
        },
    }


def second_modality(lidar_range):
    return {
        "sensor_type": "lidar",
        "core_method": "second",
        "preprocess": {
            "core_method": "SpVoxelPreprocessor",
            "args": {"voxel_size": [0.1, 0.1, 0.1],
                     "max_points_per_voxel": 5,
                     "max_voxel_train": 32000, "max_voxel_test": 70000},
            "cav_lidar_range": list(lidar_range),
        },
    }


def camera_modality():
    return {
        "sensor_type": "camera",
        "core_method": "lift_splat_shoot",
        "grid_conf": {"xbound": [-51.2, 51.2, 0.4],
                      "ybound": [-51.2, 51.2, 0.4],
                      "zbound": [-10, 10, 20.0],
                      "ddiscr": [2, 50, 48], "mode": "LID"},
        "data_aug_conf": {"resize_lim": [0.65, 0.7],
                          "final_dim": [384, 512], "rot_lim": [-3.6, 3.6],
                          "H": 600, "W": 800, "rand_flip": False,
                          "bot_pct_lim": [0.0, 0.05],
                          "cams": ["camera0", "camera1", "camera2",
                                   "camera3"],
                          "Ncams": 4},
    }


def pillar_encoder_args(lidar_range):
    return {
        "voxel_size": list(VOXEL),
        "lidar_range": list(lidar_range),
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [64]},
        "point_pillar_scatter": {"num_features": 64},
    }


def pillar_branch(lidar_range):
    return {
        "core_method": "point_pillar",
        "sensor_type": "lidar",
        "encoder_args": pillar_encoder_args(lidar_range),
        "backbone_args": {"layer_nums": [3, 5, 8],
                          "layer_strides": [2, 2, 2],
                          "num_filters": [64, 128, 256],
                          "upsample_strides": [1, 2, 4],
                          "num_upsample_filter": [128, 128, 128]},
        "aligner_args": {"core_method": "identity"},
        "shrink_header": {"kernal_size": [3], "stride": [2], "padding": [1],
                          "dim": [128], "input_dim": 384},
    }


def second_branch(lidar_range):
    return {
        "core_method": "second",
        "sensor_type": "lidar",
        "encoder_args": {
            "voxel_size": [0.1, 0.1, 0.1],
            "lidar_range": list(lidar_range),
            "max_voxels": 32000,
            "spconv": {"num_features_in": 4, "num_features_out": 128},
        },
        "backbone_args": {"layer_nums": [3, 5, 8],
                          "layer_strides": [2, 2, 2],
                          "num_filters": [64, 128, 256],
                          "upsample_strides": [1, 2, 4],
                          "num_upsample_filter": [128, 128, 128]},
        "aligner_args": {"core_method": "identity"},
        "shrink_header": {"kernal_size": [3], "stride": [2], "padding": [1],
                          "dim": [128], "input_dim": 384},
    }


def camera_branch(lidar_range, deep=False):
    """LSS camera branch. ``deep=True`` = the m4 agent type (reference's
    CamEncode_Resnet101 trunk, lss_submodule.py:140) — a deeper image trunk
    than the m2 default (EfficientNet-b0 analog)."""
    cm = camera_modality()
    return {
        "core_method": "lift_splat_shoot",
        "sensor_type": "camera",
        "encoder_args": {"grid_conf": cm["grid_conf"],
                         "data_aug_conf": cm["data_aug_conf"],
                         "img_downsample": 8, "img_features": 128,
                         "trunk_blocks": 4 if deep else 2,
                         "depth_topk": 8,
                         "lidar_range": list(lidar_range)},
        "camera_mask_args": {"grid_conf": cm["grid_conf"]},
        "backbone_args": {"layer_nums": [3, 5, 8],
                          "layer_strides": [2, 2, 2],
                          "num_filters": [64, 128, 256],
                          "upsample_strides": [1, 2, 4],
                          "num_upsample_filter": [128, 128, 128]},
        "aligner_args": {"core_method": "identity"},
        "shrink_header": {"kernal_size": [3], "stride": [2], "padding": [1],
                          "dim": [128], "input_dim": 384},
    }


def modality_branch(tag, lidar_range):
    """Agent-type tags follow the reference (BASELINE.md / Single/*.yaml):
    m1 = PointPillars 128-beam lidar, m2 = LSS camera (EfficientNet-b0
    analog), m3 = SECOND 32-beam lidar, m4 = LSS camera deep trunk
    (ResNet101 analog), m0 = STAMP protocol modality (pillar)."""
    if tag in ("m0", "m1"):
        return pillar_branch(lidar_range)
    if tag == "m2":
        return camera_branch(lidar_range)
    if tag == "m3":
        return second_branch(lidar_range)
    if tag == "m4":
        return camera_branch(lidar_range, deep=True)
    raise ValueError(tag)


def modality_setting(tag, lidar_range):
    if tag in ("m0", "m1"):
        return pillar_modality(lidar_range)
    if tag == "m3":
        return second_modality(lidar_range)
    if tag in ("m2", "m4"):
        return camera_modality()
    raise ValueError(tag)


def postprocess_block(lidar_range, stride=4):
    return {
        "core_method": "VoxelPostprocessor",
        "gt_range": list(lidar_range),
        "anchor_args": {"cav_lidar_range": list(lidar_range),
                        "l": 3.9, "w": 1.6, "h": 1.56,
                        "r": [0, 90], "feature_stride": stride, "num": 2},
        "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                        "score_threshold": 0.2},
        "order": "hwl", "max_num": 150, "nms_thresh": 0.15,
        "dir_args": dict(DIR_ARGS),
    }


def detection_loss(core="point_pillar_loss", extra=None):
    args = {
        "pos_cls_weight": 2.0,
        "cls": {"type": "SigmoidFocalLoss", "alpha": 0.25, "gamma": 2.0,
                "weight": 2.0},
        "reg": {"type": "WeightedSmoothL1Loss", "sigma": 3.0,
                "codewise": True, "weight": 2.0},
        "dir": {"type": "WeightedSoftmaxClassificationLoss", "weight": 0.2,
                "args": dict(DIR_ARGS)},
    }
    if extra:
        args.update(extra)
    return {"core_method": core, "args": args}


def base_config(name, dataset, lidar_range):
    root, val, test = DATASET_DIRS[dataset]
    return {
        "name": name,
        "root_dir": root, "validate_dir": val, "test_dir": test,
        "yaml_parser": "load_general_params",
        "train_params": {"batch_size": 2, "epoches": 20, "eval_freq": 2,
                         "save_freq": 2, "max_cav": 5},
        "comm_range": 70,
        "input_source": ["lidar"],
        "label_type": "lidar",
        "cav_lidar_range": list(lidar_range),
        "heter": {"ego_modality": "m1",
                  "mapping_dict": {"m1": "m1", "m2": "m1",
                                   "m3": "m1", "m4": "m1"},
                  "modality_setting": {"m1": pillar_modality(lidar_range)}},
        "fusion": {"core_method": "intermediateheter", "dataset": dataset,
                   "args": {"proj_first": False}},
        "preprocess": {"core_method": "SpVoxelPreprocessor",
                       "args": {"voxel_size": list(VOXEL)},
                       "cav_lidar_range": list(lidar_range)},
        "postprocess": postprocess_block(lidar_range),
        "optimizer": {"core_method": "Adam", "lr": 0.002,
                      "args": {"eps": 1e-10, "weight_decay": 1e-4}},
        "lr_scheduler": {"core_method": "multistep", "gamma": 0.1,
                         "step_size": [10, 15]},
    }


FUSION_EXTRAS = {
    "att": {"att": {"feat_dim": 128}},
    "max": {"max": {}},
    "disconet": {"disconet": {"feat_dim": 128}},
    "v2vnet": {"v2vnet": {"in_channels": 128, "gru_hidden": 128,
                          "num_iteration": 2}},
    "v2xvit": {"v2xvit": {"dim": 128, "depth": 2, "heads": 4,
                          "window_size": 4}},
    "cobevt": {"cobevt": {"input_dim": 128, "window_size": 4, "depth": 2,
                          "heads": 4}},
    "where2comm": {"where2comm": {"feat_dim": 128},
                   "communication": {"thre": 0.01}},
    "who2com": {"who2com": {"feat_dim": 128}},
}


def intermediate_fusion_config(dataset, method, lidar_range, tag="m1",
                               name=None):
    """Homogeneous intermediate fusion. ``tag`` picks the agent type
    (m1 pillar / m2 LSS / m3 SECOND / m4 deep LSS); ``method`` is one of
    FUSION_EXTRAS or 'coalign' (att fusion + SE2 box-alignment block,
    reference LiDAROnly/lidar_coalign.yaml + box_align_v2.py)."""
    lidar_range = range_for(tag, dataset, lidar_range)
    cfg = base_config(name or f"{dataset}_point_pillar_{method}", dataset,
                      lidar_range)
    fus = "att" if method == "coalign" else method
    args = {
        "ego_modality": "m1",
        "lidar_range": list(lidar_range),
        "m1": modality_branch(tag, lidar_range),
        "fusion_method": fus,
        "in_head": 128,
        "anchor_number": 2,
        "dir_args": dict(DIR_ARGS),
    }
    args.update(copy.deepcopy(FUSION_EXTRAS[fus]))
    if method == "coalign":
        cfg["box_align"] = {
            "train_result": "stage1_boxes.json",
            "val_result": "stage1_boxes.json",
            "args": {"landmark_SE2": True, "adaptive_landmark": False,
                     "normalize_pairwise_tfm": True},
        }
    cfg["heter"]["modality_setting"]["m1"] = modality_setting(
        tag, lidar_range)
    if tag in ("m2", "m4"):
        cfg["input_source"] = ["camera"]
        # camera-ego configs use camera-visible GT labels (the reference's
        # 50 `label_type: 'camera'` yamls, e.g. CameraOnly/camera_attfuse.yaml)
        cfg["label_type"] = "camera"
        cfg["loss"] = detection_loss(
            "point_pillar_depth_loss", {"depth": {"weight": 1.0}})
    else:
        cfg["loss"] = detection_loss()
    cfg["model"] = {"core_method": "heter_model_baseline", "args": args}
    return cfg


def multiscale_fusion_config(dataset, method, lidar_range, name=None):
    """Multiscale intermediate fusion: fuse agents at every backbone level
    (reference point_pillar_baseline_multiscale.py:92-134; CoAlign
    lineage). ``method`` is 'att' or 'max'."""
    cfg = base_config(
        name or f"{dataset}_point_pillar_{method}_multiscale", dataset,
        lidar_range)
    bb = {"layer_nums": [3, 5, 8], "layer_strides": [2, 2, 2],
          "num_filters": [64, 128, 256], "upsample_strides": [1, 2, 4],
          "num_upsample_filter": [128, 128, 128]}
    args = {
        "lidar_range": list(lidar_range),
        "voxel_size": [0.4, 0.4, 4.0],
        "pillar_vfe": {"num_filters": [64], "use_norm": True},
        "base_bev_backbone": bb,
        "fusion_method": method,
        "att": {"feat_dim": bb["num_filters"]},
        "shrink_header": {"kernal_size": [3], "stride": [1],
                          "padding": [1], "dim": [256]},
        "anchor_number": 2,
        "dir_args": dict(DIR_ARGS),
    }
    cfg["postprocess"] = postprocess_block(lidar_range, stride=2)
    cfg["loss"] = detection_loss()
    cfg["model"] = {"core_method": "point_pillar_baseline_multiscale",
                    "args": args}
    return cfg


GENCOMM_BLOCK = {
    "model": {"embed_dim": 130, "in_channels": 128, "out_ch": 128,
              "ch": 8, "ch_mult": [1, 1], "num_res_blocks": 2,
              "attn_resolutions": [16], "dropout": 0.0,
              "resamp_with_conv": True},
    "diffusion": {"beta_schedule": "linear", "beta_start": 0.0005,
                  "beta_end": 0.02, "num_diffusion_timesteps": 3},
}


def gencomm_stage1_config(dataset, tag, lidar_range, fusion="att"):
    cfg = intermediate_fusion_config(dataset, fusion, lidar_range, tag=tag)
    cfg["name"] = f"{dataset}_gencomm_stage1_{tag}_{fusion}"
    args = cfg["model"]["args"]
    args["message_extractor"] = {"in_ch": 128, "out_ch": 2}
    args["enhancer"] = {"in_ch": 128}
    args["gencomm"] = copy.deepcopy(GENCOMM_BLOCK)
    cfg["model"]["core_method"] = "heter_model_baseline_w_gencomm_stage1"
    if tag in ("m2", "m4"):
        cfg["loss"] = detection_loss(
            "point_pillar_depth_loss",
            {"generate_weight": 1, "depth": {"weight": 1.0}})
    else:
        cfg["loss"] = detection_loss("point_pillar_gencomm_loss",
                                     {"generate_weight": 1})
    return cfg


def hetero_method_config(dataset, method, lidar_range, base_tag="m1",
                         new_tag="m2", fusion="att"):
    """BackAlign / CodeFilling / MPDA / STAMP / GenComm-stage2: ``base_tag``
    collaboration base + ``new_tag`` newcomer agent type (reference
    GenComm_yamls/{gencomm,baselines}/stage2/*)."""
    cfg = intermediate_fusion_config(dataset, fusion, lidar_range,
                                     tag=base_tag)
    cfg["name"] = f"{dataset}_{method}_{base_tag}{new_tag}_{fusion}"
    sensors = {modality_setting(t, lidar_range)["sensor_type"]
               for t in (base_tag, new_tag)}
    cfg["input_source"] = sorted(sensors)
    cfg["heter"]["ego_modality"] = base_tag if base_tag != "m0" else new_tag
    cfg["heter"]["mapping_dict"] = {"m1": base_tag, "m2": new_tag,
                                    "m3": base_tag, "m4": new_tag}
    cfg["heter"]["modality_setting"] = {
        base_tag: modality_setting(base_tag, lidar_range),
        new_tag: modality_setting(new_tag, lidar_range),
    }
    args = cfg["model"]["args"]
    args["ego_modality"] = cfg["heter"]["ego_modality"]
    if base_tag != "m1":
        args[base_tag] = args.pop("m1")
    args[new_tag] = modality_branch(new_tag, lidar_range)
    core = {
        "backalign": "heter_model_baseline_w_backalign",
        "codefilling": "heter_model_baseline_w_codebook",
        "mpda": "heter_model_baseline_w_mpda",
        "stamp": "heter_model_baseline_w_stamp",
        "gencomm_stage2": "heter_model_baseline_w_gencomm_stage2",
    }[method]
    cfg["model"]["core_method"] = core
    if method == "codefilling":
        args["codebook"] = {"seg_num": 2, "dict_size": 64}
        args["communication"] = {"thre": 0.01}
        cfg["loss"] = detection_loss("point_pillar_codebook_loss")
    elif method == "mpda":
        args["cdt"] = {"window_size": 8, "depth": 1}
        cfg["loss"] = detection_loss("point_pillar_mpda_loss",
                                     {"da_weight": 0.1})
    elif method == "stamp":
        for m in (base_tag, new_tag):
            args[m]["adapter"] = {"core_method": "adapterconvnext",
                                  "args": {"depth": 1}}
            args[m]["reverter"] = {"core_method": "adapterconvnext",
                                   "args": {"depth": 1}}
        cfg["loss"] = {"core_method": "adapter_loss",
                       "args": {"p2m_weight": 1.0, "m2p2m_weight": 1.0,
                                "m2p_weight": 1.0}}
    elif method == "gencomm_stage2":
        args["message_extractor"] = {"in_ch": 128, "out_ch": 2}
        args["enhancer"] = {"in_ch": 128}
        args["gencomm"] = copy.deepcopy(GENCOMM_BLOCK)
        cfg["loss"] = detection_loss("point_pillar_gencomm_loss",
                                     {"generate_weight": 1})
    return cfg


def multi_modality_config(dataset, tags, fusion, lidar_range):
    """End-to-end joint training over 2-4 agent types (reference
    MoreModality/{2,3,4}_modality_end2end_training/*)."""
    cfg = intermediate_fusion_config(dataset, fusion, lidar_range)
    joined = "".join(tags)
    cfg["name"] = f"{dataset}_{joined}_{fusion}"
    sensors = {modality_setting(t, lidar_range)["sensor_type"] for t in tags}
    cfg["input_source"] = sorted(sensors)
    slots = ["m1", "m2", "m3", "m4"]
    cfg["heter"]["mapping_dict"] = {
        s: tags[i % len(tags)] for i, s in enumerate(slots)
    }
    cfg["heter"]["modality_setting"] = {
        t: modality_setting(t, lidar_range) for t in tags
    }
    args = cfg["model"]["args"]
    del args["m1"]
    for t in tags:
        args[t] = modality_branch(t, lidar_range)
    args["ego_modality"] = tags[0]
    cfg["heter"]["ego_modality"] = tags[0]
    return cfg


def single_pretrain_config(dataset, tag, lidar_range):
    """Single-agent pretrain per agent type (reference Single/
    m*_pretrain.yaml): no collaboration, per-agent supervision."""
    cfg = intermediate_fusion_config(dataset, "att", lidar_range, tag=tag)
    cfg["name"] = f"{dataset}_{tag}_pretrain"
    cfg["fusion"] = {"core_method": "late", "dataset": dataset,
                     "args": {"proj_first": False}}
    cfg["model"]["args"]["supervise_single"] = True
    cfg["train_params"]["max_cav"] = 1
    return cfg


def pyramid_config(dataset, lidar_range, collab=True, tag="m1", name=None):
    # the modality is NAMED by its tag — reference HEAL stage1/stage2 yamls
    # key modality_setting/model args by the true type (m2_single_pyramid
    # .yaml:22-31 uses m2), so stage-2 branches merge into the collab base
    # without a rename pass
    lidar_range = range_for(tag, dataset, lidar_range)
    cfg = base_config(
        name or f"{dataset}_heal_pyramid_{'collab' if collab else 'single'}",
        dataset, lidar_range)
    cfg["heter"]["modality_setting"] = {
        tag: modality_setting(tag, lidar_range)
    }
    cfg["heter"]["ego_modality"] = tag
    cfg["heter"]["mapping_dict"] = {f"m{i}": tag for i in range(1, 5)}
    if tag in ("m2", "m4"):
        cfg["input_source"] = ["camera"]
        cfg["label_type"] = "camera"
    args = {
        "ego_modality": tag,
        "lidar_range": list(lidar_range),
        tag: modality_branch(tag, lidar_range),
        "fusion_method": "pyramid",
        "fusion_backbone": {"resnext": True, "layer_nums": [3, 5, 8],
                            "layer_strides": [1, 2, 2],
                            "num_filters": [64, 128, 256],
                            # deconv every level back to the stride-1 grid
                            # before channel concat (reference HEAL configs,
                            # e.g. m1m2m3_pyramid.yaml:212-219)
                            "upsample_strides": [1, 2, 4],
                            "num_upsample_filter": [128, 128, 128],
                            "anchor_number": 2},
        "in_head": 256,
        "anchor_number": 2,
        "dir_args": dict(DIR_ARGS),
    }
    cfg["model"] = {
        "core_method": ("heter_pyramid_collab" if collab
                        else "heter_pyramid_single"),
        "args": args,
    }
    if collab:
        # stage-1 collab training supervises the per-agent occupancy maps
        # through a second "_single" criterion pass (reference
        # m1_pyramid.yaml:95 supervise_single + train.py:152-158)
        args["supervise_single"] = True
    cfg["loss"] = detection_loss(
        "point_pillar_pyramid_loss",
        {"pyramid": {"relative_downsample": [1, 2, 4],
                     "weight": [0.4, 0.2, 0.1]},
         "depth": {"weight": 1.0}})
    # pyramid heads sit at the backbone's stride-2 grid (no shrink conv in
    # this assembly) — reference HEAL yamls use feature_stride 2
    # (m1m2m3_pyramid.yaml:116)
    cfg["postprocess"] = postprocess_block(lidar_range, stride=2)
    return cfg


def pyramid_collab_multi_config(dataset, lidar_range, tags=("m1", "m2"),
                                name=None):
    """HEAL final-inference assembly: one pyramid-collab model holding a
    branch per agent type (reference final_infer/m1m2m3m4.yaml), run with
    the checkpoint assembled by ``heal_tools merge`` from the stage-1 base
    + each stage-2 single model."""
    cfg = pyramid_config(dataset, lidar_range, collab=True, tag=tags[0],
                         name=name or
                         f"{dataset}_heal_final_{''.join(tags)}")
    sensors = {modality_setting(t, lidar_range)["sensor_type"]
               for t in tags}
    cfg["input_source"] = sorted(sensors)
    cfg.pop("label_type", None)
    cfg["heter"]["ego_modality"] = tags[0]
    cfg["heter"]["mapping_dict"] = {
        f"m{i}": tags[(i - 1) % len(tags)] for i in range(1, 5)
    }
    cfg["heter"]["modality_setting"] = {
        t: modality_setting(t, lidar_range) for t in tags
    }
    args = cfg["model"]["args"]
    args["ego_modality"] = tags[0]
    for t in tags[1:]:
        args[t] = modality_branch(t, lidar_range)
    return cfg


def legacy_config(dataset, core, lidar_range):
    cfg = base_config(f"{dataset}_{core}", dataset, lidar_range)
    pp = pillar_encoder_args(lidar_range)
    if core in ("ciassd", "second_ssfa", "second_ssfa_uncertainty",
                "fpvrcnn", "second", "second_intermediate"):
        cfg["preprocess"]["args"]["voxel_size"] = [0.1, 0.1, 0.1]
        args = {
            "lidar_range": list(lidar_range),
            "voxel_size": [0.1, 0.1, 0.1],
            "max_voxels": 32000,
            "mean_vfe": {"num_point_features": 4},
            "spconv": {"num_features_in": 4, "num_features_out": 64},
            "map2bev": {"feature_num": 128},
            "ssfa": {"feature_num": 128},
            "head": {"num_input": 128, "num_pred": 14, "num_cls": 2,
                     "num_iou": 2, "use_dir": True, "num_dir": 4},
            "base_bev_backbone": {"layer_nums": [5, 5],
                                  "layer_strides": [1, 2],
                                  "num_filters": [128, 256],
                                  "upsample_strides": [1, 2],
                                  "num_upsample_filter": [256, 256]},
            "anchor_number": 2,
        }
        cfg["postprocess"] = postprocess_block(lidar_range, stride=8)
        if core == "fpvrcnn":
            args.update({"activate_stage2": True, "num_proposals": 32,
                         "num_rois": 64,
                         "vsa": {"num_keypoints": 256},
                         "roi_head": {"roi_grid_pool": {"grid_size": 6}}})
            cfg["loss"] = {
                "core_method": "fpvrcnn_loss",
                "args": {
                    "stage1": detection_loss()["args"] | {
                        "pos_cls_weight": 1.5,
                        "encode_rad_error_by_sin": True,
                        "iou": {"sigma": 3.0, "weight": 1.0}},
                    "stage2": {"cls": {"weight": 1.0},
                               "reg": {"sigma": 3.0, "weight": 1.0},
                               "iou": {"sigma": 3.0, "weight": 1.0}},
                },
            }
        else:
            cfg["loss"] = {
                "core_method": "ciassd_loss",
                "args": detection_loss()["args"] | {
                    "pos_cls_weight": 1.5,
                    "encode_rad_error_by_sin": True,
                    "iou": {"sigma": 3.0, "weight": 1.0}},
            }
            if core in ("second", "second_intermediate"):
                # second.py has only cls/reg heads — no dir supervision
                cfg["loss"] = detection_loss()
                del cfg["loss"]["args"]["dir"]
        if core == "second_ssfa_uncertainty":
            args["uncertainty_dim"] = 3
            cfg["loss"] = {
                "core_method": "point_pillar_uncertainty_loss",
                "args": detection_loss()["args"] | {
                    "kl": {"dim": 3, "angle_weight": 1.0,
                           "xy_loss_type": "l1",
                           "angle_loss_type": "von-mise",
                           "lambda_V": 1.0, "s0": 1.0,
                           "limit_period": False},
                    "uncertainty": {"weight": 0.5}},
            }
    elif core == "point_pillar_uncertainty":
        args = {
            "lidar_range": list(lidar_range),
            "voxel_size": list(VOXEL),
            "pillar_vfe": pp["pillar_vfe"],
            "base_bev_backbone": {"layer_nums": [3, 5, 8],
                                  "layer_strides": [2, 2, 2],
                                  "num_filters": [64, 128, 256],
                                  "upsample_strides": [1, 2, 4],
                                  "num_upsample_filter": [128, 128, 128]},
            "anchor_num": 2,
            "uncertainty_dim": 3,
        }
        cfg["loss"] = {
            "core_method": "point_pillar_uncertainty_loss",
            "args": detection_loss()["args"] | {
                "kl": {"dim": 3, "angle_weight": 1.0,
                       "xy_loss_type": "l1", "angle_loss_type": "von-mise",
                       "lambda_V": 1.0, "s0": 1.0, "limit_period": False},
                "uncertainty": {"weight": 0.5}},
        }
        del cfg["loss"]["args"]["dir"]
    elif core in ("center_point", "center_point_baseline",
                  "center_point_where2comm"):
        args = {
            "lidar_range": list(lidar_range),
            "voxel_size": list(VOXEL),
            "pillar_vfe_args": pp,
            "base_bev_backbone": {"layer_nums": [3, 5, 8],
                                  "layer_strides": [2, 2, 2],
                                  "num_filters": [64, 128, 256],
                                  "upsample_strides": [1, 2, 4],
                                  "num_upsample_filter": [128, 128, 128]},
            "shrink_header": {"kernal_size": [3], "stride": [2],
                              "padding": [1], "dim": [128],
                              "input_dim": 384},
            "out_size_factor": 4,
        }
        if core == "center_point_where2comm":
            # fusion_args schema: reference center_point_where2comm.py:46
            # + where2comm_attn.Where2comm.__init__ (:174-217)
            args["fusion_args"] = {
                "voxel_size": list(VOXEL),
                "downsample_rate": 4,
                "multi_scale": True,
                "layer_nums": [3, 5, 8],
                "num_filters": [64, 128, 256],
                "agg_operator": {"mode": "ATTEN", "feature_dim": 128},
                "communication": {
                    "thre": 0.01,
                    "gaussian_smooth": {"k_size": 5, "c_sigma": 1.0},
                },
            }
        cfg["loss"] = {"core_method": "center_point_loss",
                       "args": {"cls_weight": 1.0, "loc_weight": 2.0}}
    elif core in ("pixor", "pixor_intermediate"):
        args = {"lidar_range": list(lidar_range),
                "voxel_size": [0.4, 0.4, 0.1]}
        cfg["preprocess"]["core_method"] = "BevPreprocessor"
        cfg["loss"] = {"core_method": "pixor_loss",
                       "args": {"alpha": 0.25, "gamma": 2.0,
                                "reg_weight": 1.0}}
    elif core == "voxel_net":
        cfg["model"] = {"core_method": "heter_model_baseline", "args": {
            "ego_modality": "m1", "lidar_range": list(lidar_range),
            "m1": pillar_branch(lidar_range) | {
                "core_method": "voxelnet",
                "encoder_args": {"voxel_size": [0.4, 0.4, 0.4],
                                 "lidar_range": list(lidar_range),
                                 "vfe_filters": [32, 128]}},
            "fusion_method": "att", "att": {"feat_dim": 128},
            "in_head": 128, "anchor_number": 2,
            "dir_args": dict(DIR_ARGS)}}
        cfg["loss"] = detection_loss()
        return cfg
    else:
        raise ValueError(core)
    cfg["model"] = {"core_method": core, "args": args}
    return cfg


# V2X-Real schema (reference hypes_yaml/v2xreal/GenComm_yamls/gencomm/
# stage1/m1_att.yaml:19,39,75-100): tall z range, z-collapsing voxels,
# per-class anchors, 3 super classes, and the v2xreal loss family. All
# four agent types are PointPillars lidar in the shipped configs.
V2XREAL_RANGE = [-102.4, -51.2, -15, 102.4, 51.2, 15]
V2XREAL_ANCHOR_GEN = [
    {"class_name": "vehicle", "anchor_sizes": [[3.9, 1.6, 1.56]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
     "align_center": True, "feature_map_stride": 4,
     "matched_threshold": 0.6, "unmatched_threshold": 0.45},
    {"class_name": "pedestrian", "anchor_sizes": [[0.8, 0.6, 1.73]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-0.6],
     "align_center": True, "feature_map_stride": 4,
     "matched_threshold": 0.5, "unmatched_threshold": 0.35},
    {"class_name": "truck", "anchor_sizes": [[8, 3, 3]],
     "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
     "align_center": True, "feature_map_stride": 4,
     "matched_threshold": 0.6, "unmatched_threshold": 0.45},
]
_V2XREAL_LOSS_MAP = {
    "point_pillar_loss": "point_pillar_v2xreal_loss",
    "point_pillar_gencomm_loss": "point_pillar_v2xreal_gencomm_loss",
    "point_pillar_codebook_loss": "point_pillar_v2xreal_codebook_loss",
    "point_pillar_mpda_loss": "point_pillar_v2xreal_mpda_loss",
}


def v2xreal_ify(cfg):
    """Stamp the V2X-Real multi-class schema onto a config built by the
    generic family builders: dataset_mode, per-class anchors, num_class=3,
    z-collapsing voxels, all-pillar agent types, v2xreal losses."""
    cfg["dataset_mode"] = "vc"
    cfg["input_source"] = ["lidar"]
    pp = cfg["postprocess"]
    pp["num_class"] = 3
    pp["anchor_args"]["anchor_generator_config"] = copy.deepcopy(
        V2XREAL_ANCHOR_GEN)
    cfg["preprocess"]["args"]["voxel_size"] = [0.4, 0.4, 30]
    # every agent type is a pillar-lidar in V2X-Real (stage1 m1..m4 all
    # set sensor_type lidar / core point_pillar)
    for tag in list(cfg["heter"]["modality_setting"]):
        ms = pillar_modality(V2XREAL_RANGE)
        ms["preprocess"]["args"]["voxel_size"] = [0.4, 0.4, 30]
        cfg["heter"]["modality_setting"][tag] = ms
    margs = cfg["model"]["args"]
    margs["num_class"] = 3
    for tag in list(margs):
        if isinstance(margs.get(tag), dict) and tag.startswith("m") \
                and "core_method" in margs[tag]:
            extra = {k: margs[tag][k] for k in ("adapter", "reverter")
                     if k in margs[tag]}
            margs[tag] = pillar_branch(V2XREAL_RANGE)
            margs[tag]["encoder_args"]["voxel_size"] = [0.4, 0.4, 30]
            margs[tag].update(extra)
    if cfg["loss"]["core_method"] in _V2XREAL_LOSS_MAP:
        cfg["loss"]["core_method"] = _V2XREAL_LOSS_MAP[
            cfg["loss"]["core_method"]]
        cfg["loss"]["args"]["num_class"] = 3
    return cfg


def late_fusion_config(dataset, lidar_range, early=False):
    mode = "early" if early else "late"
    cfg = intermediate_fusion_config(dataset, "att", lidar_range)
    cfg["name"] = f"{dataset}_point_pillar_{mode}_fusion"
    cfg["fusion"] = {"core_method": mode, "dataset": dataset,
                     "args": {"proj_first": bool(early)}}
    cfg["model"]["args"]["supervise_single"] = True
    return cfg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="configs")
    args = ap.parse_args(argv)
    emitted = []

    def emit(dataset, cfg, subdir=None, fname=None):
        d = os.path.join(args.out, dataset, *(subdir or "").split("/"))
        os.makedirs(d, exist_ok=True)
        name = fname or cfg["name"].replace(f"{dataset}_", "", 1)
        path = os.path.join(d, name + ".yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        emitted.append(path)

    # ----- opv2v (reference: 149 yamls under hypes_yaml/opv2v) -----
    # flat root: homogeneous fusion family + late/early (kept at the
    # historical paths so existing docs/commands stay valid)
    for method in FUSION_EXTRAS:
        emit("opv2v", intermediate_fusion_config("opv2v", method,
                                                 LIDAR_RANGE))
    emit("opv2v", late_fusion_config("opv2v", LIDAR_RANGE, early=False))
    emit("opv2v", late_fusion_config("opv2v", LIDAR_RANGE, early=True))
    emit("opv2v", pyramid_config("opv2v", LIDAR_RANGE, collab=True))
    emit("opv2v", pyramid_config("opv2v", LIDAR_RANGE, collab=False))
    for tag in ("m1", "m2", "m3"):
        emit("opv2v", gencomm_stage1_config("opv2v", tag, LIDAR_RANGE))
    for method in ("gencomm_stage2", "backalign", "codefilling", "mpda",
                   "stamp"):
        cfg = hetero_method_config("opv2v", method, LIDAR_RANGE)
        emit("opv2v", cfg, fname=f"{method}_m1m2")
    for core in ("second", "second_intermediate", "second_ssfa",
                 "second_ssfa_uncertainty", "ciassd", "fpvrcnn",
                 "point_pillar_uncertainty", "center_point",
                 "center_point_where2comm", "pixor", "voxel_net"):
        emit("opv2v", legacy_config("opv2v", core, LIDAR_RANGE))

    # camera-only / lidar-only fusion families (reference CameraOnly/*,
    # LiDAROnly/*: attfuse, fcooper, disco, v2vnet, v2xvit, cobevt,
    # coalign, pyramid)
    for prefix, tag in (("camera", "m2"), ("lidar", "m1")):
        sub = f"{prefix}_only"
        for method in ("att", "max", "disconet", "v2vnet", "v2xvit",
                       "cobevt", "where2comm", "who2com", "coalign"):
            cfg = intermediate_fusion_config(
                "opv2v", method, LIDAR_RANGE, tag=tag,
                name=f"opv2v_{prefix}_{method}")
            emit("opv2v", cfg, subdir=sub, fname=f"{prefix}_{method}")
        emit("opv2v",
             pyramid_config("opv2v", LIDAR_RANGE, collab=True, tag=tag,
                            name=f"opv2v_{prefix}_pyramid"),
             subdir=sub, fname=f"{prefix}_pyramid")
        if prefix == "lidar":
            for ms_method in ("att", "max"):
                emit("opv2v",
                     multiscale_fusion_config(
                         "opv2v", ms_method, LIDAR_RANGE,
                         name=f"opv2v_lidar_{ms_method}_multiscale"),
                     subdir=sub, fname=f"lidar_{ms_method}_multiscale")

    # multi-modality end-to-end training (reference MoreModality/
    # {2,3,4}_modality_end2end_training)
    for tags in (("m1", "m2"), ("m1", "m3"), ("m1", "m2", "m3"),
                 ("m1", "m2", "m3", "m4")):
        sub = f"more_modality/{len(tags)}_modality_end2end"
        for method in ("att", "max", "disconet", "v2vnet", "v2xvit",
                       "cobevt", "coalign"):
            cfg = multi_modality_config("opv2v", tags, method, LIDAR_RANGE)
            emit("opv2v", cfg, subdir=sub,
                 fname=f"{''.join(tags)}_{method}")

    # GenComm stage1 (all four agent types x {att, v2xvit}) + stage2
    for tag in ("m1", "m2", "m3", "m4"):
        for fusion in ("att", "v2xvit"):
            emit("opv2v",
                 gencomm_stage1_config("opv2v", tag, LIDAR_RANGE, fusion),
                 subdir="gencomm/stage1", fname=f"{tag}_{fusion}")
    for new_tag in ("m2", "m3", "m4"):
        for fusion in ("att", "v2xvit"):
            cfg = hetero_method_config("opv2v", "gencomm_stage2",
                                       LIDAR_RANGE, new_tag=new_tag,
                                       fusion=fusion)
            emit("opv2v", cfg, subdir="gencomm/stage2",
                 fname=f"m1{new_tag}_{fusion}")

    # hetero baselines stage1 (plain heter baseline per agent type) and
    # stage2 (reference GenComm_yamls/baselines/*)
    for tag in ("m1", "m2", "m3", "m4"):
        for fusion in ("att", "v2xvit"):
            cfg = intermediate_fusion_config(
                "opv2v", fusion, LIDAR_RANGE, tag=tag,
                name=f"opv2v_baseline_stage1_{tag}_{fusion}")
            emit("opv2v", cfg, subdir="baselines/stage1",
                 fname=f"{tag}_{fusion}")
    for method in ("backalign", "codefilling", "mpda"):
        for new_tag in ("m2", "m3", "m4"):
            for fusion in ("att", "v2xvit"):
                cfg = hetero_method_config("opv2v", method, LIDAR_RANGE,
                                           new_tag=new_tag, fusion=fusion)
                emit("opv2v", cfg, subdir=f"baselines/stage2/{method}",
                     fname=f"m1{new_tag}_{fusion}")
    # STAMP: m0 protocol modality + each agent type (baselines/stage2/STAMP)
    for new_tag in ("m1", "m2", "m3", "m4"):
        cfg = hetero_method_config("opv2v", "stamp", LIDAR_RANGE,
                                   base_tag="m0", new_tag=new_tag)
        emit("opv2v", cfg, subdir="baselines/stage2/stamp",
             fname=f"m0{new_tag}_att")

    # HEAL protocol (reference MoreModality/HEAL): per-type pyramid stage1,
    # single-alignment stage2, final joint inference
    for tag in ("m1", "m2", "m3", "m4"):
        emit("opv2v",
             pyramid_config("opv2v", LIDAR_RANGE, collab=True, tag=tag,
                            name=f"opv2v_heal_stage1_{tag}_pyramid"),
             subdir="heal/stage1", fname=f"{tag}_pyramid")
        emit("opv2v",
             pyramid_config("opv2v", LIDAR_RANGE, collab=False, tag=tag,
                            name=f"opv2v_heal_stage2_{tag}_single"),
             subdir="heal/stage2", fname=f"{tag}_single_pyramid")
    emit("opv2v",
         pyramid_collab_multi_config("opv2v", LIDAR_RANGE,
                                     tags=("m1", "m2")),
         subdir="heal/final_infer", fname="m1m2")
    emit("opv2v",
         pyramid_collab_multi_config("opv2v", LIDAR_RANGE,
                                     tags=("m1", "m2", "m3", "m4"),
                                     name="opv2v_heal_final_m1m2m3m4"),
         subdir="heal/final_infer", fname="m1m2m3m4")

    # single-agent pretrains (reference Single/*_pretrain.yaml)
    for tag in ("m1", "m2", "m3", "m4"):
        emit("opv2v", single_pretrain_config("opv2v", tag, LIDAR_RANGE),
             subdir="single", fname=f"{tag}_pretrain")

    # ----- other datasets -----
    # dairv2x (reference: 52 yamls): fusion family + late/early + pyramid +
    # gencomm + the hetero-method stack
    for method in FUSION_EXTRAS:
        emit("dairv2x",
             intermediate_fusion_config("dairv2x", method, DAIR_RANGE))
    emit("dairv2x", late_fusion_config("dairv2x", DAIR_RANGE, early=False))
    emit("dairv2x", late_fusion_config("dairv2x", DAIR_RANGE, early=True))
    emit("dairv2x", pyramid_config("dairv2x", DAIR_RANGE, collab=True))
    for tag in ("m1", "m2"):
        emit("dairv2x", gencomm_stage1_config("dairv2x", tag, DAIR_RANGE))
    for method in ("gencomm_stage2", "backalign", "codefilling", "mpda",
                   "stamp"):
        cfg = hetero_method_config("dairv2x", method, DAIR_RANGE)
        emit("dairv2x", cfg, fname=f"{method}_m1m2")
    # camera-only fusion family (reference dairv2x/CameraOnly/*: attfuse,
    # coalign, cobevt, disco, fcooper, pyramid, v2xvit — single veh/inf
    # camera per side, sensor m2)
    for method in ("att", "max", "disconet", "v2xvit", "cobevt", "coalign"):
        cfg = intermediate_fusion_config(
            "dairv2x", method, DAIR_RANGE, tag="m2",
            name=f"dairv2x_camera_{method}")
        emit("dairv2x", cfg, subdir="camera_only", fname=f"camera_{method}")
    emit("dairv2x",
         pyramid_config("dairv2x", DAIR_RANGE, collab=True, tag="m2",
                        name="dairv2x_camera_pyramid"),
         subdir="camera_only", fname="camera_pyramid")
    # GenComm stage1/stage2 per agent-type pair (reference GenComm_yamls/
    # {gencomm,baselines}: m1=veh pillar, m3=SECOND; att + v2xvit fusion)
    for tag in ("m1", "m3"):
        for fusion in ("att", "v2xvit"):
            emit("dairv2x",
                 gencomm_stage1_config("dairv2x", tag, DAIR_RANGE, fusion),
                 subdir="gencomm/stage1", fname=f"{tag}_{fusion}")
            cfg = intermediate_fusion_config(
                "dairv2x", fusion, DAIR_RANGE, tag=tag,
                name=f"dairv2x_baseline_stage1_{tag}_{fusion}")
            emit("dairv2x", cfg, subdir="baselines/stage1",
                 fname=f"{tag}_{fusion}")
    for fusion in ("att", "v2xvit"):
        cfg = hetero_method_config("dairv2x", "gencomm_stage2", DAIR_RANGE,
                                   new_tag="m3", fusion=fusion)
        emit("dairv2x", cfg, subdir="gencomm/stage2",
             fname=f"m1m3_{fusion}")
        for method in ("backalign", "codefilling", "mpda"):
            cfg = hetero_method_config("dairv2x", method, DAIR_RANGE,
                                       new_tag="m3", fusion=fusion)
            emit("dairv2x", cfg, subdir=f"baselines/stage2/{method}",
                 fname=f"m1m3_{fusion}")
        for new_tag in ("m1", "m3"):
            cfg = hetero_method_config("dairv2x", "stamp", DAIR_RANGE,
                                       base_tag="m0", new_tag=new_tag,
                                       fusion=fusion)
            emit("dairv2x", cfg, subdir="baselines/stage2/stamp",
                 fname=f"m0{new_tag}_{fusion}")
    # 2-modality end-to-end training (reference MoreModality/
    # 2_modality_end2end_training: lidar+camera x 7 fusions)
    for method in ("att", "max", "disconet", "v2xvit", "cobevt", "coalign",
                   "v2vnet"):
        cfg = multi_modality_config("dairv2x", ("m1", "m2"), method,
                                    DAIR_RANGE)
        emit("dairv2x", cfg, subdir="more_modality/2_modality_end2end",
             fname=f"lidar_camera_{method}")
    # HEAL protocol (reference MoreModality/HEAL)
    emit("dairv2x",
         pyramid_config("dairv2x", DAIR_RANGE, collab=True, tag="m1",
                        name="dairv2x_heal_stage1_m1_pyramid"),
         subdir="heal/stage1", fname="m1_pyramid")
    for tag in ("m2", "m3", "m4"):
        emit("dairv2x",
             pyramid_config("dairv2x", DAIR_RANGE, collab=False, tag=tag,
                            name=f"dairv2x_heal_stage2_{tag}_single"),
             subdir="heal/stage2", fname=f"{tag}_single_pyramid")
    emit("dairv2x",
         pyramid_collab_multi_config("dairv2x", DAIR_RANGE,
                                     tags=("m1", "m2"),
                                     name="dairv2x_heal_final_m1m2"),
         subdir="heal/final_infer", fname="m1m2")
    # single-side pretrains (reference Single/DAIR_single_*: pillar,
    # LSS-efficientnet analog, LSS-resnet analog, SECOND)
    for tag, fname in (("m1", "single_m1"), ("m2", "single_m2_lss"),
                       ("m4", "single_m2_lss_deep"),
                       ("m3", "single_m2_second")):
        emit("dairv2x", single_pretrain_config("dairv2x", tag, DAIR_RANGE),
             subdir="single", fname=fname)

    # v2xset (reference: 18): lidar/camera fusion families + HEAL
    # protocol + single pretrains + gencomm
    for method in FUSION_EXTRAS:
        emit("v2xset",
             intermediate_fusion_config("v2xset", method, LIDAR_RANGE))
    emit("v2xset", gencomm_stage1_config("v2xset", "m1", LIDAR_RANGE))
    emit("v2xset", hetero_method_config("v2xset", "gencomm_stage2",
                                        LIDAR_RANGE),
         fname="gencomm_stage2_m1m2")
    for method in ("att", "coalign"):
        cfg = intermediate_fusion_config(
            "v2xset", method, LIDAR_RANGE, tag="m2",
            name=f"v2xset_camera_{method}")
        emit("v2xset", cfg, subdir="camera_only", fname=f"camera_{method}")
    emit("v2xset",
         pyramid_config("v2xset", LIDAR_RANGE, collab=True, tag="m2",
                        name="v2xset_camera_pyramid"),
         subdir="camera_only", fname="camera_pyramid")
    emit("v2xset",
         pyramid_config("v2xset", LIDAR_RANGE, collab=True,
                        name="v2xset_lidar_pyramid"),
         fname="lidar_pyramid")
    emit("v2xset",
         pyramid_config("v2xset", LIDAR_RANGE, collab=True, tag="m1",
                        name="v2xset_heal_stage1_m1_pyramid"),
         subdir="heal/stage1", fname="m1_pyramid")
    for tag in ("m2", "m3", "m4"):
        emit("v2xset",
             pyramid_config("v2xset", LIDAR_RANGE, collab=False, tag=tag,
                            name=f"v2xset_heal_stage2_{tag}_single"),
             subdir="heal/stage2", fname=f"{tag}_single_pyramid")
    emit("v2xset",
         pyramid_collab_multi_config("v2xset", LIDAR_RANGE,
                                     tags=("m1", "m2", "m3", "m4"),
                                     name="v2xset_heal_final_m1m2m3m4"),
         subdir="heal/final_infer", fname="m1m2m3m4")
    for tag in ("m1", "m2", "m3", "m4"):
        emit("v2xset", single_pretrain_config("v2xset", tag, LIDAR_RANGE),
             subdir="single", fname=f"{tag}_pretrain")

    # v2xsim (reference: 6 incl. single + visualization)
    for method in ("att", "max", "v2xvit", "disconet", "cobevt"):
        emit("v2xsim",
             intermediate_fusion_config("v2xsim", method, LIDAR_RANGE))
    emit("v2xsim", gencomm_stage1_config("v2xsim", "m1", LIDAR_RANGE))
    emit("v2xsim", single_pretrain_config("v2xsim", "m1", LIDAR_RANGE),
         subdir="single", fname="m1_pointpillar")

    # v2xreal (reference: 27): the GenComm protocol over four pillar-lidar
    # agent types with the multi-class schema (v2xreal_ify), plus the
    # homogeneous fusion family
    for method in FUSION_EXTRAS:
        emit("v2xreal", v2xreal_ify(
            intermediate_fusion_config("v2xreal", method, V2XREAL_RANGE)))
    for tag in ("m1", "m2", "m3", "m4"):
        emit("v2xreal", v2xreal_ify(
            gencomm_stage1_config("v2xreal", tag, V2XREAL_RANGE)),
            subdir="gencomm/stage1", fname=f"{tag}_att")
        emit("v2xreal", v2xreal_ify(
            intermediate_fusion_config(
                "v2xreal", "att", V2XREAL_RANGE, tag=tag,
                name=f"v2xreal_baseline_stage1_{tag}_attfuse")),
            subdir="baselines/stage1", fname=f"{tag}_attfuse")
    for new_tag in ("m2", "m3", "m4"):
        emit("v2xreal", v2xreal_ify(
            hetero_method_config("v2xreal", "gencomm_stage2",
                                 V2XREAL_RANGE, new_tag=new_tag)),
            subdir="gencomm/stage2", fname=f"m1{new_tag}_att")
        for method in ("backalign", "codefilling", "mpda"):
            emit("v2xreal", v2xreal_ify(
                hetero_method_config("v2xreal", method, V2XREAL_RANGE,
                                     new_tag=new_tag)),
                subdir=f"baselines/stage2/{method}",
                fname=f"m1{new_tag}_att")
    for new_tag in ("m1", "m2", "m3", "m4"):
        emit("v2xreal", v2xreal_ify(
            hetero_method_config("v2xreal", "stamp", V2XREAL_RANGE,
                                 base_tag="m0", new_tag=new_tag)),
            subdir="baselines/stage2/stamp", fname=f"m0{new_tag}_att")

    print(f"emitted {len(emitted)} configs")
    return emitted


if __name__ == "__main__":
    main()
