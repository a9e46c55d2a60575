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
DAIR_RANGE = [-100.8, -40, -3.5, 100.8, 40, 1.5]
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


def camera_branch(lidar_range):
    cm = camera_modality()
    return {
        "core_method": "lift_splat_shoot",
        "sensor_type": "camera",
        "encoder_args": {"grid_conf": cm["grid_conf"],
                         "data_aug_conf": cm["data_aug_conf"],
                         "img_downsample": 8, "img_features": 128,
                         "lidar_range": list(lidar_range)},
        "backbone_args": {"layer_nums": [3, 5, 8],
                          "layer_strides": [2, 2, 2],
                          "num_filters": [64, 128, 256],
                          "upsample_strides": [1, 2, 4],
                          "num_upsample_filter": [128, 128, 128]},
        "aligner_args": {"core_method": "identity"},
        "shrink_header": {"kernal_size": [3], "stride": [2], "padding": [1],
                          "dim": [128], "input_dim": 384},
    }


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


def intermediate_fusion_config(dataset, method, lidar_range):
    cfg = base_config(f"{dataset}_point_pillar_{method}", dataset,
                      lidar_range)
    args = {
        "ego_modality": "m1",
        "lidar_range": list(lidar_range),
        "m1": pillar_branch(lidar_range),
        "fusion_method": method,
        "in_head": 128,
        "anchor_number": 2,
        "dir_args": dict(DIR_ARGS),
    }
    args.update(copy.deepcopy(FUSION_EXTRAS[method]))
    cfg["model"] = {"core_method": "heter_model_baseline", "args": args}
    cfg["loss"] = detection_loss()
    return cfg


def gencomm_stage1_config(dataset, modality_core, lidar_range, tag):
    cfg = intermediate_fusion_config(dataset, "att", lidar_range)
    cfg["name"] = f"{dataset}_gencomm_stage1_{tag}_att"
    args = cfg["model"]["args"]
    args["message_extractor"] = {"in_ch": 128, "out_ch": 2}
    args["enhancer"] = {"in_ch": 128}
    args["gencomm"] = {
        "model": {"embed_dim": 130, "in_channels": 128, "out_ch": 128,
                  "ch": 8, "ch_mult": [1, 1], "num_res_blocks": 2,
                  "attn_resolutions": [16], "dropout": 0.0,
                  "resamp_with_conv": True},
        "diffusion": {"beta_schedule": "linear", "beta_start": 0.0005,
                      "beta_end": 0.02, "num_diffusion_timesteps": 3},
    }
    cfg["model"]["core_method"] = "heter_model_baseline_w_gencomm_stage1"
    cfg["loss"] = detection_loss("point_pillar_gencomm_loss",
                                 {"generate_weight": 1})
    if modality_core == "second":
        args["m1"] = copy.deepcopy(args["m1"])
        args["m1"]["core_method"] = "second"
        args["m1"]["encoder_args"] = {
            "voxel_size": [0.1, 0.1, 0.1],
            "lidar_range": list(lidar_range),
            "max_voxels": 32000,
            "spconv": {"num_features_in": 4, "num_features_out": 128},
        }
        cfg["heter"]["modality_setting"]["m1"]["core_method"] = "second"
    elif modality_core == "lift_splat_shoot":
        args["m1"] = camera_branch(lidar_range)
        cfg["heter"]["modality_setting"]["m1"] = camera_modality()
        cfg["input_source"] = ["camera"]
        cfg["loss"] = detection_loss(
            "point_pillar_depth_loss",
            {"generate_weight": 1, "depth": {"weight": 1.0}})
    return cfg


def hetero_method_config(dataset, method, lidar_range):
    """BackAlign / CodeFilling / MPDA / STAMP / GenComm-stage2: m1 pillar
    base + m2 camera newcomer."""
    cfg = intermediate_fusion_config(dataset, "att", lidar_range)
    cfg["name"] = f"{dataset}_{method}_m1m2"
    cfg["input_source"] = ["lidar", "camera"]
    cfg["heter"]["mapping_dict"] = {"m1": "m1", "m2": "m2",
                                    "m3": "m1", "m4": "m2"}
    cfg["heter"]["modality_setting"]["m2"] = camera_modality()
    args = cfg["model"]["args"]
    args["m2"] = camera_branch(lidar_range)
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
        for m in ("m1", "m2"):
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
        args["gencomm"] = {
            "model": {"embed_dim": 130, "in_channels": 128, "out_ch": 128,
                      "ch": 8, "ch_mult": [1, 1], "num_res_blocks": 2,
                      "attn_resolutions": [16], "dropout": 0.0,
                      "resamp_with_conv": True},
            "diffusion": {"beta_schedule": "linear", "beta_start": 0.0005,
                          "beta_end": 0.02, "num_diffusion_timesteps": 3},
        }
        cfg["loss"] = detection_loss("point_pillar_gencomm_loss",
                                     {"generate_weight": 1})
    return cfg


def pyramid_config(dataset, lidar_range, collab=True):
    cfg = base_config(
        f"{dataset}_heal_pyramid_{'collab' if collab else 'single'}",
        dataset, lidar_range)
    args = {
        "ego_modality": "m1",
        "lidar_range": list(lidar_range),
        "m1": pillar_branch(lidar_range),
        "fusion_method": "pyramid",
        "fusion_backbone": {"resnext": True, "layer_nums": [3, 5, 8],
                            "layer_strides": [1, 2, 2],
                            "num_filters": [64, 128, 256],
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
    cfg["loss"] = detection_loss(
        "point_pillar_pyramid_loss",
        {"pyramid": {"relative_downsample": [1, 2, 4],
                     "weight": [0.4, 0.2, 0.1]},
         "depth": {"weight": 1.0}})
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
    elif core in ("center_point", "center_point_baseline"):
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

    def emit(dataset, cfg):
        d = os.path.join(args.out, dataset)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, cfg["name"].replace(f"{dataset}_", "", 1)
                            + ".yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        emitted.append(path)

    # opv2v: the full homogeneous fusion family
    for method in FUSION_EXTRAS:
        emit("opv2v", intermediate_fusion_config("opv2v", method,
                                                 LIDAR_RANGE))
    emit("opv2v", late_fusion_config("opv2v", LIDAR_RANGE, early=False))
    emit("opv2v", late_fusion_config("opv2v", LIDAR_RANGE, early=True))
    # HEAL pyramid
    emit("opv2v", pyramid_config("opv2v", LIDAR_RANGE, collab=True))
    emit("opv2v", pyramid_config("opv2v", LIDAR_RANGE, collab=False))
    # GenComm stage 1 per agent type + stage 2 & hetero baselines
    for tag, core in (("m1", "point_pillar"), ("m3", "second"),
                      ("m2", "lift_splat_shoot")):
        emit("opv2v", gencomm_stage1_config("opv2v", core, LIDAR_RANGE, tag))
    for method in ("gencomm_stage2", "backalign", "codefilling", "mpda",
                   "stamp"):
        emit("opv2v", hetero_method_config("opv2v", method, LIDAR_RANGE))
    # legacy detectors
    for core in ("second", "second_intermediate", "second_ssfa",
                 "second_ssfa_uncertainty", "ciassd", "fpvrcnn",
                 "point_pillar_uncertainty", "center_point", "pixor",
                 "voxel_net"):
        emit("opv2v", legacy_config("opv2v", core, LIDAR_RANGE))

    # other datasets: att baseline + gencomm stage1/stage2
    for ds, rng_ in (("dairv2x", DAIR_RANGE), ("v2xset", LIDAR_RANGE),
                     ("v2xsim", LIDAR_RANGE), ("v2xreal", LIDAR_RANGE)):
        emit(ds, intermediate_fusion_config(ds, "att", rng_))
        emit(ds, gencomm_stage1_config(ds, "point_pillar", rng_, "m1"))
    emit("dairv2x", hetero_method_config("dairv2x", "gencomm_stage2",
                                         DAIR_RANGE))

    print(f"emitted {len(emitted)} configs")
    return emitted


if __name__ == "__main__":
    main()
