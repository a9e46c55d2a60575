"""Train CLI end-to-end: tiny config, checkpointing, auto-resume.

Covers tools/train.py main() — config load, model/loss build via
registries, freeze derivation, checkpoint save — and the auto-resume
behavior (reference train_utils.load_saved_model:168-216: find the newest
checkpoint in model_dir and continue from its epoch).
"""

import os

import yaml
import pytest

# heavy suite: excluded from the fast subset (`pytest -m "not slow"`, VERDICT r3 #9)
pytestmark = pytest.mark.slow


TINY_HYPES = {
    "name": "tiny_cli",
    "yaml_parser": "load_general_params",
    "train_params": {"batch_size": 1, "epoches": 1, "save_freq": 1,
                     "max_cav": 2},
    "input_source": ["lidar"],
    "comm_range": 20,
    "cav_lidar_range": [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0],
    "preprocess": {"core_method": "SpVoxelPreprocessor",
                   "args": {"voxel_size": [0.4, 0.4, 4.0]},
                   "cav_lidar_range": [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0]},
    "postprocess": {
        "core_method": "VoxelPostprocessor",
        "gt_range": [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0],
        "anchor_args": {"cav_lidar_range": [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0],
                        "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
                        # the tiny backbone ([2,2] strides, [1,2] upsample,
                        # stride-2 shrink) has a true output stride of 4
                        "feature_stride": 4, "num": 2},
        "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                        "score_threshold": 0.2},
        "order": "hwl", "max_num": 16, "nms_thresh": 0.15,
        "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                     "anchor_yaw": [0, 90]},
    },
    "model": {"core_method": "heter_model_baseline", "args": {
        "ego_modality": "m1",
        "lidar_range": [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0],
        "m1": {
            "core_method": "point_pillar", "sensor_type": "lidar",
            "encoder_args": {
                "voxel_size": [0.4, 0.4, 4.0],
                "lidar_range": [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0],
                "pillar_vfe": {"use_norm": True, "num_filters": [32]},
            },
            "backbone_args": {"layer_nums": [1, 1], "layer_strides": [2, 2],
                              "num_filters": [32, 64],
                              "upsample_strides": [1, 2],
                              "num_upsample_filter": [32, 32]},
            "shrink_header": {"kernal_size": [3], "stride": [2],
                              "padding": [1], "dim": [64], "input_dim": 64},
        },
        "fusion_method": "att", "att": {"feat_dim": 64},
        "in_head": 64, "anchor_number": 2,
        "dir_args": {"dir_offset": 0.7853, "num_bins": 2,
                     "anchor_yaw": [0, 90]},
    }},
    "loss": {"core_method": "point_pillar_loss", "args": {
        "pos_cls_weight": 2.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
        "reg": {"sigma": 3.0, "weight": 2.0},
    }},
    "optimizer": {"core_method": "Adam", "lr": 0.002,
                  "args": {"eps": 1e-10, "weight_decay": 1e-4}},
    "lr_scheduler": {"core_method": "constant"},
}


@pytest.mark.slow
def test_train_cli_checkpoints_and_resumes(tmp_path, capsys):
    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.train import checkpoint

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY_HYPES))
    model_dir = str(tmp_path / "run")

    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "synthetic", "--epochs", "1",
                    "--steps_per_epoch", "2"])
    first = checkpoint.latest_checkpoint(model_dir)
    assert first is not None
    assert os.path.exists(os.path.join(model_dir, "config.yaml"))

    # second invocation resumes from the saved epoch and trains one more
    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "synthetic", "--epochs", "2",
                    "--steps_per_epoch", "2"])
    out = capsys.readouterr().out
    assert "resumed from" in out
    second = checkpoint.latest_checkpoint(model_dir)
    assert second != first


def _tiny_variant(core_method):
    import copy

    cfg = copy.deepcopy(TINY_HYPES)
    cfg["name"] = f"tiny_{core_method}"
    if core_method == "ciassd":
        cfg["preprocess"]["args"]["voxel_size"] = [0.2, 0.2, 0.1]
        cfg["postprocess"]["anchor_args"]["feature_stride"] = 8
        cfg["model"] = {"core_method": "ciassd", "args": {
            "lidar_range": cfg["cav_lidar_range"],
            "voxel_size": [0.2, 0.2, 0.1],
            "max_voxels": 4096,
            "mean_vfe": {"num_point_features": 4},
            "spconv": {"num_features_in": 4, "num_features_out": 64},
            "map2bev": {"feature_num": 128},
            "ssfa": {"feature_num": 128},
            "head": {"num_input": 128, "num_pred": 14, "num_cls": 2,
                     "num_iou": 2, "use_dir": True, "num_dir": 4},
        }}
        cfg["loss"] = {"core_method": "ciassd_loss", "args": {
            "pos_cls_weight": 1.5,
            "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
            "reg": {"sigma": 3.0, "weight": 2.0},
            "dir": {"weight": 0.2, "args": {"num_bins": 2,
                    "anchor_yaw": [0, 90], "dir_offset": 0.7853}},
            "iou": {"sigma": 3.0, "weight": 1.0},
        }}
    elif core_method == "early":
        cfg["fusion"] = {"core_method": "early", "dataset": "opv2v",
                         "args": {"proj_first": True}}
    elif core_method == "late":
        cfg["fusion"] = {"core_method": "late", "dataset": "opv2v",
                         "args": {}}
    return cfg


@pytest.mark.parametrize("variant", ["ciassd", "early", "late"])
def test_train_cli_per_slot_and_fusion_modes(tmp_path, variant):
    """The review-found integration breaks: per-slot legacy models must
    train against (B, ...) labels (ego-slot adaptation), and early/late
    fusion configs must actually reshape the batch."""
    import yaml as pyyaml
    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.train import checkpoint

    cfg = _tiny_variant(variant)
    cfg_path = tmp_path / f"{variant}.yaml"
    cfg_path.write_text(pyyaml.safe_dump(cfg))
    model_dir = str(tmp_path / f"run_{variant}")
    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "synthetic", "--epochs", "1",
                    "--steps_per_epoch", "1"])
    assert checkpoint.latest_checkpoint(model_dir) is not None


@pytest.mark.slow
def test_train_cli_gmatch_mode(tmp_path):
    """--trainer gmatch drives the second-order gradient-matching step
    (reference tools/train_gmatch.py) through the CLI."""
    import copy
    import yaml as pyyaml
    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.train import checkpoint

    cfg = copy.deepcopy(TINY_HYPES)
    cfg["name"] = "tiny_gmatch"
    args = cfg["model"]["args"]
    args["message_extractor"] = {"in_ch": 64, "out_ch": 2}
    args["gencomm"] = {
        "model": {"ch": 4, "ch_mult": [1], "num_res_blocks": 1},
        "diffusion": {"num_diffusion_timesteps": 2},
    }
    cfg["model"]["core_method"] = "heter_model_baseline_w_gencomm_stage1"
    cfg["loss"] = {"core_method": "point_pillar_gmatch_loss", "args": {
        "pos_cls_weight": 2.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
        "reg": {"sigma": 3.0, "weight": 2.0},
        "generate_weight": 1.0,
    }}
    cfg_path = tmp_path / "gmatch.yaml"
    cfg_path.write_text(pyyaml.safe_dump(cfg))
    model_dir = str(tmp_path / "run_gmatch")
    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "synthetic", "--epochs", "1",
                    "--steps_per_epoch", "1", "--trainer", "gmatch"])
    assert checkpoint.latest_checkpoint(model_dir) is not None


@pytest.mark.slow
def test_train_cli_supervise_single(tmp_path):
    """supervise_single: per-agent heads trained against per-agent labels
    (reference train.py:152-158 double criterion pass)."""
    import copy
    import yaml as pyyaml
    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.train import checkpoint

    cfg = copy.deepcopy(TINY_HYPES)
    cfg["name"] = "tiny_single"
    cfg["model"]["args"]["supervise_single"] = True
    cfg_path = tmp_path / "single.yaml"
    cfg_path.write_text(pyyaml.safe_dump(cfg))
    model_dir = str(tmp_path / "run_single")
    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "synthetic", "--epochs", "1",
                    "--steps_per_epoch", "1"])
    assert checkpoint.latest_checkpoint(model_dir) is not None


def test_per_agent_label_batch_flattens():
    from gencomm_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
    from gencomm_tpu.data.bucketing import per_agent_label_batch
    import numpy as np

    cfg = SyntheticConfig(
        lidar_range=(-16.0, -8.0, -3.0, 16.0, 8.0, 1.0), max_cav=3,
        num_agents=2, points_per_agent=512, num_vehicles=2,
        points_per_vehicle=64, per_agent_labels=True,
    )
    b = SyntheticScenes(cfg).sample(0, 2)
    out = per_agent_label_batch(b)
    assert out["pos_equal_one"].shape[0] == 2 * 3  # B*L leading dim
    # ego rows match the original ego-frame labels
    np.testing.assert_allclose(out["pos_equal_one"][0], b["pos_equal_one"][0])
    np.testing.assert_allclose(out["pos_equal_one"][3], b["pos_equal_one"][1])


@pytest.mark.slow
def test_train_cli_bestval_and_clean(tmp_path, capsys):
    """Validation loop + rolling bestval checkpoint (reference
    train.py:169-214) and heal_tools best/clean (find_best_checkpoint,
    cleanup_utils.clean_all_numeric_checkpoint)."""
    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.tools import heal_tools
    from gencomm_tpu.train import checkpoint

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY_HYPES))
    model_dir = str(tmp_path / "run")

    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "synthetic", "--epochs", "3",
                    "--steps_per_epoch", "2", "--val_steps", "1"])
    out = capsys.readouterr().out
    assert "val loss" in out
    best = checkpoint.bestval_checkpoint(model_dir)
    assert best is not None and "bestval_at_" in best
    # exactly one rolling bestval dir
    n_best = sum(1 for d in os.listdir(model_dir)
                 if d.startswith("bestval_at_"))
    assert n_best == 1

    # heal_tools best prefers bestval
    class A:  # argparse stand-in
        pass
    a = A(); a.model_dir = model_dir
    assert heal_tools.best(a) == best

    # clean keeps first + latest step ckpts and bestval
    steps_before = sorted(d for d in os.listdir(model_dir)
                          if d.startswith("step_"))
    assert len(steps_before) >= 3
    c = A(); c.path = model_dir
    heal_tools.clean(c)
    steps_after = sorted(d for d in os.listdir(model_dir)
                         if d.startswith("step_"))
    assert steps_after == [steps_before[0], steps_before[-1]] or \
        set(steps_after) == {steps_before[0], steps_before[-1]}
    assert checkpoint.bestval_checkpoint(model_dir) == best


def test_update_yaml_rederives_anchors():
    """config.update_yaml (yaml_utils_stamp.update_yaml:100 parity): after
    a runtime range override the derivation parsers recompute the anchor
    grid (the reference's inference.py --range flow)."""
    import copy
    from gencomm_tpu.config.yaml_utils import update_yaml

    cfg = copy.deepcopy(TINY_HYPES)
    cfg = update_yaml(cfg)
    w0 = cfg["postprocess"]["anchor_args"]["W"]
    big = [-32.0, -16.0, -3.0, 32.0, 16.0, 1.0]
    cfg["cav_lidar_range"] = list(big)
    cfg["preprocess"]["cav_lidar_range"] = list(big)
    cfg["postprocess"]["anchor_args"]["cav_lidar_range"] = list(big)
    cfg["postprocess"]["gt_range"] = list(big)
    cfg2 = update_yaml(cfg)
    assert cfg2["postprocess"]["anchor_args"]["W"] == 2 * w0


@pytest.mark.slow
def test_inference_cli_range_override_and_bestval(tmp_path, capsys):
    """inference CLI: --range re-derives the anchor grid (reference
    inference.py:50-73) and the bestval checkpoint is preferred over
    latest (train_utils.load_saved_model)."""
    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.tools import inference as infer_cli

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY_HYPES))
    model_dir = str(tmp_path / "run")
    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "synthetic", "--epochs", "1",
                    "--steps_per_epoch", "2", "--val_steps", "1"])
    capsys.readouterr()

    infer_cli.main(["--model_dir", model_dir, "--dataset", "synthetic",
                    "--frames", "2",
                    "--range=-32.0,-16.0,-3.0,32.0,16.0,1.0"])
    out = capsys.readouterr().out
    assert "bestval_at_" in out or "loaded" in out.lower() or "ap" in out.lower()


def test_metrics_logger(tmp_path):
    """MetricsLogger: JSONL always, tensorboard scalars when tensorboardX
    is importable (reference: per-loss logging() -> SummaryWriter)."""
    import json
    from gencomm_tpu.train.metrics import MetricsLogger

    m = MetricsLogger(str(tmp_path))
    m.log(0, {"total_loss": 1.5}, prefix="train/")
    m.log(10, {"total_loss": 1.2}, prefix="val/")
    m.close()
    lines = [json.loads(x) for x in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["train/total_loss"] == 1.5
    assert lines[1]["val/total_loss"] == 1.2 and lines[1]["step"] == 10


@pytest.mark.slow
def test_bestval_survives_resume(tmp_path, capsys):
    """A resumed run must not overwrite a better existing bestval: the
    best val loss is persisted in bestval.json (review finding — best_val
    used to reset to inf on every invocation)."""
    import json
    from gencomm_tpu.tools import train as train_cli
    from gencomm_tpu.train import checkpoint

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY_HYPES))
    model_dir = str(tmp_path / "run")
    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "synthetic", "--epochs", "1",
                    "--steps_per_epoch", "2", "--val_steps", "1"])
    best1 = checkpoint.bestval_checkpoint(model_dir)
    # pretend the recorded best is unbeatable
    with open(os.path.join(model_dir, "bestval.json"), "w") as f:
        json.dump({"val_loss": 0.0, "epoch": 1}, f)
    train_cli.main(["-y", str(cfg_path), "--model_dir", model_dir,
                    "--dataset", "synthetic", "--epochs", "2",
                    "--steps_per_epoch", "2", "--val_steps", "1"])
    assert checkpoint.bestval_checkpoint(model_dir) == best1
