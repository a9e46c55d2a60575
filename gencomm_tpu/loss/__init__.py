"""Loss registry population (reference: opencood/loss/* via reflection,
here explicit imports)."""

from gencomm_tpu.loss import point_pillar_loss as _pp  # noqa: F401
from gencomm_tpu.loss import pyramid_loss as _pyr  # noqa: F401
from gencomm_tpu.loss import ciassd_loss as _ci  # noqa: F401
from gencomm_tpu.loss import legacy_losses as _ll  # noqa: F401
from gencomm_tpu.loss import v2xreal_loss as _vr  # noqa: F401
from gencomm_tpu.models import center_point as _cp  # noqa: F401
from gencomm_tpu.models.encoders import pixor as _px  # noqa: F401

from gencomm_tpu.registry import LOSSES


def create_loss(hypes: dict):
    """Build the criterion named by ``loss.core_method``
    (train_utils.py:291-324). Injects the pyramid mode tag from the model
    core_method (the reference tags it in the model's output_dict), and the
    anchor grid for IoU-rescore losses (the reference reads it from
    output_dict['anchor_box'])."""
    args = dict(hypes["loss"]["args"])
    core = hypes.get("model", {}).get("core_method", "").lower()
    if "pyramid" in args and isinstance(args["pyramid"], dict):
        mode = "collab" if "collab" in core else "single"
        args["pyramid"] = dict(args["pyramid"])
        args["pyramid"].setdefault("mode", mode)
    # losses that decode boxes on a metric grid (center_point, pixor) need
    # the lidar range; the reference reads it from the model output_dict
    mr = hypes.get("model", {}).get("args", {}).get("lidar_range")
    if mr is not None:
        args.setdefault("lidar_range", mr)
    needs_anchors = "iou" in args or "stage1" in args
    if needs_anchors and "_anchors" not in args \
            and "anchor_args" in hypes.get("postprocess", {}):
        from gencomm_tpu.data.postprocessor import generate_anchor_box

        anchors = generate_anchor_box(hypes["postprocess"]["anchor_args"])
        args["_anchors"] = anchors
        if isinstance(args.get("stage1"), dict):
            args["stage1"] = dict(args["stage1"], _anchors=anchors)
    criterion = LOSSES.get(hypes["loss"]["core_method"])(args)

    # supervise_single: second criterion pass over the per-agent heads
    # against per-agent labels (reference tools/train.py:152-158 calls the
    # criterion twice and sums; labels from *_single keys, agents folded
    # into the batch axis)
    if hypes.get("model", {}).get("args", {}).get("supervise_single"):
        base = criterion

        def with_single(output, target, suffix=""):
            losses = base(output, target, suffix)
            if "cls_preds_single" in output \
                    and "pos_equal_one_single" in target:
                tgt = {
                    k[: -len("_single")]: v.reshape((-1,) + v.shape[2:])
                    for k, v in target.items() if k.endswith("_single")
                }
                single = base(output, tgt, suffix="_single")
                for k, v in single.items():
                    if k != "total_loss":
                        losses[f"single_{k}"] = v
                losses["total_loss"] = (
                    losses["total_loss"] + single["total_loss"]
                )
            return losses

        return with_single
    return criterion
