"""Loss registry population (reference: opencood/loss/* via reflection,
here explicit imports)."""

from gencomm_tpu.loss import point_pillar_loss as _pp  # noqa: F401
from gencomm_tpu.loss import pyramid_loss as _pyr  # noqa: F401
from gencomm_tpu.models import center_point as _cp  # noqa: F401
from gencomm_tpu.models.encoders import pixor as _px  # noqa: F401

from gencomm_tpu.registry import LOSSES


def create_loss(hypes: dict):
    """Build the criterion named by ``loss.core_method``
    (train_utils.py:291-324). Injects the pyramid mode tag from the model
    core_method (the reference tags it in the model's output_dict)."""
    args = dict(hypes["loss"]["args"])
    core = hypes.get("model", {}).get("core_method", "").lower()
    if "pyramid" in args and isinstance(args["pyramid"], dict):
        mode = "collab" if "collab" in core else "single"
        args["pyramid"] = dict(args["pyramid"])
        args["pyramid"].setdefault("mode", mode)
    return LOSSES.get(hypes["loss"]["core_method"])(args)
