"""Model zoo. ``create_model`` is the explicit-registry analog of the
reference's reflection loader (opencood/tools/train_utils.py:255-288)."""

from __future__ import annotations


def create_model(hypes: dict):
    core = hypes["model"]["core_method"].lower()
    if "pyramid" in core:
        from gencomm_tpu.models.heter_pyramid import build_pyramid_model

        return build_pyramid_model(hypes)
    from gencomm_tpu.models.heter_baseline import build_model

    return build_model(hypes)
