"""Paper-figure plotting (visualization/paper_plots.py): each figure
renders from measured-style data and lands on disk.

Parity: opencood/visualization/{ap_vs_noise_line_plot, scalbility,
ap_vs_fps_scatter_plot}.py (hardcoded-data scripts in the reference)."""

import os

import pytest

mpl = pytest.importorskip("matplotlib")

from gencomm_tpu.visualization import paper_plots  # noqa: E402


def test_ap_curve_and_scatter(tmp_path):
    res = {0.0: {"ap50": 0.78, "ap70": 0.61},
           0.2: {"ap50": 0.74, "ap70": 0.55},
           0.4: {"ap50": 0.66, "ap70": 0.47}}
    p1 = paper_plots.plot_ap_curve(res, str(tmp_path / "noise.png"),
                                   "pose noise sigma")
    p2 = paper_plots.plot_scatter({"GenComm": (114.0, 0.75),
                                   "STAMP": (60.0, 0.76)},
                                  str(tmp_path / "fps.png"), "fps")
    p3 = paper_plots.plot_scalability(str(tmp_path / "scal.png"))
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_measured_added_params_matches_poster_scale():
    m = paper_plots.measured_gencomm_added_params()
    # reference poster: GenComm adds 0.31 M params total; the per-agent
    # message extractor is the dominant share and must stay well under
    # every baseline (STAMP 1.64 M)
    assert 0.01 < m < 0.6


def test_collect_sweep_reads_eval_yamls(tmp_path):
    import yaml

    for lv, ap in ((0.0, 0.8), (0.2, 0.7)):
        with open(tmp_path / f"eval_noise_{lv}.yaml", "w") as f:
            yaml.safe_dump({"ap50": ap, "ap70": ap - 0.1}, f)
    res = paper_plots.collect_sweep(str(tmp_path), "noise")
    assert res[0.0]["ap50"] == 0.8 and res[0.2]["ap70"] == pytest.approx(0.6)
