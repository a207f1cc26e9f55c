"""Labeled conditioning visualizations (reference ImageNeighborPlotter,
transformer.py:534-547, and ldm.util.log_txt_as_img used at
ddpm.py:524-529)."""

import numpy as np


def test_log_txt_as_img_renders_text():
    from rdm_tpu.diagnostics import log_txt_as_img

    imgs = log_txt_as_img((64, 32), ["tench", "goldfish"])
    assert imgs.shape == (2, 32, 64, 3) and imgs.dtype == np.uint8
    # text pixels darken the white tiles
    assert (imgs < 128).any()
    assert (imgs == 255).any()


def test_neighbor_grid_with_labels():
    from rdm_tpu.diagnostics import neighbor_grid

    rng = np.random.default_rng(0)
    batch = {
        "nn_patches": rng.uniform(-1, 1, (2, 1, 3, 8, 8, 3)).astype(
            np.float32),
        "human_label": ["tabby cat", "tiger"],
    }
    g = neighbor_grid(batch, label_key="human_label")
    # per sample: a caption strip + n rows of k patches, stacked
    assert g.dtype == np.uint8
    assert g.shape[1] == 3 * 8 and g.shape[2] == 3
    assert g.shape[0] == 2 * (8 + 16)  # 2 samples x (patch row + strip)
    # without labels: pure patch grid, reference plotter semantics
    g2 = neighbor_grid(batch)
    assert g2.shape == (2 * 8, 3 * 8, 3)
