"""extract_features.py CLI end-to-end: synthetic CLEVR pngs + a
random-weight ResNet-101-layout state_dict -> reference-layout h5
(reference: extract_features.py pipeline)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")


def test_extract_features_cli(tmp_path):
    from PIL import Image
    from tests.test_resnet import TorchTrunk
    import tests.test_resnet as tr

    # ResNet-101 stage-3 state_dict (random weights, full block counts so
    # the CLI's default converter layout matches)
    old_blocks = tr.BLOCKS
    tr.BLOCKS = (3, 4, 23, 3)
    try:
        torch.manual_seed(0)
        trunk = TorchTrunk(stage=3)
    finally:
        tr.BLOCKS = old_blocks
    weights = tmp_path / "resnet101_stage3.pth"
    torch.save(trunk.state_dict(), weights)

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    n = 3
    for i in range(n):
        arr = rng.randint(0, 255, (64, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"CLEVR_train_{i:06d}.png")

    out_h5 = tmp_path / "train.h5"
    import extract_features
    args = extract_features.build_parser().parse_args([
        "--input_image_dir", str(img_dir),
        "--output_h5_file", str(out_h5),
        "--batch_size", "2",
        "--image_height", "64", "--image_width", "64",
        "--weights", str(weights),
    ])
    extract_features.main(args)

    import h5py
    with h5py.File(out_h5) as f:
        feats = f["features"][:]
    # stage-3 of ResNet-101: 1024 channels at 1/16 resolution
    assert feats.shape == (n, 1024, 4, 4)
    assert np.isfinite(feats).all()
    # images differ -> features differ
    assert np.abs(feats[0] - feats[1]).max() > 0


def test_list_images_contiguity(tmp_path):
    from extract_features import list_images
    (tmp_path / "CLEVR_val_000000.png").touch()
    (tmp_path / "CLEVR_val_000002.png").touch()
    with pytest.raises(AssertionError):
        list_images(str(tmp_path))
