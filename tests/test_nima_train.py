"""NIMA training sub-pipeline tests (AVA prep + EMD training loop)."""

import os

import numpy as np
import pytest
from PIL import Image

from uegan_tpu.nima_train.dataset import AVADataset, clean_and_split, parse_ava_txt


@pytest.fixture(scope="module")
def ava_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("ava")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    lines = []
    for i in range(12):
        img_id = f"{1000 + i}"
        if i != 11:  # one missing image to exercise cleaning
            arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"{img_id}.jpg")
        counts = rng.integers(0, 50, 10)
        lines.append(f"{i} {img_id} " + " ".join(map(str, counts)) + " 1 22 1396")
    ava_txt = root / "AVA.txt"
    ava_txt.write_text("\n".join(lines))
    return str(ava_txt), str(img_dir), str(root / "splits")


def test_parse_ava(ava_fixture):
    ava_txt, _, _ = ava_fixture
    rows = parse_ava_txt(ava_txt)
    assert len(rows) == 12
    assert rows[0][1].shape == (10,)


def test_clean_and_split(ava_fixture):
    ava_txt, img_dir, out = ava_fixture
    train_csv, val_csv, test_csv = clean_and_split(ava_txt, img_dir, out, val_frac=0.2, test_frac=0.1)
    n = sum(len(AVADataset(p).rows) for p in (train_csv, val_csv, test_csv))
    assert n == 11  # missing image dropped


def test_ava_dataset_batches(ava_fixture):
    ava_txt, img_dir, out = ava_fixture
    train_csv, _, _ = clean_and_split(ava_txt, img_dir, out)
    ds = AVADataset(train_csv, train=True, size=32)
    images, targets = next(ds.batches(2))
    assert images.shape == (2, 32, 32, 3)
    assert targets.shape == (2, 10)
    np.testing.assert_allclose(targets.sum(1), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_train_nima_smoke(ava_fixture, tmp_path, monkeypatch):
    """One tiny epoch of EMD training runs and checkpoints."""
    import uegan_tpu.nima_train.dataset as ds_mod
    from uegan_tpu.nima_train.train import train_nima

    ava_txt, img_dir, out = ava_fixture
    train_csv, val_csv, _ = clean_and_split(ava_txt, img_dir, out, val_frac=0.3, test_frac=0.0)
    # shrink images to keep the CPU compile tiny
    monkeypatch.setattr(ds_mod.AVADataset, "load", _tiny_load)
    hist = train_nima(train_csv, val_csv, str(tmp_path / "nima_out"), epochs=1, batch_size=2, verbose=False)
    assert np.isfinite(hist["best_val"])
    assert os.path.exists(tmp_path / "nima_out" / "nima_best")
    # bf16 compute (native MXU rate on v5e) trains too; params stay f32
    hist16 = train_nima(train_csv, val_csv, str(tmp_path / "nima_out16"),
                        epochs=1, batch_size=2, verbose=False,
                        compute_dtype="bfloat16")
    assert np.isfinite(hist16["best_val"])


def _tiny_load(self, index, epoch=0):
    rng = np.random.default_rng(index)
    return rng.random((32, 32, 3)).astype(np.float32), self.rows[index][1]
