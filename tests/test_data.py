"""Input-pipeline tests on generated PNG fixtures."""

import os

import numpy as np
import pytest
from PIL import Image

from uegan_tpu.data.dataset import PairedImageDataset
from uegan_tpu.data.pipeline import get_test_loader, get_train_loader, InputFetcher


@pytest.fixture(scope="module")
def fivek_dir(tmp_path_factory):
    """Synthetic FiveK layout: train/{exp,raw} with 5 images each."""
    root = tmp_path_factory.mktemp("fivek")
    rng = np.random.default_rng(0)
    for split, doms, n, hw in (("train", ("exp", "raw"), 5, 96), ("val", ("label", "raw"), 3, 64)):
        for d in doms:
            (root / split / d).mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, (hw, hw + 16, 3), dtype=np.uint8)
                Image.fromarray(arr).save(root / split / d / f"img{i:02d}.png")
    return root


def test_dataset_pairing(fivek_dir):
    ds = PairedImageDataset(fivek_dir / "train")
    assert len(ds) == 5
    # domain order alphabetical: exp (idx0) first, raw (idx1) second
    f1, f2 = ds.samples[0]
    assert "exp" in str(f1) and "raw" in str(f2)
    assert ds.name(0) == "img00"  # stem of the raw file


def test_train_loader_shapes_and_range(fivek_dir):
    loader = get_train_loader(fivek_dir / "train", img_size=64, resize_size=32, batch_size=2, num_workers=1)
    assert len(loader) == 2  # 5 // 2 with drop_last
    batch = next(iter(loader))
    assert batch["img_exp"].shape == (2, 32, 32, 3)
    assert batch["img_raw"].shape == (2, 32, 32, 3)
    assert batch["img_raw"].min() >= -1.0 and batch["img_raw"].max() <= 1.0
    assert len(batch["img_name"]) == 2


def test_train_loader_deterministic(fivek_dir):
    mk = lambda: get_train_loader(fivek_dir / "train", img_size=64, resize_size=32, batch_size=2, seed=7, num_workers=1)
    b1 = next(iter(mk()))
    b2 = next(iter(mk()))
    np.testing.assert_array_equal(b1["img_raw"], b2["img_raw"])
    assert b1["img_name"] == b2["img_name"]


def test_train_loader_epochs_differ(fivek_dir):
    loader = get_train_loader(fivek_dir / "train", img_size=64, resize_size=32, batch_size=2, seed=7, num_workers=1)
    e1 = [b["img_raw"].copy() for b in loader]  # epoch 0
    e2 = [b["img_raw"].copy() for b in loader]  # epoch 1
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))


def test_test_loader_no_drop_resize(fivek_dir):
    loader = get_test_loader(fivek_dir / "val", img_size=32, batch_size=2, num_workers=1)
    batches = list(loader)
    assert sum(b["img_raw"].shape[0] for b in batches) == 3  # no drop_last
    assert all(b["img_raw"].shape[1:] == (32, 32, 3) for b in batches)


def test_input_fetcher_wraps_infinitely(fivek_dir):
    loader = get_train_loader(fivek_dir / "train", img_size=64, resize_size=32, batch_size=2, num_workers=1)
    fetcher = InputFetcher(loader)
    seen = [next(fetcher) for _ in range(5)]  # > 2 batches/epoch → wraps
    assert all(s["img_raw"].shape == (2, 32, 32, 3) for s in seen)


def test_process_sharded_train_loader(fivek_dir):
    """Multi-host sharding: same global order on every process, disjoint
    equal-size per-process slices, identical union to the 1-process epoch."""
    mk = lambda pid, pc: get_train_loader(
        fivek_dir / "train", img_size=64, resize_size=32, batch_size=2,
        seed=7, num_workers=1, process_id=pid, process_count=pc,
    )
    single = mk(0, 1)
    assert len(single) == 2  # 5 // 2
    names_single = [b["img_name"] for b in single]

    l0, l1 = mk(0, 2), mk(1, 2)
    assert len(l0) == len(l1) == 1  # 5 // (2*2) global batches
    b0, b1 = next(iter(l0)), next(iter(l1))
    assert b0["img_exp"].shape == b1["img_exp"].shape == (2, 32, 32, 3)
    # shards are disjoint and tile the global batch in process order
    assert b0["img_name"] + b1["img_name"] == names_single[0] + names_single[1]
    # per-item determinism: the same sample gets the same augmentation
    # regardless of which process loads it
    sb = list(iter(mk(0, 1)))
    np.testing.assert_array_equal(
        np.concatenate([b0["img_raw"], b1["img_raw"]]),
        np.concatenate([sb[0]["img_raw"], sb[1]["img_raw"]]),
    )


def test_process_sharded_eval_loader_pads_tail(fivek_dir):
    """Multi-process eval pads the tail global batch by wrapping so every
    process yields full-shaped shards; single-process keeps the ragged tail."""
    mk = lambda pid, pc: get_test_loader(
        fivek_dir / "val", img_size=32, batch_size=2, num_workers=1,
        process_id=pid, process_count=pc,
    )
    single = mk(0, 1)
    sizes = [b["img_exp"].shape[0] for b in single]
    assert sizes == [2, 1]  # 3 images, ragged tail preserved at pc=1

    l0, l1 = mk(0, 2), mk(1, 2)
    assert len(l0) == len(l1) == 1  # ceil(3 / 4)
    b0, b1 = next(iter(l0)), next(iter(l1))
    assert b0["img_exp"].shape[0] == b1["img_exp"].shape[0] == 2
    names = b0["img_name"] + b1["img_name"]
    assert names[:3] == sorted(set(names[:3]))  # the 3 real images, in order
    assert names[3] == names[0]  # wrap-padded duplicate


def test_uint8_emit_device_normalize_matches_host(fivek_dir):
    """emit='uint8' + on-device normalize matches the host float32 pipeline
    to 1 ulp (XLA lowers the /255 to multiply-by-reciprocal; every other op
    is exact)."""
    import jax

    from uegan_tpu.data.pipeline import device_normalize

    mk = lambda emit: get_train_loader(
        fivek_dir / "train", img_size=64, resize_size=32, batch_size=2,
        seed=7, num_workers=1, emit=emit,
    )
    bf = next(iter(mk("float32")))
    bu = next(iter(mk("uint8")))
    assert bu["img_raw"].dtype == np.uint8
    norm = jax.jit(device_normalize)
    for k in ("img_raw", "img_exp"):
        got = np.asarray(norm(bu[k]))
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, bf[k], atol=1.2e-7, rtol=0)


def test_input_fetcher_normalizes_uint8_on_device(fivek_dir):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from uegan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=1, n_spatial=1)
    sharding = NamedSharding(mesh, PartitionSpec("data"))
    uf = InputFetcher(get_train_loader(
        fivek_dir / "train", img_size=64, resize_size=32, batch_size=2,
        seed=7, num_workers=1, emit="uint8"), sharding)
    ff = InputFetcher(get_train_loader(
        fivek_dir / "train", img_size=64, resize_size=32, batch_size=2,
        seed=7, num_workers=1), sharding)
    bu, bf = next(uf), next(ff)
    assert bu["img_raw"].dtype == np.float32  # normalized on device
    np.testing.assert_allclose(
        np.asarray(bu["img_raw"]), np.asarray(bf["img_raw"]), atol=1.2e-7, rtol=0
    )


def test_prep_train_data_resizes_short_side(tmp_path):
    """Offline prep (tools/prep_train_data.py): big originals shrink to the
    short-side target, small ones copy through byte-identical."""
    from PIL import Image

    from uegan_tpu.tools.prep_train_data import prep_folder

    src = tmp_path / "train"
    for d, (h, w) in (("exp", (400, 600)), ("raw", (96, 128))):
        (src / d).mkdir(parents=True)
        Image.fromarray(
            np.random.default_rng(3).integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(src / d / "a.png")
    n = prep_folder(str(src), str(tmp_path / "out"), short_side=200)
    assert n == 2
    with Image.open(tmp_path / "out" / "exp" / "a.png") as im:
        assert im.size == (300, 200)  # 400x600 -> short side 200, aspect kept
    assert (tmp_path / "out" / "raw" / "a.png").read_bytes() == (
        src / "raw" / "a.png").read_bytes()  # already small: untouched copy
