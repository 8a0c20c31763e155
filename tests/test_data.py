import json
import os

import numpy as np
import pytest
from PIL import Image

from diffusion_pruning_tpu.data import get_dataset, load_cc3m_dataset, load_coco_dataset
from diffusion_pruning_tpu.data.loader import DataPipeline, filter_dataset


def _make_coco(tmp_path, n=6):
    img_dir = tmp_path / "images" / "train2014"
    img_dir.mkdir(parents=True)
    ann = {"annotations": []}
    for i in range(n):
        path = img_dir / f"COCO_train2014_{i:012d}.jpg"
        Image.fromarray(np.full((40, 50, 3), i * 40, np.uint8)).save(path)
        ann["annotations"].append({"image_id": i, "caption": f"caption {i}"})
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    with open(ann_dir / "captions_train2014.json", "w") as f:
        json.dump(ann, f)
    return tmp_path


def test_coco_loader(tmp_path):
    root = _make_coco(tmp_path)
    cols = load_coco_dataset(str(root / "images" / "train2014"),
                             str(root / "annotations" / "captions_train2014.json"))
    assert len(cols["image"]) == 6
    assert cols["caption"][2] == "caption 2"
    assert os.path.exists(cols["image"][0])


def test_cc3m_loader(tmp_path):
    (tmp_path / "training").mkdir()
    with open(tmp_path / "Train_GCC-training.tsv", "w") as f:
        for i in range(5):
            f.write(f"caption number {i}\thttp://x/{i}\n")
    for i in (0, 2, 4):  # only some downloads succeeded
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "training" / f"{i}_abcdef.jpg")
    cols = load_cc3m_dataset(str(tmp_path), names_cache=str(tmp_path / "names.pkl"))
    assert sorted(cols["caption"]) == ["caption number 0", "caption number 2",
                                       "caption number 4"]


def test_pipeline_static_shapes_with_corrupt_image(tmp_path):
    root = _make_coco(tmp_path)
    cols = load_coco_dataset(str(root / "images" / "train2014"),
                             str(root / "annotations" / "captions_train2014.json"))
    # corrupt one file: the pipeline must resample, not shrink the batch
    with open(cols["image"][1], "wb") as f:
        f.write(b"not a jpeg")
    pipe = DataPipeline(cols, batch_size=3, resolution=32,
                        tokenize_clip=lambda caps: np.zeros((len(caps), 77), np.int32),
                        train=True, seed=0)
    batches = list(pipe.epoch(0))
    assert len(batches) == 2
    for b in batches:
        assert b["pixel_values"].shape == (3, 32, 32, 3)
        assert b["input_ids"].shape == (3, 77)
        assert np.isfinite(b["pixel_values"]).all()
        assert b["pixel_values"].min() >= -1.0 and b["pixel_values"].max() <= 1.0


def test_pipeline_eval_deterministic(tmp_path):
    root = _make_coco(tmp_path)
    cols = load_coco_dataset(str(root / "images" / "train2014"),
                             str(root / "annotations" / "captions_train2014.json"))
    pipe = DataPipeline(cols, batch_size=2, resolution=32, train=False, seed=0)
    a = [b["pixel_values"] for b in pipe.epoch(0)]
    b = [b["pixel_values"] for b in pipe.epoch(0)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_filter_dataset_batching():
    captions = [f"c{i}" for i in range(10)]
    calls = []

    def embed(caps):
        calls.append(len(caps))
        return np.arange(len(caps), dtype=np.float32)[:, None]

    def route(emb):
        return (emb[:, 0] % 3).astype(np.int32)

    idx = filter_dataset(captions, embed, route, batch_size=4)
    assert idx.shape == (10,)
    assert calls == [4, 4, 2]
    np.testing.assert_array_equal(idx[:4], [0, 1, 2, 0])


def test_native_decoder_matches_pil(tmp_path):
    """dpt_native (C++ libjpeg pipeline) ≈ PIL path on the same image.

    Uses a smooth image: PIL's resize is anti-aliased while the native path
    is DCT-prescale + bilinear, so white-noise images diverge at high
    frequencies by construction (irrelevant for photos)."""
    pytest.importorskip("dpt_native")
    from diffusion_pruning_tpu.data.loader import load_and_transform_image
    import dpt_native

    yy, xx = np.mgrid[0:80, 0:120]
    smooth = np.stack([yy * 2, xx * 1.5, (yy + xx)], -1).astype(np.uint8)
    img = Image.fromarray(smooth)
    p = tmp_path / "x.jpg"
    img.save(p, quality=98)
    # center crop, no flip → deterministic in both paths
    rng = np.random.RandomState(0)
    pil = load_and_transform_image(str(p), 32, train=False, center_crop=True,
                                   random_flip=False, rng=rng)
    with open(p, "rb") as f:
        raw = f.read()
    batch, ok = dpt_native.decode_batch([raw], 32, [0.5], [0.5], [0], 1)
    assert ok[0] == 1
    # different bilinear implementations: compare loosely
    diff = np.abs(batch[0] - pil).mean()
    assert diff < 0.02, diff


def test_pipeline_native_and_pil_agree(tmp_path):
    pytest.importorskip("dpt_native")
    root = _make_coco(tmp_path)
    cols = load_coco_dataset(str(root / "images" / "train2014"),
                             str(root / "annotations" / "captions_train2014.json"))
    a = DataPipeline(cols, batch_size=2, resolution=32, train=False, use_native=True)
    b = DataPipeline(cols, batch_size=2, resolution=32, train=False, use_native=False)
    xa = next(iter(a.epoch(0)))["pixel_values"]
    xb = next(iter(b.epoch(0)))["pixel_values"]
    assert np.abs(xa - xb).mean() < 0.05


def test_latent_cache_roundtrip(tmp_path):
    """Cache VAE moments once, train-feed from the cache with flip aug."""
    import jax
    import jax.numpy as jnp
    from diffusion_pruning_tpu.data.latent_cache import LatentPipeline, build_latent_cache

    n, h, c = 10, 4, 3

    def fake_batches():
        for i in range(2):
            yield {"pixel_values": np.full((5, 32, 32, 3), i, np.float32),
                   "captions": np.asarray([f"c{i}_{j}" for j in range(5)], object)}

    def encode(px):
        m = jnp.mean(px, axis=3, keepdims=True) * jnp.ones((1, 1, 1, 4))
        return m[:, ::8, ::8, :], jnp.zeros_like(m[:, ::8, ::8, :])

    shards = build_latent_cache(fake_batches(), encode, str(tmp_path), shard_size=6)
    assert len(shards) >= 1
    pipe = LatentPipeline(str(tmp_path), batch_size=4, train=True, seed=0)
    batches = list(pipe.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["latent_mean"].shape == (4, 4, 4, 4)
    assert b["latent_logvar"].shape == (4, 4, 4, 4)
    assert len(b["captions"]) == 4
    # eval path deterministic
    pe = LatentPipeline(str(tmp_path), batch_size=4, train=False)
    a1 = next(iter(pe.epoch(0)))["latent_mean"]
    a2 = next(iter(pe.epoch(0)))["latent_mean"]
    np.testing.assert_array_equal(a1, a2)


def test_cc3m_webdataset_loader(tmp_path):
    """Webdataset tar-shard layout (load_cc3m_webdataset): jpg+txt pairs in
    shards, lazy `shard.tar::member` image specs, end-to-end through the
    DataPipeline, plus the nodesplitter replacement."""
    import io
    import tarfile

    from diffusion_pruning_tpu.data.datasets import (
        load_cc3m_webdataset, shard_by_process,
    )

    wds = tmp_path / "training"
    wds.mkdir()
    k = 0
    for shard in range(2):
        with tarfile.open(wds / f"{shard:05d}.tar", "w") as tf:
            for _ in range(3):
                buf = io.BytesIO()
                Image.fromarray(np.full((16, 20, 3), k * 10, np.uint8)).save(
                    buf, format="JPEG")
                data = buf.getvalue()
                ti = tarfile.TarInfo(f"{k:06d}.jpg")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
                cap = f"wds caption {k}".encode()
                ti = tarfile.TarInfo(f"{k:06d}.txt")
                ti.size = len(cap)
                tf.addfile(ti, io.BytesIO(cap))
                k += 1
    (tmp_path / "validation").mkdir()

    cols = load_cc3m_webdataset(str(tmp_path), "training")
    assert len(cols["image"]) == 6
    assert cols["caption"][3] == "wds caption 3"
    assert "::" in cols["image"][0]

    # index cache round-trip
    cols2 = load_cc3m_webdataset(str(tmp_path), "training")
    assert cols2 == cols

    # get_dataset auto-detects the tar layout
    class Cfg:
        data_dir = str(tmp_path)
        dataset_name = "cc3m"
    splits = get_dataset(Cfg)
    assert len(splits["train"]["image"]) == 6

    # pipeline decodes tar members into fixed-shape batches
    pipe = DataPipeline(cols, batch_size=3, resolution=16,
                        tokenize_clip=lambda caps: np.zeros((len(caps), 77), np.int32),
                        train=False, seed=0, use_native=False)
    batches = list(pipe.epoch(0))
    assert len(batches) == 2
    assert batches[0]["pixel_values"].shape == (3, 16, 16, 3)
    assert np.isfinite(batches[0]["pixel_values"]).all()

    # strided host split keeps pairs aligned and balanced
    s0 = shard_by_process(cols, 0, 2)
    s1 = shard_by_process(cols, 1, 2)
    assert len(s0["image"]) == len(s1["image"]) == 3
    assert s0["caption"][0] == "wds caption 0"
    assert s1["caption"][0] == "wds caption 1"
