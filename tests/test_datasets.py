"""Dataset layer tests."""

import os

import numpy as np
import pytest

from viditq_tpu.data.datasets import (
    DatasetFromCSV, StatefulSampler, batch_iterator, center_crop_resize,
    load_video, normalize)


def test_center_crop_resize_and_normalize():
    img = np.random.default_rng(0).integers(0, 255, (40, 60, 3), np.uint8)
    out = center_crop_resize(img, (32, 32))
    assert out.shape == (32, 32, 3)
    n = normalize(out)
    assert n.min() >= -1.0 and n.max() <= 1.0


def test_video_npz_and_csv(tmp_path):
    frames = np.random.default_rng(1).integers(0, 255, (6, 16, 16, 3),
                                               np.uint8)
    vid = tmp_path / "clip.npz"
    np.savez(vid, video=frames)
    x = load_video(str(vid), num_frames=4, size=(8, 8))
    assert x.shape == (3, 4, 8, 8)

    csv_path = tmp_path / "data.csv"
    csv_path.write_text(f"{vid},a tiny clip\n")
    ds = DatasetFromCSV(str(csv_path), num_frames=4, image_size=(8, 8))
    item = ds[0]
    assert item["video"].shape == (3, 4, 8, 8)
    assert item["text"] == "a tiny clip"


def test_stateful_sampler_resume_and_sharding():
    s = StatefulSampler(10, shuffle=True, seed=1, rank=0, world=2)
    order = list(s)
    assert len(order) == 5
    # resume mid-epoch
    s2 = StatefulSampler(10, shuffle=True, seed=1, rank=0, world=2)
    s2.load_state_dict({"epoch": 0, "start_index": 2})
    assert list(s2) == order[2:]
    # other rank sees disjoint indices
    s3 = StatefulSampler(10, shuffle=True, seed=1, rank=1, world=2)
    assert set(order).isdisjoint(set(list(s3)))


def test_batch_iterator(tmp_path):
    frames = np.random.default_rng(2).integers(0, 255, (4, 8, 8, 3), np.uint8)
    vids = []
    for i in range(4):
        p = tmp_path / f"v{i}.npz"
        np.savez(p, video=frames)
        vids.append(p)
    csv_path = tmp_path / "d.csv"
    csv_path.write_text("\n".join(f"{v},clip {i}" for i, v in
                                  enumerate(vids)))
    ds = DatasetFromCSV(str(csv_path), num_frames=2, image_size=(8, 8))
    sampler = StatefulSampler(len(ds), shuffle=False)
    batches = list(batch_iterator(ds, sampler, 2))
    assert len(batches) == 2
    assert batches[0]["video"].shape == (2, 3, 2, 8, 8)
    assert batches[0]["text"] == ["clip 0", "clip 1"]


def test_prepare_dataloader_matches_serial(tmp_path):
    from viditq_tpu.data.datasets import prepare_dataloader
    frames = np.random.default_rng(3).integers(0, 255, (4, 8, 8, 3),
                                               np.uint8)
    vids = []
    for i in range(6):
        p = tmp_path / f"v{i}.npz"
        np.savez(p, video=frames + i)
        vids.append(p)
    csv_path = tmp_path / "d.csv"
    csv_path.write_text("\n".join(f"{v},clip {i}" for i, v in
                                  enumerate(vids)))
    ds = DatasetFromCSV(str(csv_path), num_frames=2, image_size=(8, 8))
    serial = list(batch_iterator(ds, StatefulSampler(len(ds), shuffle=False),
                                 2))
    parallel = list(prepare_dataloader(ds,
                                       StatefulSampler(len(ds),
                                                       shuffle=False),
                                       2, num_workers=3))
    assert len(parallel) == len(serial) == 3
    for a, b in zip(parallel, serial):
        np.testing.assert_array_equal(a["video"], b["video"])
        assert a["text"] == b["text"]


def test_prepare_dataloader_propagates_errors(tmp_path):
    from viditq_tpu.data.datasets import prepare_dataloader

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("decode failed")

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="decode failed"):
        list(prepare_dataloader(Bad(), StatefulSampler(4, shuffle=False),
                                2, num_workers=2))


def test_prepare_dataloader_consumer_abandons(tmp_path):
    """Closing the generator early must retire the producer thread
    instead of deadlocking on a full queue."""
    import threading
    import time as _time
    from viditq_tpu.data.datasets import prepare_dataloader

    class Slowish:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.full((4,), i, np.float32)}

    before = threading.active_count()
    gen = prepare_dataloader(Slowish(), StatefulSampler(64, shuffle=False),
                             2, num_workers=2, prefetch=1)
    next(gen)
    gen.close()  # abandon mid-stream
    deadline = _time.time() + 10
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
