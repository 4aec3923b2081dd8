"""Data pipeline tests: synthetic SAM tree, loader determinism, mixed
sampler (mirrors the reference's inline sampler unit test,
mixed_sampler.py:114-149)."""

import numpy as np
import pytest

from amodal_depth_anything_tpu.data import (ConcatDataset, DataLoader,
                                            DatasetMode, MixedBatchSampler,
                                            SAMAmodalDataset, get_dataset)
from amodal_depth_anything_tpu.data.synthetic import make_synthetic_sam_tree


@pytest.fixture(scope="module")
def sam_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("sam_data")
    list_path = make_synthetic_sam_tree(str(root), n=6, hw=32)
    return str(root), list_path


def test_sam_dataset_sample_contents(sam_tree):
    root, list_path = sam_tree
    ds = SAMAmodalDataset(mode=DatasetMode.TRAIN, filename_ls_path=list_path,
                          dataset_dir=root, resize_to_hw=(28, 28))
    assert len(ds) == 6
    s = ds[0]
    assert s["rgb_norm"].shape == (28, 28, 3)
    assert s["guide_rgb_norm"].shape == (28, 28, 3)
    for k in ("guide", "visible_mask", "invisible_mask",
              "depth_observation", "depth_gt"):
        assert s[k].shape == (28, 28, 1), k
    assert s["rgb_norm"].min() >= -1 and s["rgb_norm"].max() <= 1
    assert 0 <= s["depth_gt"].min() and s["depth_gt"].max() <= 1
    # invisible = ~visible & guide
    inv = s["invisible_mask"] > 0
    assert not np.any(inv & (s["visible_mask"] > 0))
    assert np.all(s["guide"][inv] > 0)
    assert inv.sum() > 0


def test_img_dropout_is_deterministic(sam_tree):
    root, list_path = sam_tree
    kw = dict(mode=DatasetMode.TRAIN, filename_ls_path=list_path,
              dataset_dir=root, img_dropout=0.5, seed=7)
    a = SAMAmodalDataset(**kw)
    b = SAMAmodalDataset(**kw)
    for i in range(len(a)):
        np.testing.assert_array_equal(a[i]["guide_rgb_norm"],
                                      b[i]["guide_rgb_norm"])
    dropped = [np.all(a[i]["guide_rgb_norm"] == 0) for i in range(len(a))]
    assert any(dropped)  # with p=.5 over 6 samples this is deterministic-true


def test_loader_padding_and_resume(sam_tree):
    root, list_path = sam_tree
    ds = SAMAmodalDataset(mode=DatasetMode.EVAL, filename_ls_path=list_path,
                          dataset_dir=root, resize_to_hw=(28, 28))
    loader = DataLoader(ds, batch_size=4, pad_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["rgb_norm"].shape == (4, 28, 28, 3)
    assert batches[1]["rgb_norm"].shape == (4, 28, 28, 3)  # padded
    assert batches[1]["__sample_mask__"].tolist() == [True, True, False, False]

    # deterministic resume: skipping 1 batch replays batch #2 exactly
    loader2 = DataLoader(ds, batch_size=4, pad_last=True)
    loader2.skip_first_batches(1)
    resumed = list(loader2)
    assert len(resumed) == 1
    np.testing.assert_array_equal(resumed[0]["rgb_norm"],
                                  batches[1]["rgb_norm"])


def test_shuffled_loader_deterministic_per_epoch(sam_tree):
    root, list_path = sam_tree
    ds = SAMAmodalDataset(mode=DatasetMode.EVAL, filename_ls_path=list_path,
                          dataset_dir=root)
    l1 = DataLoader(ds, batch_size=2, shuffle=True, seed=3)
    l2 = DataLoader(ds, batch_size=2, shuffle=True, seed=3)
    o1 = [b["index"].tolist() for b in l1]
    o2 = [b["index"].tolist() for b in l2]
    assert o1 == o2
    l1.set_epoch(1)
    o3 = [b["index"].tolist() for b in l1]
    assert o1 != o3


class _FakeDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.float32)}


def test_mixed_batch_sampler():
    datasets = [_FakeDS(10), _FakeDS(20), _FakeDS(31)]
    sampler = MixedBatchSampler(datasets, batch_size=4, drop_last=True,
                                shuffle=True, prob=[0.6, 0.2, 0.2], seed=0)
    concat = ConcatDataset(datasets)
    offsets = [0, 10, 30]
    batches = list(sampler)
    assert len(batches) == len(sampler) == 2 + 5 + 7
    for batch in batches:
        assert len(batch) == 4
        src = [max(i for i, o in enumerate(offsets) if idx >= o)
               for idx in batch]
        assert len(set(src)) == 1  # whole batch from one source
        for idx in batch:
            assert 0 <= idx < len(concat)
    # deterministic
    assert [b for b in MixedBatchSampler(datasets, 4, True, True,
                                         [0.6, 0.2, 0.2], 0)] == batches


def test_get_dataset_registry(sam_tree):
    root, list_path = sam_tree
    cfg = {"name": "sam", "filenames": list_path, "disp_name": "sam_test"}
    ds = get_dataset(cfg, root, DatasetMode.EVAL)
    assert isinstance(ds, SAMAmodalDataset)
    assert len(ds) == 6


class _JitterDS:
    """Per-index sleep that scrambles worker completion order."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import time
        time.sleep(0.02 if i % 3 == 0 else 0.001)
        return {"x": np.full((2,), i, np.float32), "name": f"s{i}"}


def test_parallel_loader_matches_serial():
    """num_workers>1 (torch DataLoader worker parallelism, reference
    train.py:247) must be bit-identical to the serial loader: same batch
    order, same contents, resume included — even when per-sample latency
    scrambles worker completion order."""
    ds = _JitterDS(13)
    kw = dict(batch_size=4, shuffle=True, seed=5, pad_last=True)
    serial = list(DataLoader(ds, **kw))
    par = list(DataLoader(ds, num_workers=4, **kw))
    assert len(par) == len(serial) == 4
    for a, b in zip(serial, par):
        np.testing.assert_array_equal(a["x"], b["x"])
        assert a["name"] == b["name"]
        np.testing.assert_array_equal(a["__sample_mask__"],
                                      b["__sample_mask__"])

    resumed = DataLoader(ds, num_workers=4, **kw)
    resumed.skip_first_batches(2)
    got = list(resumed)
    assert len(got) == 2
    for a, b in zip(serial[2:], got):
        np.testing.assert_array_equal(a["x"], b["x"])


def test_parallel_loader_propagates_worker_errors():
    class Boom(_JitterDS):
        def __getitem__(self, i):
            if i == 5:
                raise ValueError("boom at 5")
            return super().__getitem__(i)

    loader = DataLoader(Boom(8), batch_size=2, num_workers=3)
    with pytest.raises(ValueError, match="boom at 5"):
        list(loader)


def test_parallel_loader_early_abandon_does_not_hang():
    import threading
    loader = DataLoader(_JitterDS(40), batch_size=2, num_workers=4,
                        prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # consumer bails; gated workers must unblock
    deadline = __import__("time").time() + 5.0
    while __import__("time").time() < deadline:
        if threading.active_count() <= 8:  # workers drained (daemon anyway)
            break
