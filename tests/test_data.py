"""Data pipeline tests: action encoding, clip transform, the native tar
streamer (with a locally built shard fixture), dummy dataset, and the loader."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from gtax.data.actions import actions_to_one_hot, forward_actions
from gtax.data.common import ClipTransform, split_len
from gtax.data.dummy import DummyDataset
from gtax.data.loader import DataLoader, make_dataset
from gtax.data.webtar import WebTarDataset, decode_sample, iter_tar_samples


def test_actions_one_hot():
    out = actions_to_one_hot([-1, 0, 3, 24])
    assert out.shape == (4, 25)
    assert out[0].sum() == 0  # -1 == no action
    assert out[1, 0] == 1 and out[2, 3] == 1 and out[3, 24] == 1
    fwd = forward_actions(2, 3)
    assert fwd.shape == (2, 3, 25) and (fwd[:, :, 3] == 1).all()


def test_split_len():
    assert split_len("train") == 1270669
    assert split_len("validation") == 4040
    assert split_len("test") == 4588


def test_clip_transform():
    strip = np.zeros((270, 2400, 3), np.uint8)
    # mark frame 2 red so we can check the split ordering
    strip[:, 2 * 480 : 3 * 480, 0] = 255
    clip = ClipTransform()(strip)
    assert clip.shape == (5, 3, 360, 640)
    assert clip.dtype == np.float32
    assert clip[2, 0].mean() > 0.9 and clip[1, 0].mean() < 0.1


def make_shard(path, n_samples, h=54, w=480, with_json=True):
    """Build a tar shard shaped like the GTAV dataset (strip jpg + cls + json)."""
    from PIL import Image

    with tarfile.open(path, "w") as tar:
        for i in range(n_samples):
            key = f"{i:06d}"
            strip = np.full((h, 5 * w, 3), i % 255, np.uint8)
            buf = io.BytesIO()
            Image.fromarray(strip).save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.jpg")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
            cls = str(i % 3).encode()
            info = tarfile.TarInfo(f"{key}.cls")
            info.size = len(cls)
            tar.addfile(info, io.BytesIO(cls))
            if with_json:
                js = json.dumps({"actions_int": [i % 25] * 5}).encode()
                info = tarfile.TarInfo(f"{key}.json")
                info.size = len(js)
                tar.addfile(info, io.BytesIO(js))


def test_tar_sample_grouping(tmp_path):
    shard = str(tmp_path / "00000.tar")
    make_shard(shard, 4)
    with open(shard, "rb") as f:
        samples = [decode_sample(s) for s in iter_tar_samples(f)]
    assert len(samples) == 4
    assert samples[0]["jpg"].shape == (54, 2400, 3)
    assert samples[1]["cls"] == 1
    assert samples[2]["json"]["actions_int"] == [2] * 5


def test_webtar_dataset_stream(tmp_path):
    shards = []
    for s in range(2):
        path = str(tmp_path / f"{s:05d}.tar")
        make_shard(path, 3)
        shards.append(path)
    ds = WebTarDataset(
        split="train", return_actions=True, shards=shards,
        shuffle_buffer=1, resampled=False, shuffle_shards=False,
        transform=ClipTransform(target_h=36, target_w=64),
    )
    items = list(iter(ds))
    assert len(items) == 6
    assert items[0]["video"].shape == (5, 3, 36, 64)
    assert items[0]["actions"].shape == (5, 25)


def test_webtar_worker_split(tmp_path):
    shards = []
    for s in range(4):
        path = str(tmp_path / f"{s:05d}.tar")
        make_shard(path, 2)
        shards.append(path)
    seen = []
    for w in range(2):
        ds = WebTarDataset(
            split="train", return_actions=False, shards=shards,
            shuffle_buffer=1, resampled=False, shuffle_shards=False,
            worker_index=w, num_workers=2,
            transform=ClipTransform(target_h=36, target_w=64),
        )
        seen.append(len(list(iter(ds))))
    assert seen == [4, 4]  # 2 shards x 2 samples each worker


def test_webtar_cursor_resume(tmp_path):
    shard = str(tmp_path / "00000.tar")
    make_shard(shard, 5)
    ds = WebTarDataset(
        split="train", return_actions=False, shards=[shard],
        shuffle_buffer=1, resampled=False, shuffle_shards=False,
        transform=ClipTransform(target_h=36, target_w=64),
    )
    it = iter(ds)
    next(it)
    next(it)
    cursor = list(ds.cursor)
    # new dataset restored at the cursor sees the remaining 3 samples
    ds2 = WebTarDataset(
        split="train", return_actions=False, shards=[shard],
        shuffle_buffer=1, resampled=False, shuffle_shards=False,
        transform=ClipTransform(target_h=36, target_w=64),
    )
    ds2.cursor = cursor
    rest = list(iter(ds2))
    assert len(rest) == 3
    # and they are the CORRECT remaining samples: shard sample i is a flat
    # i-valued image (make_shard), so the clip mean identifies it (+-jpeg)
    ids = [int(round(float(s["video"].mean()) * 255)) for s in rest]
    assert ids == [2, 3, 4], ids


def test_webtar_parallel_decode_order_and_cursor(tmp_path):
    """decode_workers must not change the yielded stream: same samples,
    same order, same resumable-cursor positions as the inline decode (the
    tar stream stays sequential; only decode runs on threads)."""
    shard = str(tmp_path / "00000.tar")
    make_shard(shard, 8)
    kw = dict(split="train", return_actions=True, shards=[shard],
              shuffle_buffer=1, resampled=False, shuffle_shards=False,
              transform=ClipTransform(target_h=36, target_w=64))
    seq = list(iter(WebTarDataset(**kw)))
    ds_par = WebTarDataset(decode_workers=4, **kw)
    it = iter(ds_par)
    par = [next(it) for _ in range(8)]
    assert len(seq) == len(par) == 8
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a["video"], b["video"])
        np.testing.assert_array_equal(a["actions"], b["actions"])
    # resume from a mid-stream cursor with the PARALLEL decoder active
    ds3 = WebTarDataset(decode_workers=4, **kw)
    ds3.cursor = [0, 0, 5]
    ids = [int(round(float(s["video"].mean()) * 255))
           for s in iter(ds3)]
    assert ids == [5, 6, 7], ids


def test_webtar_pixel_u8_fast_path(tmp_path):
    """pixel_u8 yields uint8 channel-last clips whose device-side float
    conversion (as_float_video) matches the legacy float path up to JPEG
    decoder differences (cv2/libjpeg-turbo vs PIL: +-2/255)."""
    shard = str(tmp_path / "00000.tar")
    make_shard(shard, 3)
    kw = dict(split="train", return_actions=True, shards=[shard],
              shuffle_buffer=1, resampled=False, shuffle_shards=False,
              transform=ClipTransform(target_h=36, target_w=64))
    legacy = list(iter(WebTarDataset(**kw)))
    fast = list(iter(WebTarDataset(pixel_u8=True, **kw)))
    assert len(fast) == 3
    clip = fast[0]["video_u8"]
    assert clip.dtype == np.uint8 and clip.shape == (5, 36, 64, 3)
    np.testing.assert_array_equal(fast[0]["actions"], legacy[0]["actions"])

    from gtax.train.trainer import as_float_video

    conv = np.asarray(as_float_video(clip[None]))  # (1, 5, 3, 36, 64)
    assert conv.shape == (1, 5, 3, 36, 64) and conv.dtype == np.float32
    assert abs(float(conv.max()) - float(legacy[0]["video"].max())) < 0.02
    np.testing.assert_allclose(conv[0], legacy[0]["video"], atol=2.5 / 255)

    # the DataLoader stacks u8 batches without the float conversion
    from gtax.data.loader import DataLoader

    dl = DataLoader(WebTarDataset(pixel_u8=True, **kw), batch_size=3,
                    num_workers=1)
    b = next(iter(dl))
    assert b.video.dtype == np.uint8
    assert b.video.shape == (3, 5, 36, 64, 3)
    assert b.actions.shape == (3, 5, 25)


def test_dummy_dataset_causality_probe():
    ds = DummyDataset("validation", return_actions=True, height=36, width=64)
    assert len(ds) == 10
    sample = ds[0]
    last = sample["actions"][-1]
    video = sample["video"]
    if last[1] == 1:  # action 1 -> green final frame
        assert video[-1, 1].mean() > 0.9
    else:  # action 0 -> red final frame
        assert video[-1, 0].mean() > 0.9
    assert (sample["actions"][:-1] == 0).all()  # ctx frames: no action


def test_dataloader_batches():
    ds = DummyDataset("train", return_actions=True, height=36, width=64)
    loader = DataLoader(ds, batch_size=3, num_workers=1)
    it = iter(loader)
    b = next(it)
    assert b.video.shape == (3, 5, 3, 36, 64)
    assert b.actions.shape == (3, 5, 25)


def test_make_dataset_errors():
    with pytest.raises(ValueError):
        make_dataset("nope", "train", False)


def test_dataloader_rank_striding_equal_counts():
    """Multi-process loaders must yield the SAME number of samples on every
    rank (DistributedSampler pad-by-wrapping) or the collective train step
    deadlocks; ranks must also cover disjoint strides of ONE permutation."""
    n, world = 15, 4  # n % world != 0 -> padding required
    ds = _IndexedDataset(n)  # samples identify their index
    per_rank = []
    for rank in range(world):
        loader = DataLoader(ds, batch_size=1, num_workers=1, rank=rank,
                            world=world, seed=7)
        loader.set_epoch(3)
        samples = list(loader._sample_iter())
        per_rank.append(samples)
        assert loader.epoch == 4  # advanced past the pinned epoch
    counts = {len(s) for s in per_rank}
    assert counts == {-(-n // world)}, counts  # ceil(n/world) on every rank
    assert len(DataLoader(ds, batch_size=1, rank=0, world=world)) == 4
    # same epoch seed -> the ranks' indices tile one padded permutation
    rng = __import__("numpy").random.default_rng(7 + 3)
    order = rng.permutation(n)
    order = __import__("numpy").concatenate([order, order[:1]])
    seen = []
    for rank in range(world):
        expect = [float(i) for i in order[rank::world]]
        got = [float(s["video"][0]) for s in per_rank[rank]]
        assert got == expect  # exact stride of the shared permutation
        seen += got
    assert sorted(set(seen)) == list(range(n))  # disjoint full coverage


class _IndexedDataset:
    """Map-style dataset whose samples identify their index."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import numpy as np

        return {"video": np.full((1,), float(i), np.float32)}


def test_dataloader_resume_epoch_permutation():
    """set_epoch(E) must reproduce epoch E's shuffle order exactly — resume
    replays the interrupted epoch's permutation before skipping batches."""
    ds = _IndexedDataset(16)
    first = DataLoader(ds, batch_size=1, num_workers=1, seed=3)
    orders = []
    for _ in range(2):  # epochs 0 and 1
        orders.append([float(s["video"][0]) for s in first._sample_iter()])
    resumed = DataLoader(ds, batch_size=1, num_workers=1, seed=3)
    resumed.set_epoch(1)
    replay = [float(s["video"][0]) for s in resumed._sample_iter()]
    assert replay == orders[1]
    assert replay != orders[0]  # epochs genuinely reshuffle


def test_webtar_more_workers_than_shards(tmp_path):
    """A (process, worker) slot with an empty shard stride wraps around to
    an existing shard instead of busy-spinning forever without yielding
    (which would deadlock the collective step it feeds)."""
    shard = str(tmp_path / "00000.tar")
    make_shard(shard, 3)
    ds = WebTarDataset(
        split="train", return_actions=False, shards=[shard],
        shuffle_buffer=1, resampled=False, shuffle_shards=False,
        worker_index=1, num_workers=2,
    )
    assert len([s for s in ds]) == 3  # the wrapped shard's samples


def test_webtar_custom_shards_len(tmp_path):
    shard = str(tmp_path / "00000.tar")
    make_shard(shard, 3)
    kw = dict(split="train", return_actions=False, shards=[shard],
              resampled=False)
    assert len(WebTarDataset(size=3, **kw)) == 3
    # without size=: a per-shard estimate, NOT the HF train split's 1.27M
    assert len(WebTarDataset(**kw)) == 1000


class _FailingDataset:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        if i >= 4:
            raise RuntimeError("decode exploded")
        import numpy as np

        return {"video": np.zeros((1,), np.float32)}


def test_dataloader_propagates_producer_errors():
    """A producer exception must surface in the consumer, not silently end
    the epoch early (which would corrupt step/LR accounting)."""
    import pytest

    loader = DataLoader(_FailingDataset(), batch_size=2, num_workers=1,
                        shuffle=False)
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(loader)


def test_dataloader_early_exit_stops_producer():
    """Breaking out of iteration mid-epoch must release the producer thread
    (a blocked q.put would pin the thread plus queued batches forever)."""
    import threading
    import time

    before = threading.active_count()
    loader = DataLoader(_IndexedDataset(64), batch_size=1, num_workers=1,
                        prefetch=1)
    for _ in loader:
        break  # consumer leaves with the queue full
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_dataloader_parallel_decode_deterministic():
    """num_workers > 1 decodes in a thread pool but preserves the exact
    sample order of the single-threaded path (batch composition must not
    depend on thread scheduling)."""
    ds = _IndexedDataset(32)
    seq = [b.video[:, 0].tolist()
           for b in DataLoader(ds, batch_size=4, num_workers=1, seed=5)]
    par = [b.video[:, 0].tolist()
           for b in DataLoader(ds, batch_size=4, num_workers=4, seed=5)]
    assert par == seq


def test_latent_cache_from_stream(tmp_path):
    """LatentCacheDataset.build consumes an iterable tar stream in stream
    order, truncating to the actual sample count when the stream ends
    before the nominal split length."""
    import jax
    import jax.numpy as jnp

    from gtax.data.latents import LatentCacheDataset
    from gtax.models.vae import VAEConfig, vae_init
    from gtax.train.trainer import encode_frames

    vae_cfg = VAEConfig(latent_dim=4, input_height=54, input_width=480,
                        patch_size=6, enc_dim=32, enc_depth=1, enc_heads=2,
                        dec_dim=32, dec_depth=1, dec_heads=2, mlp_ratio=2.0)
    vae_params = vae_init(jax.random.PRNGKey(0), vae_cfg)

    shard = str(tmp_path / "00000.tar")
    make_shard(shard, 5, h=54 * 5, w=480)  # 5-frame strips, native size
    from gtax.data.common import ClipTransform

    ds = WebTarDataset(
        split="train", return_actions=True, shards=[shard],
        shuffle_buffer=1, resampled=False, shuffle_shards=False,
        size=100,  # nominal length larger than the actual 5 samples
        transform=ClipTransform(target_h=54, target_w=480),
    )
    lat_ds = LatentCacheDataset.build(
        ds, vae_params, vae_cfg, str(tmp_path / "cache"), encode_batch=2,
        compute_dtype=jnp.float32)
    assert len(lat_ds) == 5  # truncated to the stream's real count
    # stream order preserved: row 0 re-encodes the first streamed clip
    first = next(iter(WebTarDataset(
        split="train", return_actions=True, shards=[shard],
        shuffle_buffer=1, resampled=False, shuffle_shards=False,
        transform=ClipTransform(target_h=54, target_w=480))))
    expect = encode_frames(vae_params, vae_cfg,
                           jnp.asarray(first["video"])[None], jnp.float32)[0]
    # tight tolerance, not bit-equal: the cache encoded a batch of 2 clips,
    # the expectation a batch of 1 — XLA reduction order differs
    np.testing.assert_allclose(lat_ds[0]["latents"], np.asarray(expect),
                               atol=1e-6, rtol=1e-5)
