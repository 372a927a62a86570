"""Data pipeline: IndexedDataset format (incl. reference cross-compat),
binarizer, dataset filtering/cropping, endless sharded sampler."""

import os

import numpy as np
import pytest

from fastdiff_tpu.data import dataset as ds_mod
from fastdiff_tpu.data.binarizer import VocoderBinarizer
from fastdiff_tpu.data.dataset import VocoderDataset, crop_batch, endless_index_stream
from fastdiff_tpu.data.indexed_dataset import IndexedDataset, IndexedDatasetBuilder
from fastdiff_tpu.utils import audio_io


def test_indexed_dataset_roundtrip(tmp_path, rng):
    path = str(tmp_path / "ds")
    items = [{"a": rng.standard_normal((50, 4)), "name": f"i{i}"}
             for i in range(20)]
    builder = IndexedDatasetBuilder(path)
    for item in items:
        builder.add_item(item)
    builder.finalize()
    ds = IndexedDataset(path)
    assert len(ds) == 20
    for i in (0, 7, 19, 7):
        np.testing.assert_array_equal(ds[i]["a"], items[i]["a"])
        assert ds[i]["name"] == items[i]["name"]
    with pytest.raises(IndexError):
        ds[20]


def test_indexed_dataset_reference_format_compat(tmp_path, rng):
    """Files written by the reference's builder must load in ours and
    vice versa (same .data/.idx layout)."""
    import pickle
    path = str(tmp_path / "refstyle")
    items = [{"x": rng.standard_normal(10)} for _ in range(3)]
    # write the reference way: raw pickles + offsets dict
    offsets = [0]
    with open(path + ".data", "wb") as f:
        for item in items:
            offsets.append(offsets[-1] + f.write(pickle.dumps(item)))
    np.save(open(path + ".idx", "wb"), {"offsets": offsets})
    ds = IndexedDataset(path)
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[1]["x"], items[1]["x"])


def _make_wav_dataset(tmp_path, n_items=8, sr=22050, seconds=1.5):
    """Synthetic raw dataset + metadata csv."""
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_items):
        t = np.arange(int(sr * seconds)) / sr
        freq = 200 + 50 * i
        wav = (0.5 * np.sin(2 * np.pi * freq * t)
               + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        fn = str(raw / f"item{i:02d}.wav")
        audio_io.save_wav(wav, fn, sr)
        rows.append((f"item{i:02d}", fn))
    processed = tmp_path / "processed"
    processed.mkdir()
    with open(processed / "metadata_phone.csv", "w") as f:
        f.write("item_name,wav_fn\n")
        for name, fn in rows:
            f.write(f"{name},{fn}\n")
    return str(processed)


def _hparams(tmp_path, processed_dir):
    return {
        "processed_data_dir": processed_dir,
        "binary_data_dir": str(tmp_path / "binary"),
        "audio_sample_rate": 22050, "audio_num_mel_bins": 80,
        "fft_size": 1024, "hop_size": 256, "win_size": 1024,
        "fmin": 80, "fmax": 7600, "test_num": 2, "max_samples": 8192,
        "binarization_args": {"with_wav": True, "shuffle": False},
        "N_PROC": 1,
    }


def test_binarize_and_dataset(tmp_path):
    processed = _make_wav_dataset(tmp_path)
    hp = _hparams(tmp_path, processed)
    VocoderBinarizer(hp).process()

    bdir = hp["binary_data_dir"]
    for prefix in ("train", "valid", "test"):
        assert os.path.exists(f"{bdir}/{prefix}.data")
        assert os.path.exists(f"{bdir}/{prefix}_lengths.npy")
    assert len(np.load(f"{bdir}/train_lengths.npy")) == 6
    assert len(np.load(f"{bdir}/valid_lengths.npy")) == 2

    train = VocoderDataset(hp, "train", shuffle=True)
    assert len(train) == 6
    item = train[0]
    assert item["mel"].shape[1] == 80          # (T, 80)
    assert item["mel"].dtype == np.float32
    assert item["wav"].dtype == np.float16
    assert len(item["wav"]) == item["mel"].shape[0] * 256

    # crop batch: fixed shapes, aligned windows
    batch = crop_batch([train[i] for i in range(4)], 32, 256,
                       np.random.default_rng(0))
    assert batch["mels"].shape == (4, 32, 80)
    assert batch["wavs"].shape == (4, 32 * 256, 1)


def test_infer_dataset_from_wav_dir(tmp_path):
    processed = _make_wav_dataset(tmp_path, n_items=3)
    hp = _hparams(tmp_path, processed)
    hp["test_input_dir"] = processed.replace("processed", "raw")
    hp["binarizer_cls"] = "fastdiff_tpu.data.binarizer.VocoderBinarizer"
    ds = VocoderDataset(hp, "test")
    assert len(ds) == 3
    items = list(ds_mod.infer_item_iterator(ds))
    assert items[0]["mels"].shape[2] == 80
    assert "wavs" in items[0]


def test_infer_dataset_from_mel_dir(tmp_path, rng):
    meldir = tmp_path / "mels"
    meldir.mkdir()
    for i in range(2):
        np.save(str(meldir / f"m{i}.npy"), rng.standard_normal((40, 80)))
    hp = {"test_mel_dir": str(meldir), "hop_size": 256, "max_samples": 8192,
          "binary_data_dir": "", "use_wav": False,
          "binarizer_cls": "fastdiff_tpu.data.binarizer.VocoderBinarizer",
          "binarization_args": {}}
    ds = VocoderDataset(hp, "test")
    assert len(ds) == 2
    items = list(ds_mod.infer_item_iterator(ds))
    assert items[0]["mels"].shape == (1, 40, 80)
    assert "wavs" not in items[0]


def test_endless_stream_shards_disjoint():
    shard0 = [next(x) for x in [endless_index_stream(10, 0, True, 0, 2)] * 1
              for _ in range(5)]
    s0 = endless_index_stream(10, 0, True, 0, 2)
    s1 = endless_index_stream(10, 0, True, 1, 2)
    epoch0_a = [next(s0) for _ in range(5)]
    epoch0_b = [next(s1) for _ in range(5)]
    assert set(epoch0_a).isdisjoint(epoch0_b)
    assert set(epoch0_a) | set(epoch0_b) == set(range(10))


def test_batch_by_size():
    from fastdiff_tpu.data.dataset import batch_by_size
    sizes = [100, 200, 150, 400, 50, 300, 120, 80]
    batches = batch_by_size(range(8), sizes, max_tokens=600)
    # all indices covered exactly once
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(8))
    # token budget respected: batch_size * max_size <= max_tokens
    for b in batches:
        assert len(b) * max(sizes[i] for i in b) <= 600
    # max_sentences cap
    batches = batch_by_size(range(8), sizes, max_tokens=10**6, max_sentences=3)
    assert all(len(b) <= 3 for b in batches)


def test_short_items_filtered(tmp_path):
    processed = _make_wav_dataset(tmp_path, n_items=6, seconds=0.3)
    hp = _hparams(tmp_path, processed)
    hp["max_samples"] = 25600  # 100 frames > 0.3s*86fps -> all filtered
    VocoderBinarizer(hp).process()
    train = VocoderDataset(hp, "train")
    assert len(train) == 0
