"""Native C++ data path: build, v2 roundtrip, batch crops match Python path."""

import os

import numpy as np
import pytest

from fastdiff_tpu.data import native_io


@pytest.fixture(scope="module")
def lib():
    lib = native_io.get_library()
    if lib is None:
        pytest.skip("native library failed to build")
    return lib


def _write_ds(tmp_path, rng, n_items=5, n_mels=8, hop=4):
    prefix = str(tmp_path / "ds")
    builder = native_io.NativeDatasetBuilder(prefix)
    items = []
    for i in range(n_items):
        frames = 10 + 3 * i
        mel = rng.standard_normal((frames, n_mels)).astype(np.float32)
        wav = (rng.standard_normal(frames * hop) * 0.1).astype(np.float16)
        builder.add_item(mel, wav)
        items.append((mel, wav))
    builder.finalize()
    return prefix, items


def test_v2_roundtrip(lib, tmp_path, rng):
    prefix, items = _write_ds(tmp_path, rng)
    loader = native_io.NativeBatchLoader(prefix)
    assert len(loader) == 5
    for i, (mel, wav) in enumerate(items):
        assert loader.item_frames(i) == mel.shape[0]
        rec = loader.read_item(i)
        np.testing.assert_array_equal(rec["mel"], mel)
        np.testing.assert_allclose(rec["wav"], wav.astype(np.float32))
    loader.close()


def test_batch_crop_matches_python(lib, tmp_path, rng):
    n_mels, hop, max_frames = 8, 4, 6
    prefix, items = _write_ds(tmp_path, rng, n_mels=n_mels, hop=hop)
    loader = native_io.NativeBatchLoader(prefix)
    idx = np.asarray([0, 2, 4], np.int64)
    starts = np.asarray([1, 0, 5], np.int64)
    batch = loader.load(idx, starts, max_frames, hop, n_mels)
    assert batch["mels"].shape == (3, max_frames, n_mels)
    assert batch["wavs"].shape == (3, max_frames * hop, 1)
    for b, (i, s) in enumerate(zip(idx, starts)):
        mel, wav = items[i]
        np.testing.assert_array_equal(batch["mels"][b], mel[s: s + max_frames])
        np.testing.assert_allclose(
            batch["wavs"][b, :, 0],
            wav[s * hop: (s + max_frames) * hop].astype(np.float32))
    loader.close()


def test_batch_crop_bad_start_errors(lib, tmp_path, rng):
    prefix, _ = _write_ds(tmp_path, rng)
    loader = native_io.NativeBatchLoader(prefix)
    with pytest.raises(RuntimeError):
        loader.load(np.asarray([0], np.int64), np.asarray([99], np.int64),
                    6, 4, 8)
    loader.close()


def test_binarizer_writes_v2_and_iterator_uses_it(lib, tmp_path):
    """End-to-end: binarize -> v2 files exist -> train iterator crops via
    the native loader and matches shapes/dtypes of the Python path."""
    from tests.test_data_pipeline import _hparams, _make_wav_dataset
    from fastdiff_tpu.data.binarizer import VocoderBinarizer
    from fastdiff_tpu.data.dataset import VocoderDataset, train_batch_iterator

    processed = _make_wav_dataset(tmp_path)
    hp = _hparams(tmp_path, processed)
    VocoderBinarizer(hp).process()
    for prefix in ("train", "valid"):
        assert os.path.exists(f"{hp['binary_data_dir']}/{prefix}.bin")
        assert os.path.exists(f"{hp['binary_data_dir']}/{prefix}.bidx")

    ds = VocoderDataset(hp, "train", shuffle=True)
    it = train_batch_iterator(ds, batch_size=4, max_frames=16)
    batch = next(it)
    assert batch["mels"].shape == (4, 16, 80)
    assert batch["wavs"].shape == (4, 16 * 256, 1)
    assert batch["mels"].dtype == np.float32
    assert np.isfinite(batch["mels"]).all()
