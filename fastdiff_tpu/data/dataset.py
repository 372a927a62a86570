"""Vocoder dataset + host-side batch pipeline.

Re-designs the reference's torch ``VocoderDataset``/``collater``/
``EndlessDistributedSampler`` stack (reference:
tasks/vocoder/dataset_utils.py:15-204) as a plain-numpy host pipeline that
feeds fixed-shape device batches:

- train/valid items shorter than the crop window are filtered out using
  ``<prefix>_lengths.npy`` (dataset_utils.py:66-72),
- the collater random-crops *aligned* (mel-frame, wav-sample) windows of
  ``max_samples`` (dataset_utils.py:114-131) — crops are statically shaped,
  so XLA compiles the train step exactly once,
- the endless sampler is an epoch-seeded shuffled index stream sharded by
  (shard_id, num_shards) — the host-side replacement for
  ``EndlessDistributedSampler``'s rank-strided indices
  (dataset_utils.py:31-40); per-host sharding for multi-host TPU comes from
  ``jax.process_index/count`` at the trainer layer,
- inference mode loads full utterances one at a time, or featurizes raw
  ``test_input_dir`` wavs / ``test_mel_dir`` .npy mels via the binarizer's
  ``process_item``/``process_mel_item`` (dataset_utils.py:167-204).
"""

from __future__ import annotations

import glob
import importlib
import os
from typing import Iterator, List, Optional

import numpy as np

from fastdiff_tpu.data.indexed_dataset import IndexedDataset


def resolve_class(dotted_path: str):
    """Import ``pkg.mod.Cls`` from its dotted path (the reference's importlib
    dispatch pattern, tasks/run.py:7-11)."""
    pkg, cls_name = dotted_path.rsplit(".", 1)
    return getattr(importlib.import_module(pkg), cls_name)


class VocoderDataset:
    def __init__(self, hparams: dict, prefix: str, shuffle: bool = False):
        self.hparams = hparams
        self.prefix = prefix
        self.shuffle = shuffle
        self.data_dir = hparams["binary_data_dir"]
        self.hop_size = int(hparams["hop_size"])
        self.is_infer = prefix == "test"
        self.batch_max_frames = (0 if self.is_infer
                                 else int(hparams["max_samples"]) // self.hop_size)
        self.indexed_ds: Optional[IndexedDataset] = None
        self._memory_items = None

        if self.is_infer and hparams.get("test_input_dir"):
            self._memory_items, self.sizes = self._load_test_inputs(
                hparams["test_input_dir"])
            self.avail_idxs = list(range(len(self.sizes)))
        elif self.is_infer and hparams.get("test_mel_dir"):
            self._memory_items, self.sizes = self._load_mel_inputs(
                hparams["test_mel_dir"])
            self.avail_idxs = list(range(len(self.sizes)))
        else:
            sizes = np.load(os.path.join(self.data_dir, f"{prefix}_lengths.npy"))
            self.avail_idxs = [i for i, s in enumerate(sizes)
                               if s > self.batch_max_frames]
            skipped = len(sizes) - len(self.avail_idxs)
            if skipped:
                print(f"| {skipped} short items skipped in {prefix} set.")
            self.sizes = [int(sizes[i]) for i in self.avail_idxs]

    def __len__(self) -> int:
        return len(self.avail_idxs)

    def __getitem__(self, index: int) -> dict:
        if self._memory_items is not None:
            item = self._memory_items[index]
        else:
            if self.indexed_ds is None:
                self.indexed_ds = IndexedDataset(
                    os.path.join(self.data_dir, self.prefix))
            item = self.indexed_ds[self.avail_idxs[index]]
        return item

    # -- inference featurization ------------------------------------------
    def _binarizer_cls(self):
        return resolve_class(self.hparams.get(
            "binarizer_cls", "fastdiff_tpu.data.binarizer.VocoderBinarizer"))

    def _load_test_inputs(self, test_input_dir: str):
        paths = sorted(glob.glob(f"{test_input_dir}/*.wav")
                       + glob.glob(f"{test_input_dir}/**/*.wav"))
        binarizer = self._binarizer_cls()
        items, sizes = [], []
        for wav_fn in paths:
            item_name = os.path.relpath(wav_fn, test_input_dir).replace("/", "_")
            item = binarizer.process_item(
                item_name, wav_fn, self.hparams.get("binarization_args", {}),
                hparams=self.hparams)
            items.append(item)
            sizes.append(item["len"])
        return items, sizes

    def _load_mel_inputs(self, test_mel_dir: str):
        paths = sorted(glob.glob(f"{test_mel_dir}/*.npy"))
        binarizer = self._binarizer_cls()
        items, sizes = [], []
        for mel_fn in paths:
            mel = np.load(mel_fn)
            item_name = os.path.relpath(mel_fn, test_mel_dir).replace("/", "_")
            item = binarizer.process_mel_item(
                item_name, mel, None, self.hparams.get("binarization_args", {}))
            items.append(item)
            sizes.append(item["len"])
        return items, sizes


# ---------------------------------------------------------------------------
# Batch construction
# ---------------------------------------------------------------------------

def crop_batch(items: List[dict], max_frames: int, hop_size: int,
               rng: np.random.Generator) -> dict:
    """Random aligned (mel, wav) crops -> fixed-shape arrays.

    Returns {'mels': (B, max_frames, n_mels) f32, 'wavs': (B, L, 1) f32}
    with L = max_frames * hop_size (dataset_utils.py:114-131 semantics, in
    NWC layout).
    """
    mels, wavs = [], []
    for item in items:
        mel = np.asarray(item["mel"], dtype=np.float32)       # (T, n_mels)
        wav = np.asarray(item["wav"], dtype=np.float32)       # (T*hop,)
        n_frames = mel.shape[0]
        start = int(rng.integers(0, n_frames - max_frames))
        mels.append(mel[start: start + max_frames])
        s = start * hop_size
        wavs.append(wav[s: s + max_frames * hop_size])
    return {
        "mels": np.stack(mels),
        "wavs": np.stack(wavs)[..., None],
    }


def endless_index_stream(n_items: int, seed: int, shuffle: bool,
                         shard_id: int = 0, num_shards: int = 1) -> Iterator[int]:
    """Infinite epoch-seeded index stream, rank-sharded.

    Epoch e uses RNG seed (seed + e) so every shard sees the same global
    permutation and takes a disjoint strided slice of it — the deterministic
    replacement for EndlessDistributedSampler (dataset_utils.py:31-40).
    """
    epoch = 0
    while True:
        if shuffle:
            order = np.random.default_rng(seed + epoch).permutation(n_items)
        else:
            order = np.arange(n_items)
        usable = (len(order) // num_shards) * num_shards
        for idx in order[shard_id:usable:num_shards]:
            yield int(idx)
        epoch += 1


def _try_native_loader(dataset: VocoderDataset):
    """Open the C++ mmap loader for this split if the v2 files exist."""
    if dataset._memory_items is not None or not dataset.data_dir:
        return None
    try:
        from fastdiff_tpu.data.native_io import NativeBatchLoader
        return NativeBatchLoader(os.path.join(dataset.data_dir, dataset.prefix))
    except Exception:
        return None


def train_batch_iterator(dataset: VocoderDataset, batch_size: int,
                         max_frames: int, seed: int = 1234,
                         shard_id: int = 0, num_shards: int = 1,
                         endless: bool = True) -> Iterator[dict]:
    """Yield fixed-shape training batches forever (or one epoch).

    Uses the native (C++ mmap, threaded) crop-collate when the v2 dataset
    files are present; falls back to the Python pickle path otherwise.
    """
    rng = np.random.default_rng(seed + 1000 * shard_id)
    hop = dataset.hop_size
    if endless:
        native = _try_native_loader(dataset)
        n_mels = None
        stream = endless_index_stream(len(dataset), seed, True,
                                      shard_id, num_shards)
        buf = []
        for idx in stream:
            buf.append(idx)
            if len(buf) < batch_size:
                continue
            if native is not None:
                raw = np.asarray([dataset.avail_idxs[i] for i in buf], np.int64)
                starts = np.asarray(
                    [rng.integers(0, dataset.sizes[i] - max_frames)
                     for i in buf], np.int64)
                if n_mels is None:
                    n_mels = int(np.asarray(dataset[buf[0]]["mel"]).shape[1])
                yield native.load(raw, starts, max_frames, hop, n_mels)
            else:
                yield crop_batch([dataset[i] for i in buf], max_frames, hop, rng)
            buf = []
    else:
        order = np.random.default_rng(seed).permutation(len(dataset))
        usable = (len(order) // num_shards) * num_shards
        order = order[shard_id:usable:num_shards]
        for i in range(0, len(order) - batch_size + 1, batch_size):
            items = [dataset[int(j)] for j in order[i: i + batch_size]]
            yield crop_batch(items, max_frames, hop, rng)


def batch_by_size(indices, sizes, max_tokens: int = 30000,
                  max_sentences: int = None, required_multiple: int = 1):
    """Token-bucketed batching: greedily fill batches up to ``max_tokens``
    total frames (and optionally ``max_sentences`` items), the reference's
    TTS batching strategy (tasks/tts/tts_base.py:112-156 / utils
    batch_by_size semantics). Returns a list of index lists; batch sizes are
    trimmed down to a multiple of ``required_multiple`` (e.g. the dp axis)."""
    batches, cur, cur_max = [], [], 0
    for idx in indices:
        size = int(sizes[idx])
        new_max = max(cur_max, size)
        if cur and ((len(cur) + 1) * new_max > max_tokens or
                    (max_sentences and len(cur) >= max_sentences)):
            keep = (len(cur) // required_multiple) * required_multiple or len(cur)
            batches.append(cur[:keep])
            cur, cur_max = cur[keep:], max((int(sizes[i]) for i in cur[keep:]),
                                           default=0)
        cur.append(idx)
        cur_max = max(cur_max, size)
    if cur:
        batches.append(cur)
    return batches


def infer_item_iterator(dataset: VocoderDataset) -> Iterator[dict]:
    """Yield full-utterance inference items: mel (1, T, n_mels) f32,
    optional ground-truth wav (1, L, 1)."""
    for i in range(len(dataset)):
        item = dataset[i]
        mel = np.asarray(item["mel"], dtype=np.float32)[None, ...]
        wav = np.asarray(item.get("wav", np.zeros(0)), dtype=np.float32)
        out = {"item_name": item["item_name"], "mels": mel}
        if wav.ndim == 1 and wav.size > 0:
            out["wavs"] = wav[None, :, None]
        yield out
