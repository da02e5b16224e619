"""Dataset assembly and host->device loading.

Rebuilds ``get_audio_data_loaders`` (dataloader.py:441-493): paired
raw-audio + mel sources over a train.txt manifest, length-bucketed
sampling, collation — plus the TPU-side pieces the reference lacks:
per-host sharding of the index stream (multi-host data parallelism) and a
background-thread prefetcher so host IO overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.data.collate import (
    as_model_batch,
    as_wave_batch,
    collate_mel_batch,
)
from neural_sound_generation_tpu.data.sampler import (
    PartiallyRandomizedSimilarTimeLengthSampler,
    batched,
    shard_for_host,
)
from neural_sound_generation_tpu.data.sources import NpyDataSource


class AudioDataset:
    """Paired (audio, mel, speaker) access (PyTorchDataset,
    dataloader.py:205-228)."""

    def __init__(self, x_source: NpyDataSource, mel_source: Optional[NpyDataSource]):
        self.X = x_source
        self.Mel = mel_source
        self.multi_speaker = x_source.multi_speaker

    def __len__(self):
        return len(self.X)

    def __getitem__(self, idx: int):
        speaker_id = self.X.speaker_ids[idx] if self.multi_speaker else None
        mel = self.Mel[idx] if self.Mel is not None else None
        return self.X[idx], mel, speaker_id


class MelFrameLoader:
    """Iterable of model-ready batches with background prefetch.

    Each epoch re-derives a fresh sampler order; batches are collated to
    static shapes, host-sharded when running multi-host, and handed over
    through a bounded queue filled by IO worker threads.
    """

    def __init__(
        self,
        dataset: AudioDataset,
        cfg: Config,
        batch_size: int,
        num_hosts: int = 1,
        host_id: int = 0,
        num_workers: int = 4,
        seed: int = 1234,
        shuffle: bool = True,
        batch_mode: str = "mel",  # mel | wave | raw
        drop_last: bool = True,
        latent_stride: int = 4,
        use_native: Optional[bool] = None,
    ):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shuffle = shuffle
        assert batch_mode in ("mel", "wave", "raw")
        self.batch_mode = batch_mode
        # encoder time-downsampling: crops/buckets stay divisible by it
        # (4 for the flat VQ-VAE, 8 for the two-level hierarchy)
        self.latent_stride = latent_stride
        self.drop_last = drop_last
        # Epoch counter driving the shuffle seed: the batch order of one
        # pass is a pure function of (seed, _epoch). __iter__ advances it;
        # set_epoch() pins it so a resumed run replays the exact order an
        # uninterrupted run would have seen (the reference's samplers are
        # process-stateful and cannot resume, dataloader.py:158-202).
        self._epoch = 0
        # native fast path: mmap'd shards + GIL-free batch assembly
        # (data/native_loader.py); None = auto-detect, with silent
        # fallback to the pure-Python collate when g++ is unavailable
        self._native = None
        if use_native is not False:
            try:
                self._native = self._open_native()
            except Exception:
                if use_native is True:
                    raise
                self._native = None

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch for the NEXT pass (torch's
        ``DistributedSampler.set_epoch`` convention). Epoch ``e`` of a
        1-based training loop corresponds to ``set_epoch(e - 1)`` — the
        order an uninterrupted run's ``e``-th pass would use. Train CLIs
        call this every epoch so data order survives ``--resume``."""
        self._epoch = int(epoch)

    def _open_native(self):
        from neural_sound_generation_tpu.data.native_loader import NativeCorpus

        x = self.dataset.X
        mel = self.dataset.Mel
        if mel is None:
            raise ValueError("native path needs paired mel shards")
        audio_paths = [x.path(i) for i in range(len(x))]
        mel_paths = [mel.path(i) for i in range(len(x))]
        return NativeCorpus(audio_paths, mel_paths)

    def _indices(self):
        if self.shuffle:
            sampler = PartiallyRandomizedSimilarTimeLengthSampler(
                self.dataset.X.lengths,
                batch_size=self.batch_size,
                seed=self.seed + self._epoch,
            )
            idx = list(iter(sampler))
        else:
            idx = list(range(len(self.dataset)))
        if self.num_hosts > 1:
            idx = shard_for_host(idx, self.num_hosts, self.host_id, self.batch_size)
        groups = batched(idx, self.batch_size, drop_last=self.drop_last)
        if not self.drop_last and groups and len(groups[-1]) < self.batch_size:
            # pad the final partial batch cyclically — shapes stay static
            last = groups[-1]
            n = len(last)
            for k in range(self.batch_size - n):
                last.append(last[k % n])
        return groups

    def __len__(self):
        n = len(self.dataset)
        if self.num_hosts > 1:
            n = len(shard_for_host(list(range(n)), self.num_hosts, self.host_id,
                                   self.batch_size))
        if self.drop_last:
            return n // self.batch_size
        # the final partial batch is cyclically padded and yielded
        return -(-n // self.batch_size)

    def _bucket_frames(self, batch_idx) -> Optional[int]:
        """Static frame count for this batch from DataConfig.bucket_boundaries:
        the smallest boundary >= the batch's longest utterance (clamped to the
        global crop). Length-sorted sampling keeps batches homogeneous, so
        shorter batches pad to a smaller bucket instead of the global max;
        XLA compiles one program per distinct bucket (bounded set)."""
        boundaries = self.cfg.data.bucket_boundaries
        if not boundaries:
            return None
        from neural_sound_generation_tpu.data.collate import static_crop_frames

        hop = self.cfg.audio.effective_hop_size
        cap = static_crop_frames(
            self.cfg.train.max_time_steps, hop, self.latent_stride
        )
        max_frames = max(self.dataset.X.lengths[i] // hop for i in batch_idx)
        for b in sorted(boundaries):
            if b % self.latent_stride == 0 and b >= max_frames:
                return min(b, cap)
        return cap

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._indices()
        rng = np.random.default_rng(self.seed + 7919 * self._epoch)
        self._epoch += 1
        prefetch: "queue.Queue" = queue.Queue(maxsize=self.cfg.data.prefetch_depth)
        stop = object()

        def collate_native(batch_idx):
            gs = (
                [self.dataset.X.speaker_ids[i] for i in batch_idx]
                if self.dataset.multi_speaker
                else None
            )
            return self._native.collate(
                batch_idx,
                self.cfg.audio,
                self.cfg.train.max_time_steps,
                rng,
                latent_stride=self.latent_stride,
                frames_out=self._bucket_frames(batch_idx),
                speaker_ids=gs,
                # mel-mode training consumes only c (+ g): skip x/y fills
                need_audio=self.batch_mode != "mel",
            )

        abandoned = threading.Event()

        def safe_put(item) -> bool:
            """Bounded put that gives up when the consumer is gone — an
            abandoned iterator (e.g. a one-batch probe) must not leave
            this thread blocked on a full queue forever."""
            while not abandoned.is_set():
                try:
                    prefetch.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if self._native is not None:
                            out = collate_native(batch_idx)
                        else:
                            items = list(
                                pool.map(self.dataset.__getitem__, batch_idx)
                            )
                            out = collate_mel_batch(
                                items,
                                self.cfg.audio,
                                self.cfg.train.max_time_steps,
                                rng,
                                latent_stride=self.latent_stride,
                                frames_out=self._bucket_frames(batch_idx),
                                one_hot=False,  # models embed ints; see collate
                            )
                        if self.batch_mode == "mel":
                            out = as_model_batch(out)
                        elif self.batch_mode == "wave":
                            out = as_wave_batch(out, self.cfg.audio)
                        if not safe_put(out):
                            return
            except BaseException as e:  # noqa: BLE001 — surface, don't truncate
                # a data error must FAIL the epoch in the consumer, not
                # end it silently (a corrupt shard at batch 3 of 5000
                # would otherwise 'train' on 3 batches per epoch forever)
                safe_put(e)
                return
            safe_put(stop)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = prefetch.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
            thread.join()
        finally:
            # wake a producer blocked on a full queue if the consumer
            # stopped early (GeneratorExit / exception)
            abandoned.set()


def get_audio_data_loaders(
    data_root: str,
    speaker_id: Optional[int],
    batch_size: int,
    cfg: Optional[Config] = None,
    test_shuffle: bool = True,
    num_hosts: int = 1,
    host_id: int = 0,
    batch_mode: str = "mel",
    latent_stride: int = 4,
) -> Dict[str, MelFrameLoader]:
    """Train/test loader pair over a preprocessed corpus directory
    (get_audio_data_loaders surface, dataloader.py:441-493)."""
    cfg = cfg or Config()
    loaders: Dict[str, MelFrameLoader] = {}
    for phase in ("train", "test"):
        train = phase == "train"
        x_src = NpyDataSource(
            data_root,
            0,
            speaker_id=speaker_id,
            train=train,
            test_size=cfg.data.test_size,
            test_num_samples=cfg.data.test_num_samples,
            random_state=cfg.data.random_state,
        )
        mel_src = (
            NpyDataSource(
                data_root,
                1,
                speaker_id=speaker_id,
                train=train,
                test_size=cfg.data.test_size,
                test_num_samples=cfg.data.test_num_samples,
                random_state=cfg.data.random_state,
            )
            if cfg.arch.cin_channels > 0
            else None
        )
        dataset = AudioDataset(x_src, mel_src)
        loaders[phase] = MelFrameLoader(
            dataset,
            cfg,
            batch_size,
            num_hosts=num_hosts,
            host_id=host_id,
            num_workers=cfg.data.num_workers,
            seed=cfg.data.random_state,
            shuffle=train or test_shuffle,
            batch_mode=batch_mode,
            drop_last=train,
            latent_stride=latent_stride,
        )
        if train and x_src.multi_speaker:
            hist = np.bincount(np.asarray(x_src.speaker_ids))
            print(f"Speaker stats: {dict(enumerate(hist.tolist()))}")
    return loaders


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Keep ``size`` batches resident on device ahead of consumption.

    Device transfers are async in JAX, so enqueuing the next batches'
    ``device_put`` before the consumer needs them overlaps H2D copies with
    the current step's compute (the double-buffering half of the
    reference's pin_memory intent, hparams.py:87). ``sharding`` places
    batches straight onto a mesh (e.g. ``batch_sharding(mesh)``).
    """
    import collections

    import jax
    import jax.numpy as jnp

    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        else:
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
        buf.append(batch)

    it = iter(iterator)
    try:
        for _ in range(max(1, size)):
            put(next(it))
    except StopIteration:
        pass
    while buf:
        yield buf.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
