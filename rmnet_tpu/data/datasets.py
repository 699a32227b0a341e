"""Datasets (DAVIS, YouTube-VOS, static-image pretrain sets) and loader.

Capability of reference utils/data_loaders.py: the same indexing-file
formats, frame-window sampling with curriculum frame_step, dataset
concatenation with ``'DAVISx5'`` repeat syntax, and per-subset transform
pipelines — built on the numpy transforms in rmnet_tpu/data/transforms.py
and a thread-prefetching loader instead of torch DataLoader.
"""

from __future__ import annotations

import json
import queue
import random
import threading
from enum import Enum, unique
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from rmnet_tpu.data.io import IO
from rmnet_tpu.data.rng import clear_stream, pyrand, seed_stream
from rmnet_tpu.data import transforms as T


@unique
class DatasetSubset(Enum):
    TRAIN = 0
    TEST = 1
    VAL = 2


class VideoDataset:
    """Generic video dataset over a file list (reference Dataset,
    utils/data_loaders.py:28-92)."""

    def __init__(self, file_list, transforms=None, options=None):
        self.ignore_idx = options["ignore_idx"]
        self.n_max_frames = options["n_max_frames"]
        self.n_max_objects = options["n_max_objects"]
        self.file_list = file_list
        self.transforms = transforms
        self.frame_step = 1

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, idx):
        video = self.file_list[idx]
        frames, masks, opt_flows, n_objects = [], [], [], []

        frame_indexes = self._get_frame_indexes(video["n_frames"], self.n_max_frames)
        for fi in frame_indexes:
            frame = np.array(IO.get(video["frames"][fi]).convert("RGB"))
            frames.append(frame)
            mask = IO.get(video["masks"][fi]) if fi < len(video["masks"]) else None
            mask = (
                np.array(mask.convert("P"))
                if mask is not None
                else np.zeros(frame.shape[:-1], np.uint8)
            )
            masks.append(mask)
            flow = (
                IO.get(video["optical_flow"][fi]) if "optical_flow" in video else None
            )
            flow = flow if flow is not None else np.zeros(frame.shape[:-1] + (2,), np.float32)
            opt_flows.append(np.asarray(flow, np.float32))

        # cumulative distinct-object count per frame (utils/data_loaders.py:58-65)
        mask_indexes: set = set()
        for m in masks:
            mi = np.unique(m)
            mask_indexes.update(mi[mi != self.ignore_idx].tolist())
            n_objects.append(min(len(mask_indexes) - 1, self.n_max_objects))

        if self.transforms is not None:
            frames, masks, opt_flows = self.transforms(frames, masks, opt_flows)

        return video["name"], np.array(n_objects), frames, masks, opt_flows

    def _get_frame_indexes(self, n_frames, n_max_frames):
        if n_max_frames == 0:
            return list(range(n_frames))
        if n_frames <= n_max_frames:
            # short videos: sample with replacement (YouTube-VOS d177e9878a
            # has 2 frames — reference utils/data_loaders.py:77-79)
            return pyrand().choices(list(range(n_frames)), k=n_max_frames)

        begin_ub = n_frames - (n_max_frames - 1) * self.frame_step - 1
        begin = pyrand().randint(0, begin_ub) if begin_ub > 0 else 0
        end = begin + (n_max_frames - 1) * self.frame_step
        if end >= n_frames:
            return sorted(pyrand().sample(list(range(n_frames)), n_max_frames))
        return list(range(begin, end + 1, self.frame_step))

    def set_frame_step(self, frame_step):
        self.frame_step = frame_step


class MultipleDatasets:
    """Concatenation with per-dataset repeat factor; repeat < 1 samples
    randomly (reference utils/data_loaders.py:95-124)."""

    def __init__(self, datasets: Sequence[Tuple[Any, float]]):
        self.datasets = list(datasets)
        self.indexes = [0]
        for dataset, repeat in self.datasets:
            self.indexes.append(self.indexes[-1] + int(len(dataset) * repeat))

    def __len__(self):
        return self.indexes[-1]

    def __getitem__(self, idx):
        d_idx = 0
        for i, end in enumerate(self.indexes):
            if idx < end:
                d_idx = i - 1
                break
        dataset, repeat = self.datasets[d_idx]
        if repeat >= 1:
            return dataset[(idx - self.indexes[d_idx]) % len(dataset)]
        return dataset[pyrand().randint(0, len(dataset) - 1)]

    def set_frame_step(self, frame_step):
        for d, _ in self.datasets:
            d.set_frame_step(frame_step)


# ----------------------------------------------------------- transform sets
def _train_video_pipeline(cfg, video_affine=True):
    aug = cfg.TRAIN.AUGMENTATION
    deg = aug.AFFINE_VIDEO_DEGREES if video_affine else aug.AFFINE_IMAGE_DEGREES
    trn = aug.AFFINE_VIDEO_TRANSLATE if video_affine else aug.AFFINE_IMAGE_TRANSLATE
    scl = aug.AFFINE_VIDEO_SCALE if video_affine else aug.AFFINE_IMAGE_SCALE
    shr = aug.AFFINE_VIDEO_SHEARS if video_affine else aug.AFFINE_IMAGE_SHEARS
    return T.Compose([
        {"callback": "Resize", "parameters": {
            "size": aug.RESIZE_SIZE, "keep_ratio": aug.RESIZE_KEEP_RATIO}},
        {"callback": "RandomAffine", "parameters": {
            "degrees": deg, "translate": trn, "scale": scl, "shears": shr,
            "frame_fill_color": aug.AFFINE_IMAGE_FILL_COLOR,
            "mask_fill_color": aug.AFFINE_MASK_FILL_COLOR,
            "optical_flow_fill_color": aug.AFFINE_FLOW_FILL_COLOR}},
        {"callback": "RandomCrop", "parameters": {
            "height": aug.CROP_HSIZE, "width": aug.CROP_WSIZE,
            "ignore_idx": cfg.CONST.IGNORE_IDX}},
        {"callback": "ReorganizeObjectID", "parameters": {
            "ignore_idx": cfg.CONST.IGNORE_IDX}},
        {"callback": "ToOneHot", "parameters": {
            "shuffle": True, "n_objects": cfg.TRAIN.N_MAX_OBJECTS}},
        {"callback": "ColorJitter", "parameters": {
            "brightness": aug.COLOR_BRIGHTNESS, "contrast": aug.COLOR_CONTRAST,
            "saturation": aug.COLOR_SATURATION, "hue": aug.COLOR_HUE}},
        {"callback": "Normalize", "parameters": {
            "mean": cfg.CONST.DATASET_MEAN, "std": cfg.CONST.DATASET_STD}},
        {"callback": "RandomPermuteRGB", "parameters": None},
        {"callback": "ToArrays", "parameters": None},
    ])


def _test_video_pipeline(cfg):
    return T.Compose([
        {"callback": "ReorganizeObjectID", "parameters": {
            "ignore_idx": cfg.CONST.IGNORE_IDX}},
        {"callback": "ToOneHot", "parameters": {
            "shuffle": False, "n_objects": cfg.TEST.N_MAX_OBJECTS}},
        {"callback": "Normalize", "parameters": {
            "mean": cfg.CONST.DATASET_MEAN, "std": cfg.CONST.DATASET_STD}},
        {"callback": "ToArrays", "parameters": None},
    ])


# ------------------------------------------------------------------ DAVIS
class DavisDataset:
    def __init__(self, cfg):
        self.cfg = cfg
        with open(cfg.DATASETS.DAVIS.INDEXING_FILE_PATH) as f:
            self.videos = json.load(f)

    def get_dataset(self, subset: DatasetSubset):
        file_list = self._get_file_list(self.cfg, self._get_subset(subset))
        if subset == DatasetSubset.TRAIN:
            transforms = _train_video_pipeline(self.cfg)
            n_max_frames = self.cfg.TRAIN.N_MAX_FRAMES
            n_max_objects = self.cfg.TRAIN.N_MAX_OBJECTS
        else:
            transforms = _test_video_pipeline(self.cfg)
            n_max_frames = 0
            n_max_objects = self.cfg.TEST.N_MAX_OBJECTS
        return VideoDataset(file_list, transforms, {
            "ignore_idx": self.cfg.CONST.IGNORE_IDX,
            "n_max_frames": n_max_frames,
            "n_max_objects": n_max_objects,
        })

    @staticmethod
    def _get_subset(subset):
        return {"TRAIN": "train", "VAL": "val", "TEST": "test"}[subset.name]

    def _get_file_list(self, cfg, subset):
        file_list = []
        for v in self.videos[subset]:
            n = v["n_frames"]
            file_list.append({
                "name": f"DAVIS/{v['name']}",
                "n_frames": n,
                "frames": [cfg.DATASETS.DAVIS.IMG_FILE_PATH % (v["name"], i) for i in range(n)],
                "masks": [
                    cfg.DATASETS.DAVIS.ANNOTATION_FILE_PATH % (v["name"], i) for i in range(n)
                ],
                "optical_flow": [
                    cfg.DATASETS.DAVIS.OPTICAL_FLOW_FILE_PATH % (v["name"], i) for i in range(n)
                ],
            })
        return file_list


# -------------------------------------------------------------- YouTube-VOS
class YoutubeVosDataset:
    def __init__(self, cfg):
        self.cfg = cfg

    def get_dataset(self, subset: DatasetSubset):
        sub = self._get_subset(subset)
        file_list = self._get_file_list(self.cfg, sub)
        if subset == DatasetSubset.TRAIN:
            transforms = _train_video_pipeline(self.cfg)
            n_max_frames = self.cfg.TRAIN.N_MAX_FRAMES
            n_max_objects = self.cfg.TRAIN.N_MAX_OBJECTS
        else:
            transforms = _test_video_pipeline(self.cfg)
            n_max_frames = 0
            n_max_objects = self.cfg.TEST.N_MAX_OBJECTS
        return VideoDataset(file_list, transforms, {
            "ignore_idx": self.cfg.CONST.IGNORE_IDX,
            "n_max_frames": n_max_frames,
            "n_max_objects": n_max_objects,
        })

    @staticmethod
    def _get_subset(subset):
        return {"TRAIN": "train", "VAL": "valid", "TEST": "test"}[subset.name]

    def _get_file_list(self, cfg, subset):
        with open(cfg.DATASETS.YOUTUBE_VOS.INDEXING_FILE_PATH % subset) as f:
            meta = json.load(f)
        videos = meta.get("videos", {})
        file_list = []
        for name, video in videos.items():
            frame_indexes: set = set()
            for _, obj in video["objects"].items():
                frame_indexes.update(obj["frames"])
            frame_indexes = sorted(frame_indexes)
            file_list.append({
                "name": f"YouTubeVOS/{name}",
                "n_frames": len(frame_indexes),
                "frames": [
                    cfg.DATASETS.YOUTUBE_VOS.IMG_FILE_PATH % (subset, name, i)
                    for i in frame_indexes
                ],
                "masks": [
                    cfg.DATASETS.YOUTUBE_VOS.ANNOTATION_FILE_PATH % (subset, name, i)
                    for i in frame_indexes
                ],
                "optical_flow": [
                    cfg.DATASETS.YOUTUBE_VOS.OPTICAL_FLOW_FILE_PATH % (subset, name, i)
                    for i in frame_indexes
                ],
            })
        return file_list


# ------------------------------------------------------------- image sets
class ImageDataset:
    """Static-image pretraining base: one image becomes an n_frames=1 "video";
    sampling-with-replacement + per-frame RandomAffine synthesizes 3-frame
    clips (reference utils/data_loaders.py:412-492)."""

    def get_dataset(self, subset: DatasetSubset):
        if subset != DatasetSubset.TRAIN:
            raise ValueError("ONLY DatasetSubset.TRAIN is available for ImageDataset.")
        file_list = self._get_file_list(self.cfg)
        transforms = _train_video_pipeline(self.cfg, video_affine=False)
        return VideoDataset(file_list, transforms, {
            "ignore_idx": self.cfg.CONST.IGNORE_IDX,
            "n_max_frames": self.cfg.TRAIN.N_MAX_FRAMES,
            "n_max_objects": self.cfg.TRAIN.N_MAX_OBJECTS,
        })

    @staticmethod
    def _simple_list(prefix, ids, img_tpl, ann_tpl):
        return [{
            "name": f"{prefix}/{i}",
            "n_frames": 1,
            "frames": [img_tpl % i],
            "masks": [ann_tpl % i],
        } for i in ids]


class PascalVocDataset(ImageDataset):
    def __init__(self, cfg):
        self.cfg = cfg
        with open(cfg.DATASETS.PASCAL_VOC.INDEXING_FILE_PATH) as f:
            self.images = f.read().split("\n")[:-1]

    def _get_file_list(self, cfg):
        return self._simple_list(
            "VOC", self.images,
            cfg.DATASETS.PASCAL_VOC.IMG_FILE_PATH,
            cfg.DATASETS.PASCAL_VOC.ANNOTATION_FILE_PATH,
        )


class EcssdDataset(ImageDataset):
    def __init__(self, cfg):
        self.cfg = cfg
        self.images = ["%04d" % i for i in range(1, cfg.DATASETS.ECSSD.N_IMAGES + 1)]

    def _get_file_list(self, cfg):
        return self._simple_list(
            "ECSSD", self.images,
            cfg.DATASETS.ECSSD.IMG_FILE_PATH,
            cfg.DATASETS.ECSSD.ANNOTATION_FILE_PATH,
        )


class Msra10kDataset(ImageDataset):
    def __init__(self, cfg):
        self.cfg = cfg
        with open(cfg.DATASETS.MSRA10K.INDEXING_FILE_PATH) as f:
            self.images = f.read().split("\n")

    def _get_file_list(self, cfg):
        return self._simple_list(
            "MSRA10K", self.images,
            cfg.DATASETS.MSRA10K.IMG_FILE_PATH,
            cfg.DATASETS.MSRA10K.ANNOTATION_FILE_PATH,
        )


class MscocoDataset(ImageDataset):
    def __init__(self, cfg):
        self.cfg = cfg
        with open(cfg.DATASETS.MSCOCO.INDEXING_FILE_PATH) as f:
            self.images = f.read().split("\n")

    def _get_file_list(self, cfg):
        return self._simple_list(
            "MSCOCO", self.images,
            cfg.DATASETS.MSCOCO.IMG_FILE_PATH,
            cfg.DATASETS.MSCOCO.ANNOTATION_FILE_PATH,
        )


class Ade20kDataset(ImageDataset):
    def __init__(self, cfg):
        self.cfg = cfg
        with open(cfg.DATASETS.ADE20K.INDEXING_FILE_PATH) as f:
            self.images = f.read().split("\n")

    def _get_file_list(self, cfg):
        return self._simple_list(
            "ADE20K", self.images,
            cfg.DATASETS.ADE20K.IMG_FILE_PATH,
            cfg.DATASETS.ADE20K.ANNOTATION_FILE_PATH,
        )


class DavisFrameDataset(ImageDataset):
    def __init__(self, cfg):
        self.cfg = cfg
        with open(cfg.DATASETS.DAVIS.INDEXING_FILE_PATH) as f:
            self.videos = json.load(f)["train"]

    def _get_file_list(self, cfg):
        file_list = []
        for v in self.videos:
            for i in range(v["n_frames"]):
                file_list.append({
                    "name": f"DAVIS/{v['name']}/{i}",
                    "n_frames": 1,
                    "frames": [cfg.DATASETS.DAVIS.IMG_FILE_PATH % (v["name"], i)],
                    "masks": [cfg.DATASETS.DAVIS.ANNOTATION_FILE_PATH % (v["name"], i)],
                })
        return file_list


class DatasetCollector:
    """Registry + 'NAMExN' repeat syntax (reference utils/data_loaders.py:657-688)."""

    DATASET_LOADER_MAPPING = {
        "DAVIS": DavisDataset,
        "DAVIS_FRAMES": DavisFrameDataset,
        "YOUTUBE_VOS": YoutubeVosDataset,
        "PASCAL_VOC": PascalVocDataset,
        "ECSSD": EcssdDataset,
        "MSRA10K": Msra10kDataset,
        "MSCOCO": MscocoDataset,
        "ADE20K": Ade20kDataset,
    }

    @classmethod
    def get_dataset(cls, cfg, dataset, subset: DatasetSubset):
        if isinstance(dataset, str):
            return cls.DATASET_LOADER_MAPPING[dataset](cfg).get_dataset(subset)
        datasets = []
        for dn in dataset:
            x_index = dn.rfind("x")
            repeat = float(dn[x_index + 1:]) if x_index != -1 else 1
            name = dn[:x_index] if x_index != -1 else dn
            loader = cls.DATASET_LOADER_MAPPING[name](cfg).get_dataset(subset)
            datasets.append((loader, int(repeat) if repeat >= 1 else repeat))
        return MultipleDatasets(datasets)


class DataLoader:
    """Batching loader: shuffle / drop_last / multi-worker decode + prefetch.

    ``n_workers`` is the TPU-host twin of the reference's
    ``DataLoader(num_workers=cfg.CONST.N_WORKERS)``
    (/root/reference/core/train.py:37-44): N threads decode batches
    concurrently (PIL/numpy release the GIL during image decode and array
    math), a bounded in-flight window caps memory, and batches are emitted
    strictly in order regardless of which worker finishes first."""

    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False,
                 n_prefetch_threads=2, seed=None, n_workers=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # back-compat only: n_prefetch_threads<=0 historically meant
        # "synchronous"; beyond deriving that default it is LEGACY and
        # unread — the worker pool and in-flight window are driven solely
        # by n_workers
        if n_workers is None:
            n_workers = 1 if n_prefetch_threads > 0 else 0
        self.n_workers = n_workers
        self.n_prefetch_threads = n_prefetch_threads
        self.rng = random.Random(seed)
        # decode-stream bases come from a SEPARATE rng so the shuffle
        # stream (self.rng) is identical across framework versions
        self._decode_rng = random.Random(
            None if seed is None else (int(seed) ^ 0x5EED5EED)
        )

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    @staticmethod
    def collate(samples):
        names = [s[0] for s in samples]
        n_objects = np.stack([s[1] for s in samples])
        frames = np.stack([s[2] for s in samples])
        masks = np.stack([s[3] for s in samples])
        flows = np.stack([s[4] for s in samples])
        return names, n_objects, frames, masks, flows

    def __iter__(self):
        order = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i:i + self.batch_size] for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        # per-epoch base for the per-batch decode RNG streams (a dedicated
        # rng, so the shuffle stream is untouched). Decoded data then
        # depends only on (loader seed, epoch, batch index) — identical
        # for any worker count or thread scheduling.
        epoch_seed = self._decode_rng.getrandbits(31)

        def decode(bi, b):
            seed_stream(epoch_seed * 1000003 + bi)
            try:
                return self.collate([self.dataset[i] for i in b])
            finally:
                # never leak the seeded stream to the caller's thread (the
                # synchronous path decodes on the consumer thread)
                clear_stream()

        n_workers = int(self.n_workers)
        if n_workers <= 0:
            for bi, b in enumerate(batches):
                yield decode(bi, b)
            return

        # N decode workers, ordered collation: workers pull (batch_idx,
        # indexes) tasks and deposit results keyed by batch_idx; the
        # consumer emits batch i only after i-1 (order identical to the
        # synchronous path). A semaphore bounds decoded-but-unconsumed
        # batches to 2*N so long videos cannot pile up in RAM.
        max_inflight = max(2, 2 * n_workers)
        work_q: "queue.Queue" = queue.Queue()
        done: dict = {}
        done_cv = threading.Condition()
        sem = threading.Semaphore(max_inflight)
        abandoned = [False]

        def feeder():
            for task in enumerate(batches):
                sem.acquire()
                if abandoned[0]:
                    break
                work_q.put(task)
            for _ in range(n_workers):
                work_q.put(None)

        def worker():
            while True:
                task = work_q.get()
                if task is None:
                    return
                bi, b = task
                try:
                    res = decode(bi, b)
                except Exception as ex:  # surface errors to the consumer
                    res = ex
                with done_cv:
                    done[bi] = res
                    done_cv.notify_all()

        threads = [threading.Thread(target=feeder, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True)
                    for _ in range(n_workers)]
        for t in threads:
            t.start()
        try:
            for bi in range(len(batches)):
                with done_cv:
                    while bi not in done:
                        done_cv.wait()
                    item = done.pop(bi)
                sem.release()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # unblock the feeder if the consumer abandoned the iterator
            abandoned[0] = True
            for _ in range(max_inflight):
                sem.release()
